"""Standalone compiled-FLOP breakdown of the sharded routing / halo pieces
at the weak-scaling medium workload shapes (round-5: locate the remaining
flops_ratio overhead at D=2/D=8 piece by piece, without rebuilding the whole
step per patch).

Run:  PROBE_D=2 JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=2 \
      python benchmarks/probe_route_flops.py
"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from jax.sharding import PartitionSpec as P  # noqa: E402

import semantic_dsp_map_tpu.parallel.shard_step as ss  # noqa: E402
from semantic_dsp_map_tpu.parallel.sharding import make_mesh  # noqa: E402

D = int(os.environ.get("PROBE_D", "2"))
mesh = make_mesh(D)


def flops(fn, *args):
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    sm = shard_map(
        fn, mesh=mesh,
        in_specs=tuple(P() for _ in args), out_specs=P(),
        check_vma=False,
    )
    c = jax.jit(sm).lower(*args).compile()
    return c.cost_analysis().get("flops", 0.0) / 1e9


# Representative per-device shapes (medium preset, D=2 grown workload):
# observe working set ~72k entries, birth ~49k, move ~9k.
for name, N, cap, nf in [
    ("observe_route", 71936, 39564 // D * 2 // 2, 7),
    ("birth_route", 49152, 27033 // D * 2 // 2, 6),
    ("move_route", 8960, 4928 // D * 2 // 2, 8),
]:
    fields = {f"f{i}": jnp.arange(N, dtype=jnp.float32) for i in range(nf)}
    valid = jnp.ones(N, bool)
    dest = jnp.arange(N, dtype=jnp.int32) % D

    def run(valid, dest, fields=fields, cap=cap):
        r = ss._route(fields, valid, dest, D, cap)
        return r.fields["f0"], r.recv_valid, r.send_slot, r.overflow

    g = flops(run, valid, dest)
    print(f"{name:14s} N={N:7d} cap={cap:7d}: {g:.4f} GF", flush=True)

    # sort-only cost of the same N (2-operand, the rank path)
    def sort_only(valid, dest, N=N):
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
        s_dest, s_idx = jax.lax.sort((dest, iota), num_keys=1)
        return s_dest, s_idx

    g = flops(sort_only, valid, dest)
    print(f"  sort-only: {g:.4f} GF", flush=True)

# halo exchange at table shape [S, rpd, W]
from semantic_dsp_map_tpu.ops.phd import PixelTable  # noqa: E402

S, rpd, W, ext0 = 8, 192 // D * 2 // 2, 256, 2
t = PixelTable(
    px=jnp.zeros((S, rpd, W), jnp.float32),
    py=jnp.zeros((S, rpd, W), jnp.float32),
    pz=jnp.zeros((S, rpd, W), jnp.float32),
    weight=jnp.zeros((S, rpd, W), jnp.float32),
    meta=jnp.full((S, rpd, W), -1, jnp.int32),
    dropped=jnp.int32(0),
)
from semantic_dsp_map_tpu.config import tiny_test_config  # noqa: E402

cfg = tiny_test_config()


def halo(px, py, pz, w, m):
    tt = PixelTable(px=px, py=py, pz=pz, weight=w, meta=m, dropped=jnp.int32(0))
    e = ss._exchange_table_halo(cfg, tt, D, rpd, ext0)
    return e.px, e.meta


g = flops(halo, t.px, t.py, t.pz, t.weight, t.meta)
print(f"table_halo S={S} rpd={rpd} W={W} ext0={ext0}: {g:.4f} GF", flush=True)
