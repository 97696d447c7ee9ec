"""Sub-stage probes inside birth_and_resample / observe_and_update at a real
config's shapes (default zed2).  Isolates each primitive group so the top
cost inside the two hot stages (profile_frame.py) is attributable.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from semantic_dsp_map_tpu.config import FilterParams, zed2_config  # noqa: E402
from semantic_dsp_map_tpu.ops.birth import resample_slots  # noqa: E402
from semantic_dsp_map_tpu.ops.blocks import block_layout, group_rank  # noqa: E402

cfg = zed2_config()
params = FilterParams(nb_ptc_num_per_point=1, if_consider_depth_noise=True)

H, W, K = cfg.height, cfg.width, cfg.slots_per_voxel
V = cfg.num_voxels
bv, nb, spb = block_layout(cfg)
A = min(cfg.max_birth_blocks, nb)
N = H * W
S = cfg.phd_pixel_table_slots
print(f"zed2: V={V} K={K} bv={bv} nb={nb} spb={spb} A={A} N={N} S={S}")

rng = np.random.RandomState(0)
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:<30} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)
    return out


# ---- birth pieces ----
vox = jnp.asarray(rng.randint(0, V, N).astype(np.int32))
pri = jnp.asarray(rng.permutation(N).astype(np.int32))
f1, f2, f3, f4 = (jnp.asarray(rng.rand(N).astype(np.float32)) for _ in range(4))
i1, i2 = (jnp.asarray(rng.randint(0, 1000, N).astype(np.int32)) for _ in range(2))
iota = jnp.arange(N, dtype=jnp.int32)

sort9 = jax.jit(lambda *a: jax.lax.sort(a, num_keys=2))
out = timeit("sort 9op (N)", sort9, vox, pri, f1, f2, f3, f4, i1, i2, iota)
sv = out[0]

timeit("group_rank", jax.jit(group_rank), sv)

dest = jnp.asarray(rng.permutation(A * spb)[:N].astype(np.int32))


def scat1(d, v):
    return jnp.zeros(A * spb, jnp.float32).at[d].set(v, mode="drop", unique_indices=True)


timeit("stage scatter x1 (N->A*spb)", jax.jit(scat1), dest, f1)


def scat7(d, a, b, c, e, f, g, h):
    z = jnp.zeros(A * spb, jnp.float32)
    zi = jnp.zeros(A * spb, jnp.int32)
    return (
        z.at[d].set(a, mode="drop", unique_indices=True),
        z.at[d].set(b, mode="drop", unique_indices=True),
        z.at[d].set(c, mode="drop", unique_indices=True),
        z.at[d].set(e, mode="drop", unique_indices=True),
        zi.at[d].set(i1, mode="drop", unique_indices=True),
        zi.at[d].set(i2, mode="drop", unique_indices=True),
        zi.at[d].set(iota, mode="drop", unique_indices=True),
    )


timeit("stage scatter x7", jax.jit(scat7), dest, f1, f2, f3, f4, f1, f2, f3)

field = jnp.asarray(rng.rand(V, K).astype(np.float32))
ids = jnp.arange(A, dtype=jnp.int32)


def g9(f):
    rows = f.reshape(nb, -1)
    return tuple(rows[ids] for _ in range(9))


timeit("gather_rows x9 (A rows)", jax.jit(g9), field)


def s9(f, vals):
    rows = f.reshape(nb, -1)
    return tuple(
        rows.at[ids].set(vals, mode="drop", unique_indices=True) for _ in range(9)
    )


vals = jnp.asarray(rng.rand(A, spb).astype(np.float32))
timeit("scatter_rows x9", jax.jit(s9), field, vals)

st3 = jnp.asarray(rng.randint(0, 3, (A, bv, K)).astype(np.int32))
w3 = jnp.asarray(rng.rand(A, bv, K).astype(np.float32))
tg = jnp.asarray(rng.rand(A, bv) < 0.5)
timeit("resample_slots", jax.jit(lambda s, w, t: resample_slots(cfg, s, w, t)), st3, w3, tg)


# merge loop K x K
def merge(vac3, i_meta, o_w):
    vrank3 = jnp.cumsum(vac3.astype(jnp.int32), axis=2) - 1
    outs = []
    for s in range(K):
        vr_s = vrank3[..., s]
        take = jnp.zeros(vac3.shape[:2], bool)
        c_w = jnp.zeros(vac3.shape[:2], jnp.float32)
        for c in range(K):
            hit = vac3[..., s] & (vr_s == c) & (i_meta[..., c] >= 0)
            take |= hit
            c_w = jnp.where(hit, o_w[..., c], c_w)
        outs.append(jnp.where(take, c_w, o_w[..., s]))
    return jnp.stack(outs, axis=-1)


vac3 = jnp.asarray(rng.rand(A, bv, K) < 0.4)
imeta = jnp.asarray(rng.randint(-1, 5, (A, bv, K)).astype(np.int32))
timeit("merge KxK (1 field)", jax.jit(merge), vac3, imeta, w3)

# ---- observe pieces ----
C = min(cfg.max_table_entries, A * spb)
print(f"C={C}")
pix = jnp.asarray(np.sort(rng.randint(0, H * W + 1, C)).astype(np.int32))
depth = jnp.asarray(rng.rand(H, W).astype(np.float32) * 10)
timeit("depth gather (C from HW)", jax.jit(lambda p, d: d.reshape(-1)[jnp.minimum(p, H * W - 1)]), pix, depth)

destT = jnp.asarray(rng.permutation(S * H * W)[:C].astype(np.int32))
fC = jnp.asarray(rng.rand(C).astype(np.float32))


def scat_table(d, v):
    return tuple(
        jnp.zeros(S * H * W, jnp.float32).at[d].set(v, mode="drop", unique_indices=True)
        for _ in range(5)
    )


timeit("table scatters x5 (C->SHW)", jax.jit(scat_table), destT, fC)

timeit("table gather-back x2", jax.jit(
    lambda d, t: (t.reshape(-1)[d], t.reshape(-1)[d])), destT,
    jnp.asarray(rng.rand(S, H, W).astype(np.float32)))

destB = jnp.asarray(rng.permutation(A * spb)[:C].astype(np.int32))
timeit("back scatters x2 (C->A*spb)", jax.jit(
    lambda d, v: (jnp.zeros(A * spb, jnp.float32).at[d].set(v, mode="drop", unique_indices=True),
                  jnp.zeros(A * spb, jnp.int32).at[d].set(i1[:C], mode="drop", unique_indices=True))),
    destB, fC)

# stencils
from semantic_dsp_map_tpu.ops.phd import PixelTable, stencil_pass_a, stencil_pass_b  # noqa: E402
from semantic_dsp_map_tpu.ops.projection import LabeledCloud  # noqa: E402
from benchmarks.check_pallas import make_inputs  # noqa: E402

t, cloud = make_inputs(cfg)
ck = timeit("stencil_pass_a (xla)", jax.jit(lambda t, c: stencil_pass_a(cfg, params, t, c)), t, cloud)
timeit("stencil_pass_b (xla)", jax.jit(lambda t, c, k: stencil_pass_b(cfg, params, t, c, k)), t, cloud, ck)
