"""Pallas probes: VMEM-table gather rate, and a fused stencil-tile pattern.

Decides whether per-particle depth lookups should be a Pallas kernel
(depth [H,W] f32 = 1.8 MB fits VMEM) instead of XLA's ~15 ns/elem gather.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 384, 1248   # tile-friendly VKITTI2-ish
N = 1 << 22        # 4.2M lookups (the [A, BV*K] working set)
BLK = 1 << 15      # per-grid-step chunk
REPS = 10

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
depth = jax.random.uniform(k1, (H, W), jnp.float32, 1.0, 30.0)
rows = jax.random.randint(k2, (N,), 0, H, jnp.int32)
cols = jax.random.randint(k1, (N,), 0, W, jnp.int32)
_ = float(depth[0, 0] + rows[0] + cols[0])


def gather_kernel(depth_ref, rc_ref, out_ref):
    flat = rc_ref[:]                      # i32[BLK] row*W+col
    d = depth_ref[:].reshape(-1)          # f32[H*W] in VMEM
    out_ref[:] = d[flat]


@jax.jit
def pallas_gather(depth, rows, cols):
    rc = rows * W + cols
    return pl.pallas_call(
        gather_kernel,
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
    )(depth, rc)


def run(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    total = (time.perf_counter() - t0) * 1e3
    print(f"{name:<46} {total:9.2f} ms/call {total / REPS:8.3f} ms/op", flush=True)


run("baseline", lambda x: lax.fori_loop(0, REPS, lambda i, xx: xx + 1, x),
    jnp.zeros((8, 128), jnp.float32))

run("pallas VMEM gather 4.2M from [H,W]",
    lambda r, c, d: lax.fori_loop(
        0, REPS, lambda i, rr: (pallas_gather(d, rr, c).astype(jnp.int32) & 1) + rr, r
    ),
    rows, cols, depth)

run("XLA gather 4.2M from [H,W]",
    lambda r, c, d: lax.fori_loop(
        0, REPS,
        lambda i, rr: (d.reshape(-1)[rr * W + c].astype(jnp.int32) & 1) + rr, r
    ),
    rows, cols, depth)
