"""Round-5 microbenchmarks: cost scaling of the primitives that dominate the
observe-entry and birth pipelines (multi-operand sort size/payload count,
element scatters/gathers at production sizes).  Decides the r5 cap sizing
and the staging strategy (PROFILE_r04.md levers)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(leaves[0].ravel()[0]))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:48s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)
    return out


rng = np.random.RandomState(0)

# ---- multi-operand sort scaling ----
for n in (1 << 21, 1 << 20, 1 << 19):
    keys = jnp.asarray(rng.randint(0, 466000, n).astype(np.int32))
    camz = jnp.asarray(rng.rand(n).astype(np.float32))
    pay = [jnp.asarray(rng.rand(n).astype(np.float32)) for _ in range(5)]
    src = jnp.arange(n, dtype=jnp.int32)

    f8 = jax.jit(lambda k, c, p0, p1, p2, p3, p4, s: jax.lax.sort(
        (k, c, p0, p1, p2, p3, p4, s), num_keys=2))
    f3 = jax.jit(lambda k, c, s: jax.lax.sort((k, c, s), num_keys=2))
    f2 = jax.jit(lambda k, s: jax.lax.sort((k, s), num_keys=1))
    timeit(f"sort n={n:>8} 8-operand 2-key", f8, keys, camz, *pay, src)
    timeit(f"sort n={n:>8} 3-operand 2-key", f3, keys, camz, src)
    timeit(f"sort n={n:>8} 2-operand 1-key", f2, keys, src)

# ---- element scatter (table build shape): C entries -> S*H*W planes ----
SHW = 12 * 376 * 1242
for c in (1 << 19, 1 << 18):
    dest = jnp.asarray(
        np.sort(rng.choice(SHW, c, replace=False)).astype(np.int32))
    vals = jnp.asarray(rng.rand(c).astype(np.float32))

    def scat1(dest, vals):
        return jnp.zeros(SHW, jnp.float32).at[dest].set(
            vals, mode="drop", unique_indices=True)

    scat = jax.jit(scat1)
    timeit(f"scatter c={c:>7} -> {SHW} (sorted dest)", scat, dest, vals)
    dest_u = jnp.asarray(rng.choice(SHW, c, replace=False).astype(np.int32))
    timeit(f"scatter c={c:>7} -> {SHW} (random dest)", scat, dest_u, vals)

    def scat5(dest, vals):
        return [jnp.zeros(SHW, jnp.float32).at[dest].set(
            vals + i, mode="drop", unique_indices=True) for i in range(5)]

    timeit(f"scatter x5 c={c:>7} (sorted dest)", jax.jit(scat5), dest, vals)

# ---- element gather at production sizes ----
for c in (1 << 19, 1 << 18):
    src_i = jnp.asarray(rng.randint(0, SHW, c).astype(np.int32))
    big = jnp.asarray(rng.rand(SHW).astype(np.float32))
    timeit(f"gather c={c:>7} from {SHW}",
           jax.jit(lambda b, i: b[i]), big, src_i)

# ---- segmented cumsum (associative_scan) at stream size ----
for c in (1 << 21, 1 << 19):
    vals = jnp.asarray(rng.randint(0, 2, c).astype(np.int32))
    starts = jnp.asarray((rng.rand(c) < 0.3))

    def segc(v, st):
        def comb(a, b):
            va, sa = a
            vb, sb = b
            return jnp.where(sb, vb, va + vb), sa | sb
        return jax.lax.associative_scan(comb, (v, st))

    timeit(f"seg-cumsum n={c:>8}", jax.jit(segc), vals, starts)

print("PROBE DONE")
