"""Remaining primitive measurements (see _prim_bench4/5 for method notes)."""
import time

import jax
import jax.numpy as jnp
from jax import lax

REPS = 10
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)

tbl_blocks = jax.random.normal(k1, (131072, 448), jnp.float32)
rows_8k = jax.random.randint(k2, (8192,), 0, 131072, jnp.int32)
vals_1m = jax.random.normal(k1, (1 << 20,), jnp.float32)
idx_1m_small = jax.random.randint(k2, (1 << 20,), 0, 5_587_200, jnp.int32)
idx_1m_sorted = jnp.sort(idx_1m_small)
rows_vals = jax.random.normal(k1, (8192, 448), jnp.float32)
ops7 = tuple(jax.random.normal(k1, (1 << 22,), jnp.float32) for _ in range(7))
key22 = jax.random.randint(k2, (1 << 22,), 0, 1 << 30, jnp.int32)
sorted_1m = jnp.sort(key22[:1 << 20])
queries_16k = jax.random.randint(k3, (16384,), 0, 1 << 30, jnp.int32)
mask_8m = (jax.random.uniform(k1, (1 << 23,)) < 0.05).astype(jnp.int32)
mask_131k = (jax.random.uniform(k1, (131072,)) < 0.1).astype(jnp.float32)

_ = float(jnp.sum(tbl_blocks[0, :3]) + key22[0] + sorted_1m[0])


def run(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0].astype(jnp.float32))
    total = (time.perf_counter() - t0) * 1e3
    print(f"{name:<50} {total:9.2f} ms/call  {total / REPS:8.3f} ms/op(incl ~0.3 ovh)", flush=True)


def loop(body):
    return lambda x, *c: lax.fori_loop(0, REPS, lambda i, xx: body(i, xx, *c), x)


run("baseline", loop(lambda i, x: x + 1), jnp.zeros((8, 128), jnp.float32))
run("scatter 1M SORTED-dest into 5.6M",
    loop(lambda i, v, ix: jnp.zeros(5_587_200, jnp.float32).at[ix].set(v + i, mode="drop")[:1 << 20] + v * 0),
    vals_1m, idx_1m_sorted)
run("gather 1M SORTED idx from 5.6M",
    loop(lambda i, ix, t: ix + (t.reshape(-1)[:5_587_200][ix].astype(jnp.int32) & 1)),
    idx_1m_sorted, tbl_blocks)
run("row-scatter [8k,448] into [131k,448]",
    loop(lambda i, t, r, v: t.at[r].set(v + i, mode="drop", unique_indices=True)),
    tbl_blocks, rows_8k, rows_vals)
run("multi-op sort 4.2M (key + 7 f32 payloads)",
    loop(lambda i, c, *ops: lax.sort((c ^ (i & 1),) + ops, num_keys=1)[0]),
    key22, *ops7)
run("sort pair 4.2M",
    loop(lambda i, c, p: lax.sort((c ^ (i & 1), p), num_keys=1)[0]), key22, ops7[0])
run("searchsorted 16k in 1M",
    loop(lambda i, q, s: ((jnp.searchsorted(s, q ^ (i & 1))) & 0x7FFFFFFF).astype(jnp.int32)),
    queries_16k, sorted_1m)
run("cumsum minor [131k x 64]",
    loop(lambda i, m: jnp.cumsum(m.reshape(131072, 64), axis=1).reshape(-1) + (i & 1)),
    mask_8m)
run("argsort 131k f32-key", loop(lambda i, m: jnp.argsort(m + i * 0.0).astype(jnp.float32)), mask_131k)
run("element gather [16k] from [131k]",
    loop(lambda i, r, t: (r + (t[r, 0].astype(jnp.int32) & 1)) % 131072),
    jnp.concatenate([rows_8k, rows_8k]), tbl_blocks)
