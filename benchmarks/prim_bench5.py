"""Primitive cost model part 2: row gathers, sort scaling, scatter scaling,
top_k, minor-axis cumsum.  Same platform workarounds as _prim_bench4."""
import time

import jax
import jax.numpy as jnp
from jax import lax

REPS = 10
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)

tbl_blocks = jax.random.normal(k1, (131072, 448), jnp.float32)   # [NB, 64*K]
rows_8k = jax.random.randint(k2, (8192,), 0, 131072, jnp.int32)
rows_32k = jax.random.randint(k2, (32768,), 0, 131072, jnp.int32)
keys_8m = jax.random.randint(k3, (1 << 23,), 0, 1 << 30, jnp.int32)
keys_58m = jax.random.randint(k3, (58_720_256,), 0, 1 << 30, jnp.int32)
vals_1m = jax.random.normal(k1, (1 << 20,), jnp.float32)
idx_1m_small = jax.random.randint(k2, (1 << 20,), 0, 5_587_200, jnp.int32)
idx_256k = jax.random.randint(k2, (1 << 18,), 0, 5_587_200, jnp.int32)
mask_131k = (jax.random.uniform(k1, (131072,)) < 0.1)
mask_8m = (jax.random.uniform(k1, (1 << 23,)) < 0.05).astype(jnp.int8)

_ = float(jnp.sum(tbl_blocks[0, :3]) + keys_8m[0] + keys_58m[0] + mask_131k[0])


def run(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0].astype(jnp.float32))
    total = (time.perf_counter() - t0) * 1e3
    print(f"{name:<50} {total:9.2f} ms/call  {(total - BASE) / REPS:8.3f} ms/op", flush=True)


def loop(body):
    return lambda x, *c: lax.fori_loop(0, REPS, lambda i, xx: body(i, xx, *c), x)


BASE = 0.0
run("baseline", loop(lambda i, x: x + 1), jnp.zeros((8, 128), jnp.float32))
BASE = 0.0  # keep raw; overhead shown by baseline row

run("row gather [8k,448] from [131k,448]",
    loop(lambda i, r, t: (r + (t[r][:, 0].astype(jnp.int32) & 1)) % 131072),
    rows_8k, tbl_blocks)
run("row gather [32k,448] from [131k,448]",
    loop(lambda i, r, t: (r + (t[r][:, 0].astype(jnp.int32) & 1)) % 131072),
    rows_32k, tbl_blocks)
run("sort 8.4M i32", loop(lambda i, c: jnp.sort(c) ^ (i & 1)), keys_8m)
run("argsort 8.4M i32", loop(lambda i, c: jnp.argsort(c ^ i)), keys_8m)
run("sort pair 8.4M (i32 key + i32 payload)",
    loop(lambda i, c: lax.sort((c ^ i, c), num_keys=1)[0]), keys_8m)
run("sort 58.7M i32", loop(lambda i, c: jnp.sort(c) ^ (i & 1)), keys_58m)
run("scatter 1M into 5.6M",
    loop(lambda i, v, ix: jnp.zeros(5_587_200, jnp.float32).at[ix].set(v + i, mode="drop")[:1 << 20]),
    vals_1m, idx_1m_small)
run("scatter 256k into 5.6M",
    loop(lambda i, v, ix: jnp.zeros(5_587_200, jnp.float32).at[ix].set(v + i, mode="drop")[:1 << 18] + v * 0),
    vals_1m[:1 << 18], idx_256k)
idx_1m_sorted = jnp.sort(idx_1m_small)
run("scatter 1M SORTED-dest into 5.6M",
    loop(lambda i, v, ix: jnp.zeros(5_587_200, jnp.float32).at[ix].set(v + i, mode="drop")[:1 << 20] + v * 0),
    vals_1m, idx_1m_sorted)
run("gather 1M SORTED idx from 5.6M",
    loop(lambda i, ix, t: ix + (jnp.tile(t.reshape(-1)[:5_587_200][ix], 1).astype(jnp.int32) & 1)),
    idx_1m_sorted, tbl_blocks)
rows_vals = jax.random.normal(k1, (8192, 448), jnp.float32)
run("row-scatter [8k,448] into [131k,448]",
    loop(lambda i, t, r, v: t.at[r].set(v + i, mode="drop", unique_indices=True)),
    tbl_blocks, rows_8k, rows_vals)
ops8 = tuple(jax.random.normal(k1, (1 << 22,), jnp.float32) for _ in range(7))
key22 = jax.random.randint(k2, (1 << 22,), 0, 1 << 30, jnp.int32)
run("multi-op sort 4.2M (key + 7 payloads)",
    loop(lambda i, c, *ops: lax.sort((c ^ (i & 1),) + ops, num_keys=1)[0]),
    key22, *ops8)
run("searchsorted 16k in 1M",
    loop(lambda i, q, s: (jnp.searchsorted(s, q ^ (i & 1)) & 0x7FFFFFFF).astype(jnp.int32)),
    jax.random.randint(k3, (16384,), 0, 1 << 30, jnp.int32), jnp.sort(key22[:1 << 20]))
run("top_k 8k of 131k", loop(lambda i, m: lax.top_k(m + i * 0.0, 8192)[1].astype(jnp.float32)), mask_131k.astype(jnp.float32))
run("cumsum minor [131k x 64]",
    loop(lambda i, m: (jnp.cumsum(m.reshape(131072, 64), axis=1).reshape(-1) + (i & 1)).astype(jnp.int32)),
    mask_8m.astype(jnp.int32))
run("argsort 131k bool-key", loop(lambda i, m: jnp.argsort(m ^ (i & 1)) ^ 1), mask_131k.astype(jnp.int32))
