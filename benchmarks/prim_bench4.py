"""Primitive cost model, round 2, attempt 3.

Platform realities this handles:
  - per-call dispatch/readback over the tunnel ~8 ms -> repeat the op inside
    ONE jit call with lax.fori_loop(REPS) and divide;
  - block_until_ready unreliable -> scalar readback;
  - closure constants hang the compiler -> everything is an argument.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

V = 8_388_608
K = 7
VK = V * K
P = 1 << 20
HW = 1242 * 375
REPS = 10

key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
big = jax.random.normal(k1, (V, K), jnp.float32)
maski = (jax.random.uniform(k2, (VK,)) < (1.5e6 / VK)).astype(jnp.int8)
idx_p = jax.random.randint(k3, (P,), 0, VK, jnp.int32)
vals_p = jax.random.normal(k4, (P,), jnp.float32)
cand = jax.random.randint(k2, (1 << 21,), 0, V, jnp.int32)
_ = float(jnp.sum(big[0]) + jnp.sum(idx_p[:3]) + jnp.sum(cand[:3]) + jnp.sum(maski[:3]))


def run(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0].astype(jnp.float32))
    total = (time.perf_counter() - t0) * 1e3
    print(f"{name:<46} {total:9.2f} ms/call  {(total - BASE) / REPS:8.3f} ms/op", flush=True)
    return total


def loop(body):
    return lambda x, *c: lax.fori_loop(0, REPS, lambda i, xx: body(i, xx, *c), x)


BASE = 0.0
BASE = run("baseline (x+1 loop)", loop(lambda i, x: x + 1), jnp.zeros((8, 128), jnp.float32))

run("full pass 58.7M f32", loop(lambda i, a: a * 1.0000001), big)
run("exp 58.7M", loop(lambda i, a: jnp.exp(a * 1e-6) * 0.9999), big)
run("nonzero 58.7M->1M",
    loop(lambda i, ix, m: jnp.nonzero(m + (ix[0] % 2).astype(jnp.int8), size=P, fill_value=-1)[0],
         ),
    idx_p, maski)
run("gather 1M from 58.7M",
    loop(lambda i, ix, a: ix ^ (a.reshape(-1)[ix].astype(jnp.int32) & 1)),
    idx_p, big)
run("scatter 1M into 58.7M",
    loop(lambda i, a, ix, v: a.reshape(-1).at[ix].set(v + i, mode="drop", unique_indices=True).reshape(V, K)),
    big, idx_p, vals_p)
run("argsort 2M i32", loop(lambda i, c: jnp.argsort(c ^ i)), cand)
run("sort 2M i32", loop(lambda i, c: jnp.sort(c) ^ (i & 1)), cand)
