"""Readback-timed microbenchmarks: force a device->host transfer of a scalar
derived from the result, so timing cannot be faked by async dispatch."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N_BIG = 58_720_256
P = 1 << 20
key = jax.random.PRNGKey(0)
big = jax.random.normal(key, (N_BIG,), jnp.float32)
idx_big = jax.random.randint(key, (P,), 0, N_BIG, jnp.int32)


def bench(name, fn, x0, iters):
    x = fn(x0)
    _ = float(jnp.asarray(x).ravel()[0])  # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _ = float(jnp.asarray(x).ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<46} {ms:9.3f} ms  (iters={iters})", flush=True)


f_pass = jax.jit(lambda a: a * 1.0000001)
bench("chained full pass 58.7M f32", f_pass, big, 20)

f_exp = jax.jit(lambda a: jnp.exp(a * 1e-6) - 1.0)
bench("chained exp pass 58.7M", f_exp, big, 10)

f_gather_big = jax.jit(lambda i: (idx_big + big[i % N_BIG].astype(jnp.int32)) % N_BIG)
bench("chained gather 1M from 58.7M f32", f_gather_big, idx_big, 10)

f_scat = jax.jit(lambda v: big.at[idx_big].set(v, mode="drop",
                                               unique_indices=True)[idx_big] + 1.0)
bench("chained scatter+gather 1M/58.7M", f_scat, jnp.ones(P), 10)

f_sort = jax.jit(lambda k: jnp.sort(k ^ 12345))
bench("chained sort 1M i32", f_sort, idx_big, 10)

small = big[:5_600_000]
f_fori = jax.jit(lambda a: jax.lax.fori_loop(
    0, 121, lambda i, s: s + jnp.exp(a * (1e-7 * i)), jnp.zeros_like(a)) * 1e-9 + a)
bench("chained fori121 exp 5.6M", f_fori, small, 3)

vk = big.reshape(-1, 7)
f_slice = jax.jit(lambda a: a.at[:, 3].set(a[:, 3] * 1.0000001))
bench("chained [V,7] col update", f_slice, vk, 10)

kv = big.reshape(7, -1)
f_slice2 = jax.jit(lambda a: a.at[3, :].set(a[3, :] * 1.0000001))
bench("chained [7,V] row update", f_slice2, kv, 10)
