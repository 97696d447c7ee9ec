"""Chained-iteration microbenchmarks: each call consumes the previous output,
defeating any result caching / overlap. Also scale-checks iters."""
import time

import jax
import jax.numpy as jnp

N_BIG = 58_720_256
P = 1 << 20
key = jax.random.PRNGKey(0)
big = jax.random.normal(key, (N_BIG,), jnp.float32)
idx_big = jax.random.randint(key, (P,), 0, N_BIG, jnp.int32)


def bench_chain(name, fn, x0, iters):
    x = jax.block_until_ready(fn(x0))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<46} {ms:9.3f} ms  (iters={iters})", flush=True)


f_pass = jax.jit(lambda a: a * 1.0000001)
bench_chain("chained full pass 58.7M f32", f_pass, big, 10)
bench_chain("chained full pass 58.7M f32", f_pass, big, 50)

f_exp = jax.jit(lambda a: jnp.exp(a * 1e-6) - 1.0 + a * 0.0)
bench_chain("chained exp pass 58.7M", f_exp, big, 10)

f_gather = jax.jit(lambda i: idx_big[i % P] ^ 1)
bench_chain("chained gather 1M from 1M i32", f_gather, idx_big, 20)

f_g2 = jax.jit(lambda c: big[(idx_big + c.astype(jnp.int32)) % N_BIG].sum().reshape(()))
x = jnp.zeros((), jnp.float32)
bench_chain("chained gather 1M from 58.7M + sum", f_g2, x, 20)

small = big[: 5_600_000]
f_fori = jax.jit(lambda a: jax.lax.fori_loop(
    0, 121, lambda i, s: s + jnp.exp(a * (1e-7 * i)), jnp.zeros_like(a)) * 1e-9 + a)
bench_chain("chained fori121 exp 5.6M", f_fori, small, 5)

f_sort = jax.jit(lambda k: jnp.sort(k ^ 12345))
bench_chain("chained sort 1M i32", f_sort, idx_big, 20)
