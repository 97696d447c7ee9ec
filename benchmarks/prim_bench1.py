"""Primitive-op microbenchmarks on the TPU: gather, scatter, sort, cumsum,
nonzero — these set the cost model for the frame-kernel redesign."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N_BIG = 58_720_256   # V*K at VKITTI2
N_TAB = 465_750      # H*W
P = 1 << 20

key = jax.random.PRNGKey(0)
big = jax.random.normal(key, (N_BIG,), jnp.float32)
tab = jax.random.normal(key, (N_TAB,), jnp.float32)
idx_big = jax.random.randint(key, (P,), 0, N_BIG, jnp.int32)
idx_tab = jax.random.randint(key, (P,), 0, N_TAB, jnp.int32)
vals = jax.random.normal(key, (P,), jnp.float32)
keys_u32 = jax.random.randint(key, (P,), 0, 1 << 30, jnp.int32)
pred = jax.random.bernoulli(key, 0.02, (N_BIG,))
big2d = big.reshape(-1, 7 * 128)  # [65536-ish, 896]


def bench(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<42} {ms:9.3f} ms", flush=True)


bench("noop (dispatch floor)", jax.jit(lambda x: x + 1.0), jnp.ones(8))
bench("gather 1M from 58.7M f32", jax.jit(lambda a, i: a[i]), big, idx_big)
bench("gather 1M from 466k f32 (depth)", jax.jit(lambda a, i: a[i]), tab, idx_tab)
bench("gather 8.4M from 466k f32", jax.jit(lambda a, i: a[i]), tab,
      jax.random.randint(key, (N_BIG // 7,), 0, N_TAB, jnp.int32))
bench("scatter-set 1M into 58.7M f32",
      jax.jit(lambda a, i, v: a.at[i].set(v, mode="drop", unique_indices=True)),
      big, idx_big, vals)
bench("scatter-add 1M into 466k f32",
      jax.jit(lambda a, i, v: a.at[i].add(v, mode="drop")), tab, idx_tab, vals)
bench("sort 1M u32", jax.jit(lambda k: jnp.sort(k)), keys_u32)
bench("argsort 1M u32", jax.jit(lambda k: jnp.argsort(k)), keys_u32)
bench("sort 1M key+3xf32 payload",
      jax.jit(lambda k, a, b, c: jax.lax.sort((k, a, b, c), num_keys=1)),
      keys_u32, vals, vals, vals)
bench("cumsum 58.7M i32", jax.jit(lambda p: jnp.cumsum(p.astype(jnp.int32))), pred)
bench("nonzero(size=1M) on 58.7M", jax.jit(lambda p: jnp.nonzero(p, size=P, fill_value=-1)[0]), pred)
bench("full pass r+w 58.7M f32 (x*2)", jax.jit(lambda a: a * 2.0), big)
bench("7-col slice pass [V,7]", jax.jit(lambda a: a[:, 3] * 2.0), big.reshape(-1, 7))
bench("exp 58.7M f32", jax.jit(lambda a: jnp.exp(a)), big)
bench("exp 5.6M x121 fori", jax.jit(
    lambda a: jax.lax.fori_loop(0, 121, lambda i, s: s + jnp.exp(a + i * 1e-3),
                                jnp.zeros_like(a))), big[: 5_600_000])

# Pallas sanity: trivial kernel.
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k_(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        k_, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
    print("pallas trivial:", np.asarray(f(x))[0, 0], flush=True)
except Exception as e:
    print("pallas FAILED:", e, flush=True)
