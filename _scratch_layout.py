import time, jax, jax.numpy as jnp
V, K = 8388608, 7

@jax.jit
def f_vk(a, b):  # [V, K]
    return jnp.where(a > b, a * 1.5 + b, b - a)

@jax.jit
def f_kv(a, b):  # [K, V]
    return jnp.where(a > b, a * 1.5 + b, b - a)

@jax.jit
def f_flat(a, b):
    return jnp.where(a > b, a * 1.5 + b, b - a)

@jax.jit
def g_vk(a):  # gather 1M rows from [V*K, 3]
    idx = (jnp.arange(1<<20) * 37) % (V*K)
    return a[idx].sum()

for name, shape, fn in [("VK", (V, K), f_vk), ("KV", (K, V), f_kv), ("flat", (V*K,), f_flat)]:
    a = jnp.ones(shape, jnp.float32); b = jnp.full(shape, 2.0, jnp.float32)
    out = fn(a, b); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5): out = fn(a, b)
    jax.block_until_ready(out)
    print(f"elementwise {name}: {(time.perf_counter()-t0)/5*1e3:.2f} ms")

a = jnp.ones((V*K, 3), jnp.float32)
out = g_vk(a); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(5): out = g_vk(a)
jax.block_until_ready(out)
print(f"gather [N,3] rows: {(time.perf_counter()-t0)/5*1e3:.2f} ms")
