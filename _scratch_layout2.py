import time, jax, jax.numpy as jnp
V, K = 8388608, 7
N = V*K

def timed(name, fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(3): out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/3*1e3:.2f} ms", flush=True)

k = jax.random.PRNGKey(0)
track = jax.random.randint(k, (V, K), 0, 65536)
table = jnp.arange(65536, dtype=jnp.int32)
mask = jax.random.bernoulli(jax.random.fold_in(k,1), 0.1, (V, K))
stampx = jnp.zeros(256, jnp.int32)

timed("table_gather_VK", jax.jit(lambda t, tb: tb[jnp.clip(t,0,65535)].sum()), track, table)
timed("axis_gather", jax.jit(lambda s: (s[jnp.arange(V)&255] + s[(jnp.arange(V)>>8)&127]).sum()), stampx)
timed("nonzero_VK", jax.jit(lambda m: jnp.nonzero(m.reshape(-1), size=1<<18, fill_value=-1)[0].sum()), mask)
timed("nonzero_2d", jax.jit(lambda m: jnp.nonzero(m, size=1<<18, fill_value=-1)[0].sum()), mask)
idx = jax.random.randint(jax.random.fold_in(k,2), (1<<18,), 0, N)
w = jnp.ones((V, K), jnp.float32)
timed("flat_scatter_VK", jax.jit(lambda w, i: w.reshape(-1).at[i].set(0.5).reshape(V,K).sum()), w, idx)
sl = jax.random.randint(jax.random.fold_in(k,3), (1<<18,), 0, K)
vx = jax.random.randint(jax.random.fold_in(k,4), (1<<18,), 0, V)
timed("scatter_2d_VK", jax.jit(lambda w, s, v: w.at[v, s].set(0.5).sum()), w, sl, vx)
timed("gather_2d_VK", jax.jit(lambda w, s, v: w[v, s].sum()), w, sl, vx)
wkv = jnp.ones((K, V), jnp.float32)
timed("scatter_2d_KV", jax.jit(lambda w, s, v: w.at[s, v].set(0.5).sum()), wkv, sl, vx)
timed("gather_2d_KV", jax.jit(lambda w, s, v: w[s, v].sum()), wkv, sl, vx)
