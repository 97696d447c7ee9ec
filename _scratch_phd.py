import time, jax, jax.numpy as jnp
import numpy as np

H, W, P = 360, 640, 1<<20
R = 3
side = 2*R+1

k = jax.random.PRNGKey(0)
rows = jax.random.randint(k, (P,), 0, H)
cols = jax.random.randint(jax.random.fold_in(k,1), (P,), 0, W)
w = jnp.ones(P, jnp.float32)
pos = jax.random.normal(jax.random.fold_in(k,2), (P,3))
obs_pos = jax.random.normal(jax.random.fold_in(k,3), (H,W,3))
sigma = jnp.full((H,W), 0.1, jnp.float32)
valid = jnp.ones((H,W), bool)

def timed(name, fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(3): out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/3*1e3:.2f} ms", flush=True)

@jax.jit
def full(rows, cols, w, pos, obs_pos, sigma, valid):
    def body(off, ck):
        dm, dn = off//side - R, off%side - R
        ti, tj = rows+dm, cols+dn
        tis = jnp.clip(ti,0,H-1); tjs = jnp.clip(tj,0,W-1)
        op = obs_pos[tis,tjs]; sg = sigma[tis,tjs]; va = valid[tis,tjs]
        z = (pos-op)/sg[:,None]
        gk = jnp.exp(-0.5*jnp.sum(z*z,1))
        contrib = jnp.where(va & (ti>=0)&(ti<H)&(tj>=0)&(tj<W), w*gk, 0.)
        return ck.at[tis,tjs].add(contrib, mode="drop")
    return jax.lax.fori_loop(0, side*side, body, jnp.zeros((H,W),jnp.float32))

@jax.jit
def no_scatter(rows, cols, w, pos, obs_pos, sigma, valid):
    def body(off, acc):
        dm, dn = off//side - R, off%side - R
        ti, tj = rows+dm, cols+dn
        tis = jnp.clip(ti,0,H-1); tjs = jnp.clip(tj,0,W-1)
        op = obs_pos[tis,tjs]; sg = sigma[tis,tjs]; va = valid[tis,tjs]
        z = (pos-op)/sg[:,None]
        gk = jnp.exp(-0.5*jnp.sum(z*z,1))
        contrib = jnp.where(va, w*gk, 0.)
        return acc + contrib.sum()
    return jax.lax.fori_loop(0, side*side, body, jnp.float32(0))

@jax.jit
def no_gather(rows, cols, w, pos, obs_pos, sigma, valid):
    def body(off, ck):
        dm, dn = off//side - R, off%side - R
        ti, tj = rows+dm, cols+dn
        tis = jnp.clip(ti,0,H-1); tjs = jnp.clip(tj,0,W-1)
        z = pos*0.1
        gk = jnp.exp(-0.5*jnp.sum(z*z,1))
        return ck.at[tis,tjs].add(w*gk, mode="drop")
    return jax.lax.fori_loop(0, side*side, body, jnp.zeros((H,W),jnp.float32))

@jax.jit
def gather3_only(rows, cols, obs_pos):
    def body(off, acc):
        dm, dn = off//side - R, off%side - R
        tis = jnp.clip(rows+dm,0,H-1); tjs = jnp.clip(cols+dn,0,W-1)
        return acc + obs_pos[tis,tjs].sum()
    return jax.lax.fori_loop(0, side*side, body, jnp.float32(0))

@jax.jit
def gather1_only(rows, cols, sigma):
    def body(off, acc):
        dm, dn = off//side - R, off%side - R
        tis = jnp.clip(rows+dm,0,H-1); tjs = jnp.clip(cols+dn,0,W-1)
        return acc + sigma[tis,tjs].sum()
    return jax.lax.fori_loop(0, side*side, body, jnp.float32(0))

timed("full_49", full, rows, cols, w, pos, obs_pos, sigma, valid)
timed("no_scatter_49", no_scatter, rows, cols, w, pos, obs_pos, sigma, valid)
timed("no_gather_49", no_gather, rows, cols, w, pos, obs_pos, sigma, valid)
timed("gather3_only_49", gather3_only, rows, cols, obs_pos)
timed("gather1_only_49", gather1_only, rows, cols, sigma)
