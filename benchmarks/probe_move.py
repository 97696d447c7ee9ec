"""Bisect _move_and_cleanup at VKITTI2 shape with real movers."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from semantic_dsp_map_tpu.config import FilterParams, virtual_kitti2_config  # noqa: E402
from semantic_dsp_map_tpu.map import _move_and_cleanup  # noqa: E402
from semantic_dsp_map_tpu.state import STATUS_UPDATED, init_map_state  # noqa: E402

cfg = virtual_kitti2_config()
params = FilterParams(nb_ptc_num_per_point=1, if_consider_depth_noise=True)
V, K = cfg.num_voxels, cfg.slots_per_voxel
rng = np.random.RandomState(0)

state = init_map_state(cfg, 0)
p = state.particles

# populate ~2M particles, ~60k of them car (track 3)
occ = rng.rand(V, K) < 0.034
car = occ & (rng.rand(V, K) < 0.03)
track = np.where(car, 3, 65529).astype(np.int32)
status = np.where(occ, STATUS_UPDATED, 0).astype(np.int32)
px = np.where(occ, rng.randn(V, K) * 10, 0).astype(np.float32)
py = np.where(occ, rng.randn(V, K) * 3, 0).astype(np.float32)
pz = np.where(occ, rng.rand(V, K) * 25, 0).astype(np.float32)
w = np.where(occ, rng.rand(V, K), 0).astype(np.float32)
stamp = np.ones((V, K), np.int32)
p = p.replace(px=jnp.asarray(px), py=jnp.asarray(py), pz=jnp.asarray(pz),
              weight=jnp.asarray(w), track=jnp.asarray(track),
              status=jnp.asarray(status), stamp=jnp.asarray(stamp))
print("live:", int(occ.sum()), "car:", int(car.sum()))

obj = state.objects
T = np.eye(4, dtype=np.float32)
T[0, 3] = 0.4
obj = obj.replace(
    valid=obj.valid.at[0].set(True),
    track_id=obj.track_id.at[0].set(3),
    moving=obj.moving.at[0].set(True),
    has_moved_record=obj.has_moved_record.at[0].set(True),
    has_tmatrix=obj.has_tmatrix.at[0].set(True),
    tmatrix=obj.tmatrix.at[0].set(jnp.asarray(T)),
)
obj_none = state.objects  # no moving objects
key = jax.random.PRNGKey(0)
gt = jnp.int32(2)


def timeit(name, fn, pt, o, k, iters=5):
    # donation-style chain: feed the output particles back as input so only
    # two particle states are ever live (the big config OOMs otherwise)
    out = jax.block_until_ready(fn(pt, o, k))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out[0], o, k)
        out = (jax.block_until_ready(out[0]),) + out[1:]
    print(f"{name:<30} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)
    return out


fn = jax.jit(lambda pt, o, k: _move_and_cleanup(cfg, params, pt, state.scroll, o, gt, k, 65523),
             donate_argnums=0)
# movers FIRST (the no-movers cleanup would float-invalidate the car)
out = timeit("move (1 moving car)", fn, p, obj, key)
timeit("move (no movers)", fn, out[0], obj_none, key)
