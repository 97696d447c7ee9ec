"""Time object_level_update alone at VKITTI2 shapes (O=32 objects)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402
from semantic_dsp_map_tpu import SemanticDSPMap  # noqa: E402
from semantic_dsp_map_tpu.config import FilterParams, virtual_kitti2_config  # noqa: E402
from semantic_dsp_map_tpu.frontend import build_frame_input  # noqa: E402
from semantic_dsp_map_tpu.labels import LabelRegistry  # noqa: E402
from semantic_dsp_map_tpu.objects import ObservedInstances, object_level_update  # noqa: E402
from semantic_dsp_map_tpu.ops.geometry import camera_matrices  # noqa: E402

cfg = virtual_kitti2_config()
params = FilterParams(
    detection_probability=0.98, noise_number=0.001, nb_ptc_num_per_point=1,
    occupancy_threshold=0.5, if_consider_depth_noise=True,
    depth_noise_model_first_order=0.01, depth_noise_model_zero_order=0.2,
)
reg = LabelRegistry.default()
dsp = SemanticDSPMap(cfg, params, reg)
for t in range(4):
    d, m, p, q = bench.synth_vkitti2_frame(cfg, t)
    dsp.update(d, m, p, q, time=t * 0.1)
state = dsp.state

d, m, p, q = bench.synth_vkitti2_frame(cfg, 4)
f = build_frame_input(cfg, reg, d, m, p, q, 0.4)
r_wc, t_wc, r_cw, t_cw = camera_matrices(f.cam_pos, f.cam_quat)
obs = ObservedInstances(
    valid=f.inst_valid, track=f.inst_track, label=f.inst_label,
    kpts_curr=f.kpts_curr, kpts_prev=f.kpts_prev, kpts_count=f.kpts_count,
)
rng = jax.random.PRNGKey(7)


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)
    return out


timeit("object_level_update", lambda: object_level_update(
    cfg, params, state.objects, obs, f.cam_pos, r_cw, t_cw,
    jnp.float32(0.4), state.prev_frame_time, state.global_time + 1, rng))

# is it the RANSAC?  Patch transforms.ransac_transform to a cheap identity
import semantic_dsp_map_tpu.objects as objmod  # noqa: E402
orig = objmod.ransac_transform
def fake_ransac(key, P, Q, m, n_iter, thr, refit):
    T = jnp.eye(4, dtype=jnp.float32)
    return T, m, jnp.sum(m.astype(jnp.int32)), jnp.float32(0.0), jnp.int32(0)
objmod.ransac_transform = fake_ransac
raw = object_level_update.__wrapped__
jfake = jax.jit(raw, static_argnums=(0, 1))
timeit("  ransac no-op", lambda: jfake(
    cfg, params, state.objects, obs, f.cam_pos, r_cw, t_cw,
    jnp.float32(0.4), state.prev_frame_time, state.global_time + 1, rng))
objmod.ransac_transform = orig
