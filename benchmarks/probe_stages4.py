"""Round-4 isolated stage timings on a warmed VKITTI2 state."""
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
from semantic_dsp_map_tpu.map import _move_and_cleanup  # noqa: E402
from semantic_dsp_map_tpu.ops.birth import birth_and_resample  # noqa: E402
from semantic_dsp_map_tpu.ops.geometry import camera_matrices  # noqa: E402
from semantic_dsp_map_tpu.ops.observe import observe_and_update  # noqa: E402
from semantic_dsp_map_tpu.ops.projection import generate_labeled_cloud  # noqa: E402

cfg = virtual_kitti2_config()
params = FilterParams(
    detection_probability=0.98, noise_number=0.001, nb_ptc_num_per_point=1,
    occupancy_threshold=0.5, if_consider_depth_noise=True,
    depth_noise_model_first_order=0.01, depth_noise_model_zero_order=0.2,
)
reg = LabelRegistry.default()
dsp = SemanticDSPMap(cfg, params, reg)
for t in range(6):
    d, m, p, q = bench.synth_vkitti2_frame(cfg, t)
    dsp.update(d, m, p, q, time=t * 0.1)
state = dsp.state

d, m, p, q = bench.synth_vkitti2_frame(cfg, 6)
f = build_frame_input(cfg, reg, d, m, p, q, 0.6)
r_wc, t_wc, r_cw, t_cw = camera_matrices(f.cam_pos, f.cam_quat)
gt = state.global_time + 1
rng = jax.random.PRNGKey(3)
mm = reg.max_movable_instance_id


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(name, fn, iters=10):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)
    return out


def cloud_fn():
    return generate_labeled_cloud(
        cfg, params, f.depth, f.track_raster, f.track_label_table,
        r_wc, t_wc, mm)
cloud = timeit("generate_labeled_cloud", cloud_fn)

move_r = jax.jit(
    lambda pt, sc, ob, g, r: _move_and_cleanup(cfg, params, pt, sc, ob, g, r, mm))
timeit("_move_and_cleanup",
       lambda: move_r(state.particles, state.scroll, state.objects, gt, rng))

timeit("observe_and_update",
       lambda: observe_and_update(cfg, params, state.particles, state.scroll,
                                  state.voxel_stamp, cloud, f.depth, r_cw,
                                  t_cw, gt))

birth_r = jax.jit(
    lambda pt, sc, cl, g, r: birth_and_resample(cfg, params, pt, sc, cl, g, r)[:3])
timeit("birth_and_resample",
       lambda: birth_r(state.particles, state.scroll, cloud, gt, rng))
