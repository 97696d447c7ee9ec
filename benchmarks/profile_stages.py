"""Direct per-kernel timing at VKITTI2 shape (round-2 profiling scratch)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from semantic_dsp_map_tpu.config import FilterParams, virtual_kitti2_config
from semantic_dsp_map_tpu.frontend import MaskKpts, build_frame_input
from semantic_dsp_map_tpu.labels import LabelRegistry
from semantic_dsp_map_tpu.state import init_map_state
from semantic_dsp_map_tpu.ops import codecs
from semantic_dsp_map_tpu.ops.geometry import camera_matrices
from semantic_dsp_map_tpu.ops.projection import generate_labeled_cloud, visibility_pass
from semantic_dsp_map_tpu.ops.phd import phd_weight_update, build_pixel_table
from semantic_dsp_map_tpu.ops.birth import birth_and_resample, newborn_candidates, insert_particles, resample_voxels
from semantic_dsp_map_tpu.ops.render import render_occupancy
from semantic_dsp_map_tpu.map import _move_and_cleanup
from semantic_dsp_map_tpu.objects import expire_objects

cfg = virtual_kitti2_config()
params = FilterParams(nb_ptc_num_per_point=1, if_consider_depth_noise=True,
                      depth_noise_model_zero_order=0.2,
                      depth_noise_model_first_order=0.01)
registry = LabelRegistry.default()

H, W = cfg.height, cfg.width
rng = np.random.RandomState(0)
depth = np.full((H, W), 8.0, np.float32) + rng.rand(H, W).astype(np.float32)
static = np.full((H, W), 6, np.uint8)
frame = build_frame_input(
    cfg, registry, depth,
    [MaskKpts(track_id=65535, label="static", mask=static)],
    np.zeros(3, np.float32), np.array([1, 0, 0, 0], np.float32), 0.0,
)
frame = jax.device_put(frame)
state = init_map_state(cfg, seed=0)

gt = state.global_time + 1
k = jax.random.PRNGKey(1)
r_wc, t_wc, r_cw, t_cw = camera_matrices(frame.cam_pos, frame.cam_quat)

def timeit(name, fn, *args, iters=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<28} {ms:9.2f} ms", flush=True)
    return out

# Populate the map a bit first: run birth once so arrays aren't all-zero.
cloud = generate_labeled_cloud(cfg, params, frame.depth, frame.track_raster,
                               frame.track_label_table, r_wc, t_wc,
                               registry.max_movable_instance_id)
scroll = codecs.update_ego_center(cfg, state.scroll, frame.cam_pos, gt)
p1, acc, _ = birth_and_resample(cfg, params, state.particles, scroll, cloud, gt, k)
state = state.replace(particles=p1, scroll=scroll, global_time=gt)
jax.block_until_ready(state.particles.weight)
print("live particles after 1 birth:", int(jnp.sum(acc)), flush=True)

cloud = timeit("labeled_cloud", generate_labeled_cloud, cfg, params, frame.depth,
               frame.track_raster, frame.track_label_table, r_wc, t_wc,
               registry.max_movable_instance_id)

timeit("update_ego_center", codecs.update_ego_center, cfg, state.scroll, frame.cam_pos, gt)

mc = jax.jit(lambda p, s, o, r: _move_and_cleanup(cfg, params, p, s, o, gt, r,
                                                  registry.max_movable_instance_id))
timeit("move_and_cleanup", mc, state.particles, state.scroll, state.objects, k)

pv, vst, vis = timeit("visibility_pass", visibility_pass, cfg, state, frame.depth, r_cw, t_cw)

timeit("build_pixel_table", build_pixel_table, cfg, vis)

timeit("phd_weight_update", phd_weight_update, cfg, params, vis, cloud, pv, gt)

cand = newborn_candidates(cfg, params, cloud, gt, k)
cand = jax.device_put(cand)
timeit("newborn_candidates", jax.jit(lambda c, r: newborn_candidates(cfg, params, c, gt, r)), cloud, k)
timeit("resample_voxels", resample_voxels, cfg, state.particles, jnp.ones(cfg.num_voxels, bool))
timeit("insert_particles", insert_particles, cfg, state.particles, state.scroll, cand)
timeit("render_occupancy", render_occupancy, cfg, state, params.occupancy_threshold)
