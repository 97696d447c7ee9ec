"""Bisect observe_and_update at VKITTI2 scale on a realistic (warmed) state.

Strategy: run N warmup frames of the bench synth scene through the real map,
snapshot the state + frame arrays, then time observe_and_update variants:
  - full
  - capacity sweeps (max_active_blocks, max_table_entries)
  - with the PHD stencil no-op'd          (cost of the stencil)
  - with the corner-stamp refresh no-op'd (cost of refresh_empty_voxel_stamps)
  - with the table build + write-back replaced by passthrough
All variants re-jit the unwrapped body with module functions monkeypatched.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import dataclasses  # noqa: E402

import bench  # noqa: E402
from semantic_dsp_map_tpu import SemanticDSPMap  # noqa: E402
from semantic_dsp_map_tpu.config import FilterParams, virtual_kitti2_config  # noqa: E402
from semantic_dsp_map_tpu.frontend import build_frame_input  # noqa: E402
from semantic_dsp_map_tpu.labels import LabelRegistry  # noqa: E402
from semantic_dsp_map_tpu.ops import observe as obs_mod  # noqa: E402
from semantic_dsp_map_tpu.ops import codecs  # noqa: E402
from semantic_dsp_map_tpu.ops.geometry import camera_matrices  # noqa: E402
from semantic_dsp_map_tpu.ops.projection import generate_labeled_cloud  # noqa: E402


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def main():
    cfg = virtual_kitti2_config()
    params = FilterParams(
        detection_probability=0.98, noise_number=0.001, nb_ptc_num_per_point=1,
        occupancy_threshold=0.5, max_observation_lost_time=5,
        forgetting_rate=1.0, max_forget_count=3, id_transition_probability=0.2,
        if_consider_depth_noise=True,
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
    cloud = generate_labeled_cloud(
        cfg, params, f.depth, f.track_raster, f.track_label_table,
        r_wc, t_wc, reg.max_movable_instance_id,
    )
    gt = state.global_time + 1
    args = (state.particles, state.scroll, state.voxel_stamp, cloud,
            f.depth, r_cw, t_cw, gt)

    raw = obs_mod.observe_and_update.__wrapped__

    def timeit(name, fn, cfg_, iters=10):
        out = fn(cfg_, params, *args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(cfg_, params, *args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        d = jax.tree_util.tree_map(lambda x: int(np.asarray(x)), out[2])
        print(f"{name:34s} {dt:8.2f} ms   diag={d}")

    jfull = jax.jit(raw, static_argnums=(0, 1))
    timeit("full", jfull, cfg)
    timeit("A=4096", jfull, dataclasses.replace(cfg, max_active_blocks=4096))
    timeit("A=2048", jfull, dataclasses.replace(cfg, max_active_blocks=2048))
    timeit("C=1<<19", jfull, dataclasses.replace(cfg, max_table_entries=1 << 19))
    timeit("C=1<<19, A=4096", jfull,
           dataclasses.replace(cfg, max_table_entries=1 << 19, max_active_blocks=4096))
    timeit("S=8", jfull, dataclasses.replace(cfg, phd_pixel_table_slots=8))

    # stencil no-op
    orig_stencil = obs_mod.stencil_passes
    obs_mod.stencil_passes = lambda cfg_, params_, table, cloud_: (
        jnp.ones((cfg_.height, cfg_.width), jnp.float32),
        table.weight,
        (table.meta & 0xFF).astype(jnp.int32),
    )
    timeit("stencil no-op", jax.jit(raw, static_argnums=(0, 1)), cfg)
    obs_mod.stencil_passes = orig_stencil

    # table build no-op (keeps sort + classification + write-back)
    orig_table = obs_mod.table_from_entries
    class _T:
        pass
    def fake_table(cfg_, pix, rank, keep, px, py, pz, w, trk, fg):
        t = orig_table(cfg_, pix[:1], rank[:1], keep[:1],
                       px[:1], py[:1], pz[:1], w[:1], trk[:1], fg[:1])
        return t
    obs_mod.table_from_entries = fake_table
    try:
        timeit("table build tiny", jax.jit(raw, static_argnums=(0, 1)), cfg)
    finally:
        obs_mod.table_from_entries = orig_table

    # corner refresh no-op
    orig_corner = obs_mod.refresh_empty_voxel_stamps
    obs_mod.refresh_empty_voxel_stamps = (
        lambda cfg_, scroll, vs, ha, depth, r, t, g: (vs, jnp.int32(0))
    )
    try:
        timeit("corner refresh no-op", jax.jit(raw, static_argnums=(0, 1)), cfg)
    finally:
        obs_mod.refresh_empty_voxel_stamps = orig_corner


if __name__ == "__main__":
    main()
