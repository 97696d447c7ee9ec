"""Per-stage profile of the PRODUCTION frame pipeline (map.build_frame_step).

Times each stage as its own jitted call against a warmed-up (populated) map
state, on whatever backend is active (TPU by default on this host), for the
ZED2 and VKITTI2 configs.  This is the stage table PROFILE_r02.md promised;
run:  python benchmarks/profile_frame.py [zed2|vkitti2|both]

Caveat: per-call dispatch through the TPU tunnel is ~2-3 ms, so small stages
are upper bounds; the `full_step` row is the ground truth (one dispatch).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import synth_vkitti2_frame, synth_zed2_frame  # noqa: E402
from semantic_dsp_map_tpu import SemanticDSPMap  # noqa: E402
from semantic_dsp_map_tpu.config import (  # noqa: E402
    FilterParams,
    virtual_kitti2_config,
    zed2_config,
)
from semantic_dsp_map_tpu.frontend import build_frame_input  # noqa: E402
from semantic_dsp_map_tpu.labels import LabelRegistry  # noqa: E402
from semantic_dsp_map_tpu.map import _move_and_cleanup  # noqa: E402
from semantic_dsp_map_tpu.objects import (  # noqa: E402
    ObservedInstances,
    expire_objects,
    object_level_update,
)
from semantic_dsp_map_tpu.ops import codecs  # noqa: E402
from semantic_dsp_map_tpu.ops.birth import birth_and_resample  # noqa: E402
from semantic_dsp_map_tpu.ops.geometry import camera_matrices  # noqa: E402
from semantic_dsp_map_tpu.ops.observe import observe_and_update  # noqa: E402
from semantic_dsp_map_tpu.ops.projection import generate_labeled_cloud  # noqa: E402
from semantic_dsp_map_tpu.ops.render import render_occupancy  # noqa: E402


def timeit(name, fn, *args, iters=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"| {name:<22} | {ms:9.2f} |", flush=True)
    return out, ms


def profile(name, cfg, params, synth, warm_frames=6):
    print(f"\n## {name}  (grid {cfg.nx}x{cfg.ny}x{cfg.nz}, K={cfg.slots_per_voxel}, "
          f"img {cfg.width}x{cfg.height}, R={cfg.neighbor_half})")
    print("| stage | ms |\n|---|---|")
    registry = LabelRegistry.default()
    dsp = SemanticDSPMap(cfg, params, registry)

    # Warm the map so stages see a populated state.
    for t in range(warm_frames):
        d, m, p, q = synth(cfg, t)
        dsp.update(d, m, p, q, time=t * 0.1)
    jax.block_until_ready(dsp.state.particles.weight)

    state = dsp.state
    t = warm_frames
    d, m, p, q = synth(cfg, t)
    frame = build_frame_input(cfg, registry, d, m, p, q, t * 0.1)
    frame = jax.device_put(frame)

    # ground truth FIRST (one dispatch; donation-safe sequential chain) so the
    # later per-stage copies don't have to coexist with it in HBM.
    st = dsp.state
    st, r, dg = dsp._step(st, frame)
    jax.block_until_ready(st.particles.weight)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        st, r, dg = dsp._step(st, frame)
    jax.block_until_ready(st.particles.weight)
    full_ms = (time.perf_counter() - t0) / iters * 1e3
    visible = int(np.asarray(dg.visible_count))
    born = int(np.asarray(dg.born_count))
    state = st
    dsp.state = None  # drop the stale reference
    del st, r, dg

    gt = state.global_time + 1
    rng, k_obj, k_move, k_birth = jax.random.split(state.rng, 4)
    r_wc, t_wc, r_cw, t_cw = camera_matrices(frame.cam_pos, frame.cam_quat)
    r_wc, t_wc, r_cw, t_cw = jax.device_put((r_wc, t_wc, r_cw, t_cw))

    max_movable = registry.max_movable_instance_id

    # 1. object layer
    obs = ObservedInstances(
        valid=frame.inst_valid, track=frame.inst_track, label=frame.inst_label,
        kpts_curr=frame.kpts_curr, kpts_prev=frame.kpts_prev,
        kpts_count=frame.kpts_count,
    )
    obj_fn = jax.jit(lambda o, ob, k: object_level_update(
        cfg, params, o, ob, frame.cam_pos, r_cw, t_cw, frame.time,
        state.prev_frame_time, gt, k))
    objects, _ = timeit("object_level_update", obj_fn, state.objects, obs, k_obj)

    # 2. labeled cloud
    cloud_fn = jax.jit(lambda dep, tr, tbl: generate_labeled_cloud(
        cfg, params, dep, tr, tbl, r_wc, t_wc, max_movable))
    cloud, _ = timeit("labeled_cloud", cloud_fn, frame.depth,
                      frame.track_raster, frame.track_label_table)

    # 3. scroll + expiry + move/cleanup
    scroll, _ = timeit(
        "update_ego_center",
        jax.jit(lambda s: codecs.update_ego_center(cfg, s, frame.cam_pos, gt)),
        state.scroll)
    objects, _ = timeit(
        "expire_objects",
        jax.jit(lambda o: expire_objects(params, o, gt)[0]), objects)
    mc_fn = jax.jit(lambda pt, s, o, k: _move_and_cleanup(
        cfg, params, pt, s, o, gt, k, max_movable))
    (particles, moved, _ov), _ = timeit(
        "move_and_cleanup", mc_fn, state.particles, scroll, objects, k_move)
    state = state.replace(particles=None)  # free the pre-move copy

    # 4+5. observe (visibility + PHD fused)
    (particles2, vst, od), _ = timeit(
        "observe_and_update", observe_and_update, cfg, params,
        particles, scroll, state.voxel_stamp, cloud, frame.depth,
        r_cw, t_cw, gt)
    del particles

    # 6. birth + resample
    (particles3, born_b, bov, _c), _ = timeit(
        "birth_and_resample",
        jax.jit(lambda pt, s, c, k: birth_and_resample(cfg, params, pt, s, c, gt, k)),
        particles2, scroll, cloud, k_birth)
    del particles2

    # 7. render
    st2 = state.replace(particles=particles3, voxel_stamp=vst, scroll=scroll)
    _, _ = timeit(
        "render_occupancy",
        lambda s: render_occupancy(cfg, s, params.occupancy_threshold), st2)

    print(f"| {'full_step':<22} | {full_ms:9.2f} |")
    print(f"\nvisible={visible} born={born} "
          f"full={full_ms:.1f} ms -> {1e3/full_ms:.2f} fps")
    return full_ms


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("zed2", "both"):
        params = FilterParams(
            detection_probability=0.8, noise_number=0.2, nb_ptc_num_per_point=1,
            occupancy_threshold=0.15, if_consider_depth_noise=True,
            depth_noise_model_first_order=0.02, depth_noise_model_zero_order=0.3,
        )
        profile("zed2", zed2_config(), params, synth_zed2_frame)
    if which in ("vkitti2", "both"):
        params = FilterParams(
            detection_probability=0.98, noise_number=0.001, nb_ptc_num_per_point=1,
            occupancy_threshold=0.5, if_consider_depth_noise=True,
            depth_noise_model_first_order=0.01, depth_noise_model_zero_order=0.2,
        )
        profile("vkitti2", virtual_kitti2_config(), params, synth_vkitti2_frame)


if __name__ == "__main__":
    main()
