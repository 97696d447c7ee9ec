"""Benchmark: full-frame map update rate on the reference's own headline
workload.

Headline metric: ZED2-mode mapping rate.  The reference's published 10 Hz
number (BASELINE.md; docs/3dbbox_mode.md:118-127) is ZED2 mode: grid
2^7 x 2^5 x 2^7 @ 0.15 m, 4 particles/voxel, BOOST half-res 640x360 input,
runtime params from cfg/options_zed2.yaml (nb_ptc_num_per_point=1,
detection_probability=0.8, noise_number=0.2, depth noise 0.3+0.02z — note
both reference YAMLs set nb_ptc_num_per_point to 1, overriding the header
default of 3 via the mapping.cpp:109-132 load path, so nb=1 IS the reference
workload).  The synthetic scene has a ground plane, a wall, and a moving
tracked object with 3D-bbox keypoints, with ego motion — every pipeline
stage (object layer, scroll, rigid moves, PHD, birth, render) is exercised.

Prints ONE JSON line; per-frame detail plus the VKITTI2-mode secondary run
goes to BENCH_DETAILS.json (run with BENCH_FULL=1 to include VKITTI2).
"""

import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: the full bench compiles ~6 large
# executables (~3 min each through a slow tunnel session); cache hits make
# re-runs start in seconds.  Repo-local dir, gitignored.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__) or ".",
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def synth_zed2_frame(cfg, t):
    """ZED2-like frame at full sensor res (update() BOOST-resizes)."""
    from semantic_dsp_map_tpu.frontend import MaskKpts

    H, W = cfg.image_height, cfg.image_width
    rng = np.random.RandomState(t)

    v = np.arange(H, dtype=np.float32)[:, None]
    depth = np.full((H, W), 9.0, np.float32)
    ground = cfg.camera_fy * 1.2 / np.maximum(v - cfg.camera_cy, 1e-3)
    depth = np.minimum(depth, np.where(v > cfg.camera_cy, ground, depth))
    depth += rng.randn(H, W).astype(np.float32) * 0.03

    static = np.full((H, W), 6, np.uint8)  # Road-ish everywhere
    static[: H // 2] = 5                   # Building above horizon

    person = np.zeros((H, W), np.uint8)
    cx0 = int((0.15 + 0.015 * t) * W) % W
    person[H // 3 : H // 3 + H // 4, cx0 : cx0 + W // 10] = 1
    pz = 4.0
    depth[person > 0] = pz

    xl = (cx0 - cfg.camera_cx) / cfg.camera_fx * pz
    kpts = np.array(
        [[xl, -0.9, pz], [xl + 0.5, -0.9, pz], [xl, 0.9, pz], [xl + 0.5, 0.9, pz]],
        np.float32,
    )
    masks = [
        MaskKpts(track_id=65535, label="static", mask=static),
        MaskKpts(track_id=7, label="Person", mask=person, kpts_current=kpts,
                 kpts_previous=kpts - np.array([0.1, 0, 0], np.float32)),
    ]
    pos = np.array([0.02 * t, 0.0, 0.2 * t], np.float32)
    quat = np.array([1.0, 0, 0, 0], np.float32)
    return depth, masks, pos, quat


def synth_vkitti2_frame(cfg, t, car_h_div=6, car_w_div=8):
    """VKITTI2-like frame: ground + buildings + a moving car."""
    from semantic_dsp_map_tpu.frontend import MaskKpts

    H, W = cfg.height, cfg.width
    rng = np.random.RandomState(t)

    v = np.arange(H, dtype=np.float32)[:, None]
    depth = np.full((H, W), 25.0, np.float32)
    ground = cfg.fy * 1.6 / np.maximum(v - cfg.cy, 1e-3)
    depth = np.minimum(depth, np.where(v > cfg.cy, ground, depth))
    depth += rng.randn(H, W).astype(np.float32) * 0.05

    static = np.where(v > cfg.cy, 6, 5).astype(np.uint8) * np.ones((1, W), np.uint8)

    car = np.zeros((H, W), np.uint8)
    cx0 = int((0.2 + 0.02 * t) * W) % W
    car[H // 2 : H // 2 + H // car_h_div, cx0 : cx0 + W // car_w_div] = 1
    car_z = 12.0
    depth[car > 0] = car_z

    xl = (cx0 - cfg.cx) / cfg.fx * car_z
    kpts = np.array(
        [[xl, 0, car_z], [xl + 2, 0, car_z], [xl, -1.5, car_z],
         [xl + 2, -1.5, car_z], [xl, 0, car_z + 4], [xl + 2, 0, car_z + 4]],
        np.float32,
    )
    masks = [
        MaskKpts(track_id=65535, label="static", mask=static),
        MaskKpts(track_id=3, label="Car", mask=car, kpts_current=kpts,
                 kpts_previous=kpts - np.array([0.02 * W / cfg.fx * car_z, 0, 0], np.float32)),
    ]
    pos = np.array([0.0, 0.0, 0.35 * t], np.float32)
    quat = np.array([1.0, 0, 0, 0], np.float32)
    return depth, masks, pos, quat


def jnp_max(a, b):
    import jax.numpy as jnp

    return jnp.maximum(a, b)


def synth_hostile_frame(cfg, t):
    """The clip1-shaped stress workload (VERDICT r4 #6): 20 moving tracked
    cars at staggered depths, a dense near-field wall (heavy birth front),
    buildings/ground, ego yaw rotation + forward motion.  Sized so the
    static caps are NEARLY binding — run_config records the peak
    StepDiagnostics so cap pressure is visible in BENCH_DETAILS.json."""
    from semantic_dsp_map_tpu.frontend import MaskKpts

    H, W = cfg.height, cfg.width
    rng = np.random.RandomState(t)

    v = np.arange(H, dtype=np.float32)[:, None]
    depth = np.full((H, W), 28.0, np.float32)
    ground = cfg.fy * 1.6 / np.maximum(v - cfg.cy, 1e-3)
    depth = np.minimum(depth, np.where(v > cfg.cy, ground, depth))
    depth += rng.randn(H, W).astype(np.float32) * 0.05

    static = np.where(v > cfg.cy, 6, 5).astype(np.uint8) * np.ones((1, W), np.uint8)

    # dense near-field structure: a wall strip at 3.5 m sweeping with t
    w0 = int((0.05 + 0.01 * t) * W) % (W // 2)
    depth[: H // 3, w0 : w0 + W // 5] = 3.5 + rng.randn(H // 3, W // 5) * 0.02

    masks = [MaskKpts(track_id=65535, label="static", mask=static)]
    n_cars = 20
    for i in range(n_cars):
        car = np.zeros((H, W), np.uint8)
        col = (i % 5) / 5.0
        row = (i // 5) / 4.0
        cz = 8.0 + 2.0 * (i % 7)
        cw, ch = W // 14, H // 10
        cx0 = int((col + 0.01 * t * (1 + i % 3)) * W) % (W - cw)
        cy0 = int(H // 2 + row * H // 3) % (H - ch)
        car[cy0 : cy0 + ch, cx0 : cx0 + cw] = 1
        depth[car > 0] = cz
        xl = (cx0 - cfg.cx) / cfg.fx * cz
        yt = (cy0 - cfg.cy) / cfg.fy * cz
        kpts = np.array(
            [[xl, yt, cz], [xl + 1.8, yt, cz], [xl, yt + 1.2, cz],
             [xl + 1.8, yt + 1.2, cz], [xl + 0.9, yt + 0.6, cz],
             [xl, yt, cz + 3.5]],
            np.float32,
        )
        dx = 0.01 * W / cfg.fx * cz * (1 + i % 3)
        masks.append(
            MaskKpts(track_id=10 + i, label="Car", mask=car,
                     kpts_current=kpts,
                     kpts_previous=kpts - np.array([dx, 0, 0], np.float32))
        )

    yaw = 0.008 * t  # ~0.46 deg/frame ego rotation
    quat = np.array([np.cos(yaw / 2), 0.0, np.sin(yaw / 2), 0.0], np.float32)
    pos = np.array([0.05 * t, 0.0, 0.3 * t], np.float32)
    return depth, masks, pos, quat


def run_config(name, cfg, params, synth, iters, warmup=3, template_path=None):
    import jax

    from semantic_dsp_map_tpu import SemanticDSPMap
    from semantic_dsp_map_tpu.labels import LabelRegistry

    dsp = SemanticDSPMap(cfg, params, LabelRegistry.default())
    if template_path:
        n_tpl = dsp.set_template_path(template_path)
        assert n_tpl > 0, "no templates loaded"
    frames = [synth(cfg, t) for t in range(warmup + iters)]

    import jax

    updates = 0
    peak = None
    for t in range(warmup):
        d, m, p, q = frames[t]
        result, diag = dsp.update(d, m, p, q, time=t * 0.1)
    # Force full completion of warmup (block_until_ready alone can return
    # early through the TPU tunnel).
    _ = float(np.asarray(result.occ[:1])[0])

    # The timed loop issues ONLY the step: the diag leaves are already
    # device-resident step outputs, so collecting the lazy handles costs
    # nothing, and the peak/sum reduction happens after the final sync.
    # (Round-5 lesson: a per-frame tree_map(jnp.maximum) dispatched ~10
    # tiny device ops per frame — at today's ~70 ms tunnel round-trip that
    # alone dragged ZED2 from 26 fps to 4.5.)
    diags = []
    t0 = time.perf_counter()
    for t in range(warmup, warmup + iters):
        d, m, p, q = frames[t]
        result, diag = dsp.update(d, m, p, q, time=t * 0.1)
        diags.append(diag)
    _ = float(np.asarray(result.occ[:1])[0])
    dt = time.perf_counter() - t0

    for diag in diags:
        updates += diag.visible_count
        peak = diag if peak is None else jax.tree_util.tree_map(
            jnp_max, peak, diag
        )
    total_updates = int(np.asarray(updates))
    peak_diag = {k: int(np.asarray(v)) for k, v in peak._asdict().items()}
    return {
        "config": name,
        "frames": iters,
        "fps": round(iters / dt, 3),
        "particle_updates_per_sec": int(total_updates / dt),
        "sec_per_frame": round(dt / iters, 4),
        "peak_diag": peak_diag,
    }


def run_sharded_tpu_check(iters=8):
    """Run the explicit shard_map pipeline on the real device mesh (a
    1-device mesh on this host) and compare its render output bit-for-bit
    against the plain single-chip step (VERDICT r4 #5: the
    Pallas-kernels-inside-shard_map combination must execute on TPU, not
    only on the virtual CPU mesh where _use_pallas() is false).

    Static scene (no moving objects): the sharded move path draws its
    prediction jitter from a per-device folded key, so only a mover-free
    scene is bit-comparable across the two step builds."""
    import jax

    from semantic_dsp_map_tpu.config import FilterParams, zed2_config
    from semantic_dsp_map_tpu.frontend import MaskKpts, build_frame_input
    from semantic_dsp_map_tpu.labels import LabelRegistry
    from semantic_dsp_map_tpu.map import build_frame_step
    from semantic_dsp_map_tpu.parallel.shard_step import build_shard_map_step
    from semantic_dsp_map_tpu.parallel.sharding import make_mesh, shard_state
    from semantic_dsp_map_tpu.state import init_map_state

    cfg = zed2_config()
    params = FilterParams(
        detection_probability=0.8, noise_number=0.2, nb_ptc_num_per_point=1,
        occupancy_threshold=0.15, if_consider_depth_noise=True,
        depth_noise_model_first_order=0.02, depth_noise_model_zero_order=0.3,
    )
    registry = LabelRegistry.default()

    def frame(t):
        d, masks, pos, quat = synth_zed2_frame(cfg, t)
        masks = [m for m in masks if m.label == "static"]
        return build_frame_input(cfg, registry, d, masks, pos, quat, t * 0.1)

    frames = [jax.device_put(frame(t)) for t in range(iters)]

    plain = build_frame_step(cfg, params, registry)
    s1 = init_map_state(cfg, seed=0)
    outs_plain = []
    for f in frames:
        s1, r1, _ = plain(s1, f)
        outs_plain.append(jax.tree_util.tree_map(np.asarray, r1))

    mesh = make_mesh(len(jax.devices()))
    sharded = build_shard_map_step(cfg, params, registry, mesh)
    s2 = shard_state(cfg, mesh, init_map_state(cfg, seed=0))
    outs_sh = []
    for f in frames:
        s2, r2, _ = sharded(s2, f)
        outs_sh.append(jax.tree_util.tree_map(np.asarray, r2))
    equal = all(
        np.array_equal(a.occ, b.occ)
        and np.array_equal(a.label, b.label)
        and np.array_equal(a.track, b.track)
        for a, b in zip(outs_plain, outs_sh)
    )

    s2, r2, _ = sharded(s2, frames[0])
    _ = float(np.asarray(r2.occ[:1])[0])
    t0 = time.perf_counter()
    for t in range(iters):
        s2, r2, _ = sharded(s2, frames[t % len(frames)])
    _ = float(np.asarray(r2.occ[:1])[0])
    dt = time.perf_counter() - t0
    return {
        "config": "zed2_sharded_mesh%d" % len(jax.devices()),
        "frames": iters,
        "fps": round(iters / dt, 3),
        "render_equal_vs_plain": bool(equal),
        "backend": jax.default_backend(),
    }


def main():
    from semantic_dsp_map_tpu.config import (
        FilterParams, virtual_kitti2_config, zed2_config,
    )

    iters = int(os.environ.get("BENCH_ITERS", "50"))

    # ZED2 headline: cfg/options_zed2.yaml runtime params.
    zed2_params = FilterParams(
        detection_probability=0.8, noise_number=0.2, nb_ptc_num_per_point=1,
        occupancy_threshold=0.15, max_observation_lost_time=20,
        forgetting_rate=1.0, max_forget_count=5, id_transition_probability=0.5,
        bayesian_movement_distance_threshold=0.2,
        bayesian_movement_probability_threshold=0.3,
        bayesian_movement_increment=0.2, bayesian_movement_decrement=0.05,
        if_consider_depth_noise=True,
        depth_noise_model_first_order=0.02, depth_noise_model_zero_order=0.3,
    )
    zed2 = run_config("zed2", zed2_config(), zed2_params, synth_zed2_frame, iters)

    # VKITTI2 north-star workload: always measured (VERDICT r2 weak #1 —
    # never gate the headline config).  Reference maps VKITTI2 at ~10 Hz
    # (docs/superpoint_mode.md:79-81); runtime params from cfg/options.yaml
    # semantics (depth noise on).
    vk_params = FilterParams(
        detection_probability=0.98, noise_number=0.001, nb_ptc_num_per_point=1,
        occupancy_threshold=0.5, max_observation_lost_time=5,
        forgetting_rate=1.0, max_forget_count=3, id_transition_probability=0.2,
        if_consider_depth_noise=True,
        depth_noise_model_first_order=0.01, depth_noise_model_zero_order=0.2,
    )
    vkitti2 = run_config(
        "vkitti2", virtual_kitti2_config(), vk_params, synth_vkitti2_frame,
        max(10, iters // 2),
    )

    # Template-matching flag-on run (semantic_dsp_map.h:806-894): smaller car
    # mask so the observed point count sits in the 1500..8000 template-birth
    # window; committed CAD-stand-in template bank under data/templates.
    tpl_params = FilterParams(
        detection_probability=0.98, noise_number=0.001, nb_ptc_num_per_point=1,
        occupancy_threshold=0.5, max_observation_lost_time=5,
        if_consider_depth_noise=True,
        depth_noise_model_first_order=0.01, depth_noise_model_zero_order=0.2,
        if_use_template_matching=True, match_score_threshold=0.2,
    )
    tpl = run_config(
        "vkitti2_template", virtual_kitti2_config(), tpl_params,
        lambda c, t: synth_vkitti2_frame(c, t, car_h_div=8, car_w_div=14),
        max(20, iters // 2),
        template_path=os.path.join(os.path.dirname(__file__) or ".", "data", "templates"),
    )

    # Hostile clip1-shaped stress scene (VERDICT r4 #6): 20 movers, dense
    # near-field birth, ego rotation; peak diagnostics recorded.
    hostile = run_config(
        "vkitti2_hostile", virtual_kitti2_config(), vk_params,
        synth_hostile_frame, max(10, iters // 2),
    )

    details = {"zed2": zed2, "vkitti2": vkitti2, "vkitti2_template": tpl,
               "vkitti2_hostile": hostile}
    details_path = os.path.join(os.path.dirname(__file__) or ".", "BENCH_DETAILS.json")
    with open(details_path, "w") as f:
        json.dump(details, f, indent=1)

    # Sharded pipeline on the real device mesh (Pallas-in-shard_map on TPU;
    # VERDICT r4 #5).  TPU-only: the CPU path is covered by
    # tests/test_shard_step.py on the 8-virtual-device mesh.  Guarded, and
    # the headline numbers are written first, so a sharded-path failure can
    # never lose them.
    import jax

    if jax.default_backend() == "tpu":
        try:
            details["zed2_sharded"] = run_sharded_tpu_check()
        except Exception as e:
            details["zed2_sharded"] = {"error": repr(e)[:300]}
        with open(details_path, "w") as f:
            json.dump(details, f, indent=1)

    # Headline: the VKITTI2 north star (BASELINE.md: >10x the reference's
    # ~10 Hz mapping rate).  vs_baseline is fps / 10 Hz; the ZED2 secondary
    # number (baseline 10 Hz too) is in BENCH_DETAILS.json.
    baseline_fps = 10.0
    print(
        json.dumps(
            {
                "metric": "vkitti2_frames_per_sec",
                "value": vkitti2["fps"],
                "unit": "frames/s",
                "vs_baseline": round(vkitti2["fps"] / baseline_fps, 3),
                "zed2_fps": zed2["fps"],
            }
        )
    )


if __name__ == "__main__":
    main()
