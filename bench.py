"""Benchmark: full-frame map update rate on the reference's VKITTI2 workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference maps at ~10 Hz in its published configurations
(docs/3dbbox_mode.md:118-127, docs/superpoint_mode.md:79-81; BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def synth_frame(cfg, registry, t):
    """Synthetic VKITTI2-like frame: ground plane + buildings + a moving car."""
    from semantic_dsp_map_tpu.frontend import MaskKpts

    H, W = cfg.height, cfg.width
    rng = np.random.RandomState(t)

    # Depth: ground plane + a wall of buildings + noise.
    v, u = np.mgrid[0:H, 0:W].astype(np.float32)
    depth = np.full((H, W), 25.0, np.float32)
    ground = cfg.fy * 1.6 / np.maximum(v - cfg.cy, 1e-3)  # camera 1.6 m up
    depth = np.minimum(depth, np.where(v > cfg.cy, ground, depth))
    depth += rng.randn(H, W).astype(np.float32) * 0.05

    # Static mask: road below horizon (label 7), building above (label 6).
    static = np.where(v > cfg.cy, 6, 5).astype(np.uint8)  # mask holds id-1

    # A car box moving across the image.
    car = np.zeros((H, W), np.uint8)
    cx0 = int((0.2 + 0.02 * t) * W) % W
    car[H // 2 : H // 2 + H // 6, cx0 : cx0 + W // 8] = 1
    car_z = 12.0
    depth[car > 0] = car_z

    masks = [MaskKpts(track_id=65535, label="static", mask=static)]
    # Car keypoints in world frame.
    zc = car_z
    xl = (cx0 - cfg.cx) / cfg.fx * zc
    kpts = np.array(
        [[xl, 0, zc], [xl + 2, 0, zc], [xl, -1.5, zc], [xl + 2, -1.5, zc],
         [xl, 0, zc + 4], [xl + 2, 0, zc + 4]],
        np.float32,
    )
    kpts_prev = kpts - np.array([0.02 * W / cfg.fx * zc, 0, 0], np.float32)
    masks.append(
        MaskKpts(track_id=3, label="Car", mask=car, kpts_current=kpts, kpts_previous=kpts_prev)
    )

    pos = np.array([0.0, 0.0, 0.35 * t], np.float32)  # forward drive
    quat = np.array([1.0, 0, 0, 0], np.float32)
    return depth, masks, pos, quat


def main():
    from semantic_dsp_map_tpu import FilterParams, SemanticDSPMap
    from semantic_dsp_map_tpu.config import virtual_kitti2_config

    cfg = virtual_kitti2_config()
    params = FilterParams(
        detection_probability=0.98,
        noise_number=0.001,
        nb_ptc_num_per_point=1,
        occupancy_threshold=0.5,
        max_observation_lost_time=5,
        forgetting_rate=1.0,
        max_forget_count=3,
        id_transition_probability=0.2,
        if_consider_depth_noise=True,
        depth_noise_model_first_order=0.01,
        depth_noise_model_zero_order=0.2,
    )
    from semantic_dsp_map_tpu.labels import LabelRegistry

    registry = LabelRegistry.default()
    dsp = SemanticDSPMap(cfg, params, registry)

    warmup = 2
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    frames = [synth_frame(cfg, registry, t) for t in range(warmup + iters)]

    import jax

    # Warmup (compile).
    for t in range(warmup):
        d, m, p, q = frames[t]
        result, _ = dsp.update(d, m, p, q, time=t * 0.1)
    jax.block_until_ready(result.occ)

    t0 = time.perf_counter()
    for t in range(warmup, warmup + iters):
        d, m, p, q = frames[t]
        result, _ = dsp.update(d, m, p, q, time=t * 0.1)
    jax.block_until_ready(result.occ)
    dt = time.perf_counter() - t0

    fps = iters / dt
    baseline_fps = 10.0  # reference mapping rate (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "vkitti2_frames_per_sec",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
