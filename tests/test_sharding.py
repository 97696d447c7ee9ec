"""Sharded-vs-single-device equality at the production program structure.

The conftest forces an 8-virtual-device CPU platform; the voxel grid is
sharded over all 8 devices with the same in/out shardings the driver's
multichip dryrun uses, and the full frame step (full PHD neighborhood, full
capacity buffers at the tiny grid size) must produce the same map as the
unsharded run.  This is the correctness test behind SURVEY section 2.3's
grid-sharding design (the reference's only parallelism is the 2-thread BFS,
mt_operations.h:110-174, which partitions space exactly the same way).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_dsp_map_tpu.config import FilterParams, tiny_test_config
from semantic_dsp_map_tpu.frontend import MaskKpts, build_frame_input
from semantic_dsp_map_tpu.labels import LabelRegistry
from semantic_dsp_map_tpu.map import build_frame_step
from semantic_dsp_map_tpu.parallel.sharding import (
    build_sharded_step,
    make_mesh,
    shard_state,
)
from semantic_dsp_map_tpu.state import init_map_state


def _frames(cfg, registry, n):
    H, W = cfg.height, cfg.width
    out = []
    for t in range(n):
        depth = np.full((H, W), 1.6, np.float32)
        static = np.full((H, W), 6, np.uint8)
        car = np.zeros((H, W), np.uint8)
        car[8:16, 4 + t : 12 + t] = 1
        depth[car > 0] = 1.2
        kpts = np.array(
            [[0.2 + 0.05 * t, 0, 1.2], [0.6 + 0.05 * t, 0, 1.2],
             [0.2 + 0.05 * t, -0.3, 1.2], [0.6 + 0.05 * t, -0.3, 1.2],
             [0.2 + 0.05 * t, 0, 1.5]],
            np.float32,
        )
        masks = [
            MaskKpts(track_id=65535, label="static", mask=static),
            MaskKpts(track_id=3, label="Car", mask=car, kpts_current=kpts,
                     kpts_previous=kpts - np.array([0.05, 0, 0], np.float32)),
        ]
        out.append(
            build_frame_input(
                cfg, registry, depth, masks,
                np.array([0, 0, 0.05 * t], np.float32),
                np.array([1, 0, 0, 0], np.float32), 0.15 * t,
            )
        )
    return out


def test_sharded_step_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU platform from conftest")

    cfg = tiny_test_config()
    params = FilterParams(
        if_consider_depth_noise=True, nb_ptc_num_per_point=1,
        depth_noise_model_zero_order=0.2,
    )
    registry = LabelRegistry.default()
    frames = _frames(cfg, registry, 3)

    # Single-device run.
    step1 = build_frame_step(cfg, params, registry)
    s1 = init_map_state(cfg, seed=0)
    for f in frames:
        s1, r1, d1 = step1(s1, f)

    # Sharded run: same pure function, grid sharded over all devices.
    mesh = make_mesh(8)
    s8 = shard_state(cfg, mesh, init_map_state(cfg, seed=0))
    step8 = build_sharded_step(cfg, params, registry, mesh, s8)
    for f in frames:
        s8, r8, d8 = step8(s8, f)

    np.testing.assert_array_equal(np.asarray(r1.occ), np.asarray(r8.occ))
    np.testing.assert_array_equal(np.asarray(r1.label), np.asarray(r8.label))
    np.testing.assert_array_equal(np.asarray(r1.track), np.asarray(r8.track))
    np.testing.assert_allclose(
        np.asarray(r1.weight_sum), np.asarray(r8.weight_sum), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s1.particles.weight), np.asarray(s8.particles.weight),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_array_equal(
        np.asarray(s1.voxel_stamp), np.asarray(s8.voxel_stamp)
    )
    assert int(d1.visible_count) == int(d8.visible_count)
    assert int(d1.born_count) == int(d8.born_count)
