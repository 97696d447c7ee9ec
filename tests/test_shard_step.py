"""shard_map pipeline vs the single-device step (exact equality).

The explicit shard_map step (parallel/shard_step.py) partitions the voxel
grid into z-slabs and the image into row-slabs, coupling them with
all_to_all entry routing.  With the noise paths off (the full-frame oracle
conditions) and no camera-depth ties, the routed pipeline reproduces the
single-device step bit-for-bit: identical pixel-table slot assignment,
identical insertion order per voxel, identical reductions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_dsp_map_tpu.config import FilterParams, tiny_test_config
from semantic_dsp_map_tpu.labels import LabelRegistry
from semantic_dsp_map_tpu.map import build_frame_step
from semantic_dsp_map_tpu.parallel.shard_step import build_shard_map_step
from semantic_dsp_map_tpu.parallel.sharding import make_mesh, shard_state
from semantic_dsp_map_tpu.state import init_map_state

from test_sharding import _frames


def test_shard_map_step_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU platform")
    cfg = tiny_test_config()
    params = FilterParams(
        detection_probability=0.9,
        noise_number=0.01,
        nb_ptc_num_per_point=1,
        prediction_stddev=0.0,
        occupancy_threshold=0.3,
        if_consider_depth_noise=False,
        # movement filter tuned so the tracked car turns moving by frame 3,
        # exercising the cross-slab move-routing all_to_all
        bayesian_movement_increment=0.4,
        bayesian_movement_decrement=0.05,
        bayesian_movement_probability_threshold=0.3,
    )
    registry = LabelRegistry.default()
    frames = _frames(cfg, registry, 4)

    step1 = build_frame_step(cfg, params, registry)
    s1 = init_map_state(cfg, seed=7)
    tot1 = dict(visible=0, born=0, moved=0)
    for f in frames:
        s1, r1, d1 = step1(s1, f)
        tot1["visible"] += int(np.asarray(d1.visible_count))
        tot1["born"] += int(np.asarray(d1.born_count))
        tot1["moved"] += int(np.asarray(d1.moved_count))
    # the scenario must exercise every routed path
    assert tot1["visible"] > 0 and tot1["born"] > 0 and tot1["moved"] > 0

    mesh = make_mesh(8)
    stepN = build_shard_map_step(cfg, params, registry, mesh)
    sN = shard_state(cfg, mesh, init_map_state(cfg, seed=7))
    totN = dict(visible=0, born=0, moved=0)
    for f in frames:
        sN, rN, dN = stepN(sN, f)
        totN["visible"] += int(np.asarray(dN.visible_count))
        totN["born"] += int(np.asarray(dN.born_count))
        totN["moved"] += int(np.asarray(dN.moved_count))
    assert tot1 == totN

    # particle state
    for name in ["px", "py", "pz", "weight", "label", "track", "status",
                 "forget", "stamp"]:
        a = np.asarray(getattr(s1.particles, name))
        b = np.asarray(getattr(sN.particles, name))
        if a.dtype == np.float32:
            np.testing.assert_allclose(a, b, atol=1e-6, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)

    np.testing.assert_array_equal(
        np.asarray(s1.voxel_stamp), np.asarray(sN.voxel_stamp)
    )
    np.testing.assert_array_equal(np.asarray(r1.occ), np.asarray(rN.occ))
    np.testing.assert_array_equal(np.asarray(r1.label), np.asarray(rN.label))
    np.testing.assert_array_equal(np.asarray(r1.track), np.asarray(rN.track))
    np.testing.assert_allclose(
        np.asarray(r1.weight_sum), np.asarray(rN.weight_sum), atol=1e-5
    )

    # object layer (replicated compute must agree with single-device)
    np.testing.assert_array_equal(
        np.asarray(s1.objects.valid), np.asarray(sN.objects.valid)
    )
    np.testing.assert_allclose(
        np.asarray(s1.objects.moved_probability),
        np.asarray(sN.objects.moved_probability), atol=1e-6,
    )

    # headline diagnostics agree; overflows zero (capacities not exceeded)
    assert int(np.asarray(d1.visible_count)) == int(np.asarray(dN.visible_count))
    assert int(np.asarray(d1.born_count)) == int(np.asarray(dN.born_count))
    for fld in ["block_overflow", "entry_overflow", "move_overflow",
                "birth_overflow"]:
        assert int(np.asarray(getattr(dN, fld))) == 0, fld
