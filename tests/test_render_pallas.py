"""Pallas render-reduction kernel vs the XLA reduction (the tested oracle).

Runs the kernel in interpreter mode on the CPU backend at the tiny config;
the TPU-compiled path is checked by benchmarks/check_render_pallas.py on
hardware (round-4: EQUAL at both ZED2 and VKITTI2 scales)."""

import numpy as np
import jax.numpy as jnp
import pytest

from semantic_dsp_map_tpu.config import tiny_test_config
from semantic_dsp_map_tpu.ops.render import render_occupancy_xla
from semantic_dsp_map_tpu.ops.render_pallas import (
    render_occupancy_pallas,
    render_pallas_supported,
)
from semantic_dsp_map_tpu.state import (
    STATUS_GUESSED_BORN,
    STATUS_INVALID,
    STATUS_REGULAR_BORN,
    STATUS_UPDATED,
    init_map_state,
)


def _random_state(cfg, seed):
    rng = np.random.RandomState(seed)
    V, K = cfg.num_voxels, cfg.slots_per_voxel
    state = init_map_state(cfg)
    status = rng.choice(
        [STATUS_INVALID, STATUS_UPDATED, STATUS_REGULAR_BORN, STATUS_GUESSED_BORN],
        size=V * K, p=[0.3, 0.4, 0.2, 0.1],
    ).astype(np.uint8)
    weight = (rng.rand(V * K) * 1.4).astype(np.float32)
    weight[: V * K // 8] *= 0.05  # hit the GC path
    state = state.replace(
        particles=state.particles.replace(
            status=jnp.asarray(status),
            weight=jnp.asarray(weight),
            track=jnp.asarray(rng.randint(0, 4, V * K).astype(np.uint16)),
            label=jnp.asarray(rng.randint(0, 8, V * K).astype(np.uint8)),
            stamp=jnp.asarray(rng.randint(0, 3, V * K).astype(np.int32)),
        ),
        voxel_stamp=jnp.asarray(rng.randint(0, 3, V).astype(np.int32)),
    )
    # random scroll stamps exercise the alive/voxel-valid masks
    sc = state.scroll.replace(
        axis_stamp_x=jnp.asarray(rng.randint(0, 2, cfg.nx).astype(np.int32)),
        axis_stamp_y=jnp.asarray(rng.randint(0, 2, cfg.ny).astype(np.int32)),
    )
    return state.replace(scroll=sc)


@pytest.mark.parametrize("seed", [5, 17])
def test_render_pallas_matches_xla(seed):
    cfg = tiny_test_config()
    assert render_pallas_supported(cfg)
    state = _random_state(cfg, seed)
    thr = 0.4

    px, rx = render_occupancy_xla(cfg, state, thr)
    pp, rp = render_occupancy_pallas(cfg, state, thr, True)

    np.testing.assert_array_equal(np.asarray(rx.occ), np.asarray(rp.occ))
    np.testing.assert_array_equal(np.asarray(rx.label), np.asarray(rp.label))
    np.testing.assert_array_equal(np.asarray(rx.track), np.asarray(rp.track))
    np.testing.assert_allclose(
        np.asarray(rx.weight_sum), np.asarray(rp.weight_sum), atol=1e-5
    )
    # storage side effects (clamp + GC)
    np.testing.assert_array_equal(
        np.asarray(px.weight), np.asarray(pp.weight)
    )
    np.testing.assert_array_equal(
        np.asarray(px.status), np.asarray(pp.status)
    )
