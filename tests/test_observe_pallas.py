"""Pallas dense candidate pass vs the XLA front (the tested oracle).

Interpreter mode on the CPU backend at the tiny config; the compiled path is
exercised on hardware by the full-frame benchmarks."""

import numpy as np
import jax.numpy as jnp

from semantic_dsp_map_tpu.config import tiny_test_config
from semantic_dsp_map_tpu.ops import codecs
from semantic_dsp_map_tpu.ops.geometry import camera_matrices, project_to_image_xyz
from semantic_dsp_map_tpu.ops.observe_pallas import (
    front_candidates,
    front_pallas_supported,
)
from semantic_dsp_map_tpu.state import init_map_state, particles_vk


def test_front_candidates_matches_xla():
    cfg = tiny_test_config()
    assert front_pallas_supported(cfg)
    rng = np.random.RandomState(3)
    n = cfg.num_voxels * cfg.slots_per_voxel
    state = init_map_state(cfg)
    state = state.replace(
        particles=state.particles.replace(
            px=jnp.asarray(rng.randn(n).astype(np.float32) * 2),
            py=jnp.asarray(rng.randn(n).astype(np.float32) * 2),
            pz=jnp.asarray((rng.rand(n) * 10 - 1).astype(np.float32)),
            status=jnp.asarray(rng.randint(0, 3, n).astype(np.uint8)),
            stamp=jnp.asarray(rng.randint(0, 3, n).astype(np.int32)),
        ),
        scroll=state.scroll.replace(
            axis_stamp_x=jnp.asarray(rng.randint(0, 2, cfg.nx).astype(np.int32)),
        ),
    )
    _, _, r_cw, t_cw = camera_matrices(
        jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0])
    )

    ha, hc = front_candidates(cfg, state.particles, state.scroll, r_cw, t_cw, True)

    pv = particles_vk(cfg, state.particles)
    vox_axis = codecs.axis_stamps_per_voxel(cfg, state.scroll)
    alive = codecs.particle_alive(pv.status, pv.stamp, vox_axis)
    _, _, _, ok = project_to_image_xyz(cfg, r_cw, t_cw, pv.px, pv.py, pv.pz)
    cand = ok & alive
    np.testing.assert_array_equal(
        np.asarray(ha) != 0, np.asarray(jnp.any(alive, axis=1))
    )
    np.testing.assert_array_equal(
        np.asarray(hc) != 0, np.asarray(jnp.any(cand, axis=1))
    )
