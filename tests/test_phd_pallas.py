"""Pallas PHD stencil kernels vs the XLA stencils (the tested oracle).

Runs the kernels in interpreter mode on the CPU backend at tiny shapes; the
TPU-compiled path is checked by benchmarks/check_pallas.py on hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from semantic_dsp_map_tpu.config import FilterParams, tiny_test_config
from semantic_dsp_map_tpu.ops.phd import (
    PixelTable,
    stencil_pass_a,
    stencil_pass_b,
)
from semantic_dsp_map_tpu.ops.phd_pallas import pass_a_pallas, pass_b_pallas
from semantic_dsp_map_tpu.ops.geometry import forgetting_factor
from semantic_dsp_map_tpu.ops.projection import LabeledCloud


def _inputs(cfg, seed=0, fill=0.4, front_fill=False):
    rng = np.random.RandomState(seed)
    H, W, S = cfg.height, cfg.width, cfg.phd_pixel_table_slots
    if front_fill:
        # Realistic front-filled table: slot s occupied only if s-1 is, so
        # high slot planes are empty — exercises the kernels' slot-group
        # liveness skip (dead planes must contribute exact zeros / keep
        # their weight).
        depth_per_pixel = rng.poisson(fill * S, (1, H, W))
        occ = np.arange(S)[:, None, None] < depth_per_pixel
    else:
        occ = rng.rand(S, H, W) < fill
    track = rng.randint(0, 5, (S, H, W)).astype(np.int32)
    forget = rng.randint(0, 6, (S, H, W)).astype(np.int32)
    meta = np.where(occ, (track << 8) | forget, -1).astype(np.int32)
    t = PixelTable(
        px=jnp.asarray(np.where(occ, rng.randn(S, H, W), 0).astype(np.float32)),
        py=jnp.asarray(np.where(occ, rng.randn(S, H, W), 0).astype(np.float32)),
        pz=jnp.asarray(np.where(occ, rng.rand(S, H, W) * 4 + 1, 0).astype(np.float32)),
        weight=jnp.asarray(np.where(occ, rng.rand(S, H, W), 0).astype(np.float32)),
        meta=jnp.asarray(meta),
        dropped=jnp.int32(0),
    )
    cloud = LabeledCloud(
        pos=jnp.asarray(
            (rng.randn(H, W, 3) + np.array([0, 0, 2.5])).astype(np.float32)
        ),
        sigma=jnp.asarray((0.2 + rng.rand(H, W) * 0.2).astype(np.float32)),
        label=jnp.asarray(rng.randint(0, 10, (H, W)).astype(np.int32)),
        track=jnp.asarray(rng.randint(0, 5, (H, W)).astype(np.int32)),
        valid=jnp.asarray(rng.rand(H, W) < 0.85),
    )
    return t, cloud


@pytest.mark.parametrize(
    "independent,front_fill,fill",
    [(False, False, 0.4), (True, False, 0.4), (False, True, 0.12)],
)
def test_pallas_stencils_match_xla(independent, front_fill, fill):
    cfg = tiny_test_config(phd_pixel_table_slots=4)
    params = FilterParams(
        detection_probability=0.9,
        noise_number=0.1,
        if_use_independent_filter=independent,
        if_consider_depth_noise=True,
    )
    t, cloud = _inputs(cfg, fill=fill, front_fill=front_fill)

    ck_x = stencil_pass_a(cfg, params, t, cloud)
    nw_x, nf_x = stencil_pass_b(cfg, params, t, cloud, ck_x)

    occupied = t.meta >= 0
    track_t = t.meta >> 8
    forget_t = t.meta & 0xFF
    if independent:
        weff = jnp.where(occupied, t.weight, 0.0)
        ff_eff = occupied.astype(jnp.float32)
    else:
        ff = forgetting_factor(forget_t, params.forgetting_rate, params.max_forget_count)
        weff = jnp.where(occupied, t.weight * ff, 0.0)
        ff_eff = jnp.where(occupied, ff, 0.0)
    inv_sigma = 1.0 / jnp.maximum(cloud.sigma, 1e-6)

    kw = dict(interpret=True, th=8, tw=32)
    ck_raw = pass_a_pallas(
        cfg, params, t.px, t.py, t.pz, weff, track_t,
        cloud.pos[..., 0], cloud.pos[..., 1], cloud.pos[..., 2],
        inv_sigma, cloud.track, **kw,
    )
    ck_p = (
        jnp.where(cloud.valid, ck_raw, 0.0) * params.detection_probability
        + params.noise_number
    )
    np.testing.assert_allclose(np.asarray(ck_x), np.asarray(ck_p), rtol=2e-5, atol=1e-6)

    trk_eff = jnp.where(occupied, track_t, -2)
    acc, right_f = pass_b_pallas(
        cfg, params, t.px, t.py, t.pz, trk_eff, ff_eff, inv_sigma,
        cloud.pos[..., 0], cloud.pos[..., 1], cloud.pos[..., 2],
        cloud.valid, cloud.track, ck_p, **kw,
    )
    nw_p = t.weight * (
        acc * params.detection_probability + 1.0 - params.detection_probability
    )
    nw_p = jnp.where(occupied, nw_p, t.weight)
    np.testing.assert_allclose(np.asarray(nw_x), np.asarray(nw_p), rtol=2e-5, atol=1e-7)

    if not independent:
        from semantic_dsp_map_tpu.config import FORGET_COUNT_INCREMENT_CAP

        nf_p = jnp.where(
            right_f > 0.0,
            0,
            jnp.where(forget_t < FORGET_COUNT_INCREMENT_CAP, forget_t + 1, forget_t),
        )
        np.testing.assert_array_equal(np.asarray(nf_x), np.asarray(nf_p))
