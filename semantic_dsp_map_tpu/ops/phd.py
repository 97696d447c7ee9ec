"""SMC-PHD particle weight update (hot loop #3 of the reference).

Reimplements SemanticDSPMap::updateParticles (semantic_dsp_map.h:960-1121)
as a scatter/gather pair over the compacted visible-particle buffer:

  Pass A (normalizer): every visible particle scatter-adds
      w * N^3(pos; obs, sigma_obs) * [forgetting, id-transition]
  into the per-pixel accumulator over its +-R pixel neighborhood, giving
      ck_kappa[i,j] = ck[i,j] * P_d + kappa        (semantic_dsp_map.h:973-1037)

  Pass B (update): every visible particle gathers
      gk / ck_kappa  over the same +-R neighborhood of *valid* observation
  pixels and multiplies its weight by (acc * P_d + 1 - P_d); status becomes
  UPDATED and the forgetting counter is reset iff some same-track observation
  matched with pdf > 0.1 (semantic_dsp_map.h:1041-1119).

Reference quirks preserved:
  - Pass A evaluates the Gaussian with the *observation* pixel's sigma while
    pass B uses the sigma at the *particle's own* pixel
    (semantic_dsp_map.h:985 vs :1047);
  - the per-axis pdf uses the 1/sqrt(pi) constant and the |z|>9.9 -> 1e-9
    clamp (see ops.geometry.gaussian_pdf1);
  - "rightly updated" is tested on the raw pdf before the id-transition and
    forgetting factors are applied (semantic_dsp_map.h:1091-1096);
  - the forget counter increments saturate at the literal 5
    (semantic_dsp_map.h:1111) independently of max_forget_count;
  - with the independent-filter flag, particles only interact with
    observations of their own track id and skip the forgetting/transition
    terms entirely (semantic_dsp_map.h:1009-1027, 1076-1097).

Both passes run as a fori_loop over the (2R+1)^2 static neighborhood offsets
with [P]-wide vectorized bodies, which keeps peak memory at O(P) instead of
O(P * (2R+1)^2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import FilterParams, MapConfig, MIN_RIGHTLY_UPDATED_PDF, FORGET_COUNT_INCREMENT_CAP
from ..state import Particles, STATUS_UPDATED
from .geometry import forgetting_factor, gaussian_pdf3
from .projection import LabeledCloud, VisibleSet


def _offsets(off, side, half):
    dm = off // side - half
    dn = off % side - half
    return dm, dn


@partial(jax.jit, static_argnums=(0, 1))
def compute_ck_kappa(
    cfg: MapConfig,
    params: FilterParams,
    vis: VisibleSet,
    cloud: LabeledCloud,
) -> jax.Array:
    """Pass A: the per-pixel PHD normalizer ck*P_d + kappa, f32[H, W]."""
    H, W = cfg.height, cfg.width
    half = cfg.neighbor_half
    side = 2 * half + 1

    real = vis.idx >= 0
    if not params.if_use_independent_filter:
        forget_f = forgetting_factor(
            vis.forget, params.forgetting_rate, params.max_forget_count
        )

    def body(off, ck):
        dm, dn = _offsets(off, side, half)
        ti = vis.row + dm
        tj = vis.col + dn
        inb = real & (ti >= 0) & (ti < H) & (tj >= 0) & (tj < W)
        tis = jnp.clip(ti, 0, H - 1)
        tjs = jnp.clip(tj, 0, W - 1)

        obs_valid = cloud.valid[tis, tjs]
        sigma = cloud.sigma[tis, tjs]
        obs_pos = cloud.pos[tis, tjs]
        obs_track = cloud.track[tis, tjs]

        gk = gaussian_pdf3(vis.pos, obs_pos, sigma)
        mask = inb & obs_valid
        if params.if_use_independent_filter:
            mask &= vis.track == obs_track
        else:
            gk = gk * forget_f
            gk = jnp.where(
                vis.track != obs_track,
                gk * params.id_transition_probability,
                gk,
            )

        contrib = jnp.where(mask, vis.weight * gk, 0.0)
        return ck.at[tis, tjs].add(contrib, mode="drop")

    ck = jax.lax.fori_loop(0, side * side, body, jnp.zeros((H, W), jnp.float32))
    return ck * params.detection_probability + params.noise_number


@partial(jax.jit, static_argnums=(0, 1))
def phd_weight_update(
    cfg: MapConfig,
    params: FilterParams,
    vis: VisibleSet,
    cloud: LabeledCloud,
    particles: Particles,
    global_time,
):
    """Pass B: update weights/status/forget counters of visible particles.

    Returns the updated :class:`Particles`.
    """
    H, W = cfg.height, cfg.width
    half = cfg.neighbor_half
    side = 2 * half + 1

    ck_kappa = compute_ck_kappa(cfg, params, vis, cloud)

    real = vis.idx >= 0
    # Sigma at the particle's own pixel (semantic_dsp_map.h:1047).
    prs = jnp.clip(vis.row, 0, H - 1)
    pcs = jnp.clip(vis.col, 0, W - 1)
    sigma_p = cloud.sigma[prs, pcs]

    if not params.if_use_independent_filter:
        forget_f = forgetting_factor(
            vis.forget, params.forgetting_rate, params.max_forget_count
        )

    def body(off, carry):
        acc, right = carry
        dm, dn = _offsets(off, side, half)
        ti = vis.row + dm
        tj = vis.col + dn
        inb = real & (ti >= 0) & (ti < H) & (tj >= 0) & (tj < W)
        tis = jnp.clip(ti, 0, H - 1)
        tjs = jnp.clip(tj, 0, W - 1)

        obs_valid = cloud.valid[tis, tjs]
        obs_pos = cloud.pos[tis, tjs]
        obs_track = cloud.track[tis, tjs]
        ckk = ck_kappa[tis, tjs]

        gk_raw = gaussian_pdf3(vis.pos, obs_pos, sigma_p)
        mask = inb & obs_valid

        if params.if_use_independent_filter:
            mask &= obs_track == vis.track
            gk = gk_raw
        else:
            same = obs_track == vis.track
            right = right | (mask & same & (gk_raw > MIN_RIGHTLY_UPDATED_PDF))
            gk = jnp.where(same, gk_raw, gk_raw * params.id_transition_probability)
            gk = gk * forget_f

        acc = acc + jnp.where(mask, gk / ckk, 0.0)
        return acc, right

    P = vis.idx.shape[0]
    acc, right = jax.lax.fori_loop(
        0,
        side * side,
        body,
        (jnp.zeros(P, jnp.float32), jnp.zeros(P, bool)),
    )

    new_weight = vis.weight * (
        acc * params.detection_probability + 1.0 - params.detection_probability
    )
    if params.if_use_independent_filter:
        new_forget = vis.forget
    else:
        new_forget = jnp.where(
            right,
            0,
            jnp.where(
                vis.forget < FORGET_COUNT_INCREMENT_CAP, vis.forget + 1, vis.forget
            ),
        )

    # Scatter back into the dense particle SoA.  Padding entries get an
    # out-of-bounds positive index so mode="drop" discards them (negative
    # indices would WRAP in jnp scatters).
    total = particles.weight.size
    idx = jnp.where(real, vis.idx, total)
    flat_w = particles.weight.reshape(-1).at[idx].set(new_weight, mode="drop")
    flat_s = (
        particles.status.reshape(-1).at[idx].set(STATUS_UPDATED, mode="drop")
    )
    flat_t = particles.stamp.reshape(-1).at[idx].set(global_time, mode="drop")
    flat_f = particles.forget.reshape(-1).at[idx].set(new_forget, mode="drop")

    shape = particles.weight.shape
    return particles.replace(
        weight=flat_w.reshape(shape),
        status=flat_s.reshape(shape),
        stamp=flat_t.reshape(shape),
        forget=flat_f.reshape(shape),
    )
