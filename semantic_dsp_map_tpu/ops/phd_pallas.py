"""Pallas TPU kernels for the PHD stencil passes (hot loop #3).

The XLA formulation in ops/phd.py re-streams the [S, H, W] particle table
(pass A) / observation grids (pass B) from HBM once per neighborhood offset —
(2R+1)^2 = 49 (ZED2) or 121 (VKITTI2) full passes per frame.  These kernels
hold one (TH, TW) output tile's inputs (plus the R-pixel halo) in VMEM and
run every offset from there, cutting HBM traffic by ~the offset count and
turning the stencil compute-bound.

Layout: all per-slot planes are stacked on a leading "plane" axis so each
tile is ONE contiguous-ish DMA: pass A tables are [5*S, Hp, Wp]
(px, py, pz, w_eff, track-as-f32), pass B observation grids are [6, Hp, Wp]
(ox, oy, oz, valid, track, ck_kappa).  Track ids (< 65536) are exact in f32.

Slot-plane skipping (round 5): the pixel table is front-filled and only
~1-9 % occupied at VKITTI2 scale (PROFILE_r04.md), so most slot planes of
most tiles are entirely empty and their (2R+1)^2-offset loops multiply
zeros.  Both kernels therefore process slots in groups of ``_GS`` planes and
predicate each group's whole offset loop on a per-tile liveness reduction:

  - pass A skips a group iff every w_eff in the group's (halo-included) tile
    is zero — exactly lossless, every skipped contribution is ``w_eff * gk``;
  - pass B skips a group iff every slot in the group's tile is EMPTY
    (track sentinel -2).  Occupancy, not ``ff_eff``, is the test: a fully
    forgotten particle (ff == 0) contributes nothing to ``acc`` but must
    still compute ``right`` so a new same-track observation can revive it
    (semantic_dsp_map.h:1091-1096).

The skip changes only the f32 accumulation order (group-major instead of
slot-major), bounded well inside the 2e-5 rtol the equality tests assert.

Reference semantics are identical to ops/phd.py (semantic_dsp_map.h:960-1121);
equality is asserted by tests/test_phd_pallas.py in interpret mode and by the
TPU-vs-XLA check in benchmarks/check_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import (
    FilterParams,
    GAUSSIAN_PDF_COEF,
    GAUSSIAN_PDF_Z_CLIP,
    MIN_RIGHTLY_UPDATED_PDF,
    MapConfig,
)

_COEF3 = GAUSSIAN_PDF_COEF ** 3

# Output tile shapes.  TH*TW lanes per vector op; TW a lane multiple keeps
# the boundary shifts cheap.  Tuned per pass on hardware (round-4 sweep at
# VKITTI2 shape): pass A amortizes its table DMA best at TH=24 (18.1 ->
# 11.9 ms; TH=32 exceeds the VMEM budget), pass B is fastest at the small
# tile (more buffers live per tile).
_TH_A = 24
_TH_B = 8
_TW = 256

#: Slot planes per liveness-predicated group.  Front-filling concentrates
#: occupancy in the low planes, so groups of 4 capture most of the skip
#: while keeping the unrolled instruction count at S/4 x (2R+1)^2 blocks.
_GS = 4


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, m: int) -> int:
    return _cdiv(a, m) * m


def _pad_to(a, h: int, w: int, fill):
    """Pad the trailing two dims of ``a`` up to (h, w) with ``fill``."""
    ph = h - a.shape[-2]
    pw = w - a.shape[-1]
    cfgpad = [(0, 0)] * (a.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(a, cfgpad, constant_values=fill)


# ---------------------------------------------------------------------------
# Pass A: per-pixel normalizer ck
# ---------------------------------------------------------------------------


def _pass_a_kernel(
    tab_hbm,      # ANY [5*S, HT+2R, WT+2R] stacked padded tables
    obs_ref,      # VMEM [5, TH, TW] (ox, oy, oz, inv_sigma, otrk)
    ck_ref,       # VMEM out [TH, TW]
    tab_vmem,     # scratch VMEM [5*S, TH+2R, TW+2R]
    sem,          # DMA semaphore
    *,
    S: int,
    R: int,
    th: int,
    tw: int,
    id_p: float,
    independent: bool,
    gs: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    side = 2 * R + 1

    sh = _round_up(th + 2 * R, 8)
    sw = _round_up(tw + 2 * R, 128)
    dma = pltpu.make_async_copy(
        tab_hbm.at[:, pl.ds(i * th, sh), pl.ds(j * tw, sw)],
        tab_vmem,
        sem,
    )
    dma.start()

    ox = obs_ref[0][None]
    oy = obs_ref[1][None]
    oz = obs_ref[2][None]
    inv_sig = obs_ref[3][None]
    otrk = obs_ref[4][None]

    dma.wait()

    ck_ref[:] = jnp.zeros((th, tw), jnp.float32)

    for g0 in range(0, S, gs):
        ge = min(S, g0 + gs)
        # Liveness over the halo-included tile: w_eff >= 0 and zero-weight
        # entries contribute exactly zero, so an all-zero group is lossless
        # to skip.
        live = jnp.max(tab_vmem[3 * S + g0 : 3 * S + ge]) > 0.0

        @pl.when(live)
        def _():
            # Static double loop: Mosaic requires slice offsets it can prove
            # aligned or fully static (dynamic sublane offsets reject with
            # "cannot statically prove index is a multiple of 8"), so every
            # (dm, dn) is unrolled.
            ck = jnp.zeros((th, tw), jnp.float32)
            for dm in range(side):
                for dn in range(side):
                    win = lambda p: tab_vmem[
                        p * S + g0 : p * S + ge, dm : dm + th, dn : dn + tw
                    ]
                    zx = (win(0) - ox) * inv_sig
                    zy = (win(1) - oy) * inv_sig
                    zz = (win(2) - oz) * inv_sig
                    s2 = zx * zx + zy * zy + zz * zz
                    amax = jnp.maximum(
                        jnp.maximum(jnp.abs(zx), jnp.abs(zy)), jnp.abs(zz)
                    )
                    gk = jnp.where(
                        amax > GAUSSIAN_PDF_Z_CLIP, 0.0, _COEF3 * jnp.exp(-0.5 * s2)
                    )
                    wtrk = win(4)
                    weff = win(3)
                    if independent:
                        contrib = jnp.where(wtrk == otrk, weff * gk, 0.0)
                    else:
                        gk = jnp.where(wtrk != otrk, gk * id_p, gk)
                        contrib = weff * gk
                    ck = ck + jnp.sum(contrib, axis=0)
            ck_ref[:] += ck


def pass_a_pallas(
    cfg: MapConfig,
    params: FilterParams,
    px, py, pz, weff, trk,     # [S, H, W] table planes (weff = w * forgetting)
    obs_x, obs_y, obs_z, inv_sigma, obs_trk,  # [H, W]
    interpret: bool = False,
    th: int = _TH_A,
    tw: int = _TW,
):
    """Raw per-pixel ck (before the valid mask / P_d / kappa), f32[H, W].
    H/W derive from the table (may be an image-row slab with halo)."""
    S, H, W = px.shape
    R = cfg.neighbor_half
    HT = _cdiv(H, th) * th
    WT = _cdiv(W, tw) * tw

    tab = jnp.stack(
        [px, py, pz, weff, trk.astype(jnp.float32)], axis=0
    ).reshape(5 * S, H, W)
    # Halo + tile-multiple padding, all zeros: the zero weight plane kills
    # any halo/pad contribution regardless of the other planes' pad values.
    sh = _round_up(th + 2 * R, 8)
    sw = _round_up(tw + 2 * R, 128)
    Hp = HT - th + sh
    Wp = WT - tw + sw
    tab = jnp.pad(
        tab, [(0, 0), (R, Hp - H - R), (R, Wp - W - R)], constant_values=0.0
    )
    obs = jnp.stack(
        [obs_x, obs_y, obs_z, inv_sigma, obs_trk.astype(jnp.float32)], axis=0
    )
    obs = _pad_to(obs, HT, WT, 0.0)

    grid = (HT // th, WT // tw)
    kernel = functools.partial(
        _pass_a_kernel,
        S=S,
        R=R,
        th=th,
        tw=tw,
        id_p=float(params.id_transition_probability),
        independent=bool(params.if_use_independent_filter),
        gs=min(_GS, S),
    )
    ck = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((HT, WT), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((5, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((5 * S, sh, sw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(tab, obs)
    return ck[:H, :W]


# ---------------------------------------------------------------------------
# Pass B: per-table-entry accumulation
# ---------------------------------------------------------------------------


def _pass_b_kernel(
    obs_hbm,      # ANY [6, HT+2R, WT+2R]: ox, oy, oz, ov, otrk, ck_kappa
    tab_ref,      # VMEM [5, S, TH, TW]: px, py, pz, trk_eff, ff_eff
    sig_ref,      # VMEM [1, TH, TW]: inv sigma at the particle's pixel
    acc_ref,      # VMEM out [S, TH, TW]
    right_ref,    # VMEM out [S, TH, TW] (0/1 f32)
    obs_vmem,     # scratch VMEM [6, TH+2R, TW+2R]
    sem,
    *,
    S: int,
    R: int,
    th: int,
    tw: int,
    id_p: float,
    independent: bool,
    gs: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    side = 2 * R + 1

    sh = _round_up(th + 2 * R, 8)
    sw = _round_up(tw + 2 * R, 128)
    dma = pltpu.make_async_copy(
        obs_hbm.at[:, pl.ds(i * th, sh), pl.ds(j * tw, sw)],
        obs_vmem,
        sem,
    )
    dma.start()

    inv_sig = sig_ref[0][None]

    dma.wait()

    acc_ref[:] = jnp.zeros((S, th, tw), jnp.float32)
    right_ref[:] = jnp.zeros((S, th, tw), jnp.float32)

    for g0 in range(0, S, gs):
        ge = min(S, g0 + gs)
        # Liveness = any OCCUPIED slot in the group's tile (empty slots carry
        # the -2 track sentinel; the tab padding uses -2 too).  ff_eff would
        # over-skip: occupied-but-fully-forgotten entries have ff == 0 yet
        # must still compute ``right`` to be revivable.
        live = jnp.max(tab_ref[3, g0:ge]) > -1.5

        @pl.when(live)
        def _():
            ppx = tab_ref[0, g0:ge]
            ppy = tab_ref[1, g0:ge]
            ppz = tab_ref[2, g0:ge]
            ptrk = tab_ref[3, g0:ge]
            pff = tab_ref[4, g0:ge]

            acc = jnp.zeros((ge - g0, th, tw), jnp.float32)
            right = jnp.zeros((ge - g0, th, tw), jnp.float32)
            for dm in range(side):
                band = obs_vmem[:, dm : dm + th, :]         # [6, th, tw+2R]
                for dn in range(side):
                    w6 = band[:, :, dn : dn + tw]            # [6, th, tw]
                    zx = (ppx - w6[0][None]) * inv_sig
                    zy = (ppy - w6[1][None]) * inv_sig
                    zz = (ppz - w6[2][None]) * inv_sig
                    s2 = zx * zx + zy * zy + zz * zz
                    amax = jnp.maximum(
                        jnp.maximum(jnp.abs(zx), jnp.abs(zy)), jnp.abs(zz)
                    )
                    gk_raw = jnp.where(
                        amax > GAUSSIAN_PDF_Z_CLIP, 0.0, _COEF3 * jnp.exp(-0.5 * s2)
                    )
                    ov = w6[3][None]
                    otrk = w6[4][None]
                    ckk = w6[5][None]
                    same = ptrk == otrk
                    if independent:
                        gk = jnp.where(same, gk_raw, 0.0) * pff * ov
                    else:
                        right = jnp.maximum(
                            right,
                            jnp.where(
                                same & (gk_raw > MIN_RIGHTLY_UPDATED_PDF), ov, 0.0
                            ),
                        )
                        gk = jnp.where(same, gk_raw, gk_raw * id_p) * pff * ov
                    acc = acc + gk / ckk
            acc_ref[g0:ge] = acc
            right_ref[g0:ge] = right


def pass_b_pallas(
    cfg: MapConfig,
    params: FilterParams,
    px, py, pz,            # [S, H, W] particle positions
    trk_eff,               # [S, H, W] i32: track id, or -2 where slot empty
    ff_eff,                # [S, H, W] f32: forgetting factor, 0 where empty
    inv_sigma_p,           # [H, W] f32: 1/sigma at the particle's own pixel
    obs_x, obs_y, obs_z,   # [H, W]
    obs_valid,             # bool[H, W]
    obs_trk,               # i32[H, W]
    ck_kappa,              # f32[H, W]
    interpret: bool = False,
    th: int = _TH_B,
    tw: int = _TW,
):
    """Returns (acc, right) as f32[S, H, W] (right is a 0/1 indicator).
    H/W derive from the table (may be an image-row slab with halo)."""
    S, H, W = px.shape
    R = cfg.neighbor_half
    HT = _cdiv(H, th) * th
    WT = _cdiv(W, tw) * tw

    obs = jnp.stack(
        [
            obs_x,
            obs_y,
            obs_z,
            obs_valid.astype(jnp.float32),
            obs_trk.astype(jnp.float32),
            ck_kappa,
        ],
        axis=0,
    )
    # Padding: valid=0 kills contributions; ck_kappa pad=1 avoids div-by-0;
    # track pad=-1 (cannot equal trk_eff's -2 empty sentinel).
    sh = _round_up(th + 2 * R, 8)
    sw = _round_up(tw + 2 * R, 128)
    Hp = HT - th + sh
    Wp = WT - tw + sw
    pads = jnp.array([0.0, 0.0, 0.0, 0.0, -1.0, 1.0], jnp.float32)
    padcfg = [(0, 0), (R, Hp - H - R), (R, Wp - W - R)]
    obs = jnp.pad(obs, padcfg) + (
        jnp.pad(jnp.zeros((6, H, W), jnp.float32), padcfg, constant_values=1.0)
        * pads[:, None, None]
    )

    # Tile padding of the table: the track plane pads with the EMPTY sentinel
    # so all-padding groups read as dead (liveness) rather than as track 0.
    tab = jnp.stack(
        [
            _pad_to(px, HT, WT, 0.0),
            _pad_to(py, HT, WT, 0.0),
            _pad_to(pz, HT, WT, 0.0),
            _pad_to(trk_eff.astype(jnp.float32), HT, WT, -2.0),
            _pad_to(ff_eff, HT, WT, 0.0),
        ],
        axis=0,
    )
    sig = _pad_to(inv_sigma_p[None], HT, WT, 1.0)

    grid = (HT // th, WT // tw)
    kernel = functools.partial(
        _pass_b_kernel,
        S=S,
        R=R,
        th=th,
        tw=tw,
        id_p=float(params.id_transition_probability),
        independent=bool(params.if_use_independent_filter),
        gs=min(_GS, S),
    )
    acc, right = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((S, HT, WT), jnp.float32),
            jax.ShapeDtypeStruct((S, HT, WT), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((5, S, th, tw), lambda i, j: (0, 0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((S, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((6, sh, sw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(obs, tab, sig)
    return acc[:, :H, :W], right[:, :H, :W]
