"""Pallas TPU kernel for observe's dense candidate pass.

The XLA front of ops/observe.py (project every [V, K] slot, AND with the
alive mask, reduce to per-voxel / per-block activity) costs ~32 ms at
VKITTI2 scale: every op on the K=7-minor [V, K] view pays the tiled-layout
penalty, and XLA materializes several 58.7M-slot intermediates.  This kernel
does the whole pass in one sweep over [R, K*128] slot tiles (the layout of
ops/render_pallas.py): pinhole projection (operations.h:1267-1290) +
aliveness (operations.h:810-816) in registers, then per-voxel ANY via a 0/1
one-hot MXU matmul (exact at DEFAULT precision).

Outputs are per-voxel u8 masks; the per-block reduction for
blocks.select_blocks stays in XLA (a dense [nb, bv] any over u8).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MapConfig
from ..state import Particles, STATUS_INVALID
from . import codecs

_VOX_PER_ROW = 128
_ROWS = 128


def _expand_vox(vax_tile, K: int):
    """Voxel->slot broadcast of per-voxel i32 stamps IN-KERNEL via an exact
    HIGHEST one-hot matmul (stamps < 2^24 are f32-exact; the XLA-side
    jnp.repeat alternative is a V*K-element gather measured at ~14 ms/frame
    at VKITTI2 scale)."""
    R, G = vax_tile.shape
    L = G * K
    rows_e = jax.lax.broadcasted_iota(jnp.int32, (G, L), 0)
    cols_e = jax.lax.broadcasted_iota(jnp.int32, (G, L), 1)
    expand = (cols_e // K == rows_e).astype(jnp.float32)
    return jax.lax.dot_general(
        vax_tile.astype(jnp.float32), expand,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def front_pallas_supported(cfg: MapConfig) -> bool:
    return cfg.num_voxels % _VOX_PER_ROW == 0


def _kernel(
    pose_ref,                       # SMEM [1, 12]: r_cw row-major, t_cw
    px_ref, py_ref, pz_ref,         # VMEM [R, L] f32
    status_ref, stamp_ref,          # VMEM [R, L] u8 / i32
    vax_ref,                        # VMEM [R, G] i32 (per voxel)
    ha_ref, hc_ref,                 # VMEM out [R, G] u8
    *,
    K: int,
    fx: float, fy: float, cx0: float, cy0: float,
    h: int, w: int, dmin: float, dmax: float,
):
    R, L = px_ref.shape
    G = L // K

    x, y, z = px_ref[:], py_ref[:], pz_ref[:]
    st = status_ref[:].astype(jnp.int32)
    vax_s = _expand_vox(vax_ref[:], K)
    alive = (st != STATUS_INVALID) & (stamp_ref[:].astype(jnp.float32) >= vax_s)

    r00 = pose_ref[0, 0]; r01 = pose_ref[0, 1]; r02 = pose_ref[0, 2]
    r10 = pose_ref[0, 3]; r11 = pose_ref[0, 4]; r12 = pose_ref[0, 5]
    r20 = pose_ref[0, 6]; r21 = pose_ref[0, 7]; r22 = pose_ref[0, 8]
    t0 = pose_ref[0, 9]; t1 = pose_ref[0, 10]; t2 = pose_ref[0, 11]

    cxc = r00 * x + r01 * y + r02 * z + t0
    cyc = r10 * x + r11 * y + r12 * z + t1
    czc = r20 * x + r21 * y + r22 * z + t2
    in_depth = (czc >= dmin) & (czc <= dmax)
    zsafe = jnp.where(czc == 0.0, 1e-6, czc)
    u = fx * cxc / zsafe + cx0
    v = fy * cyc / zsafe + cy0
    col = u.astype(jnp.int32)
    row = v.astype(jnp.int32)
    in_image = (row >= 0) & (row < h) & (col >= 0) & (col < w)
    cand = in_depth & in_image & alive

    rows_s = jax.lax.broadcasted_iota(jnp.int32, (L, G), 0)
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (L, G), 1)
    gsum = (rows_s // K == cols_s).astype(jnp.float32)
    dot_d = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ha_ref[:] = (dot_d(alive.astype(jnp.float32), gsum) > 0.5).astype(jnp.uint8)
    hc_ref[:] = (dot_d(cand.astype(jnp.float32), gsum) > 0.5).astype(jnp.uint8)


def _movable_kernel(
    track_ref, status_ref, stamp_ref,            # VMEM [R, L]
    vax_ref,                                     # VMEM [R, G] i32
    hm_ref,                                      # VMEM out [R, G] u8
    *,
    K: int,
    max_movable: int,
):
    R, L = track_ref.shape
    G = L // K
    st = status_ref[:].astype(jnp.int32)
    trk = track_ref[:].astype(jnp.int32)
    vax_s = _expand_vox(vax_ref[:], K)
    alive = (st != STATUS_INVALID) & (stamp_ref[:].astype(jnp.float32) >= vax_s)
    movable = alive & (trk <= max_movable)

    rows_s = jax.lax.broadcasted_iota(jnp.int32, (L, G), 0)
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (L, G), 1)
    gsum = (rows_s // K == cols_s).astype(jnp.float32)
    dot_d = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    hm_ref[:] = (dot_d(movable.astype(jnp.float32), gsum) > 0.5).astype(
        jnp.uint8
    )


@partial(jax.jit, static_argnums=(0, 3, 4))
def movable_voxels(
    cfg: MapConfig,
    particles: Particles,
    scroll,
    max_movable: int,
    interpret: bool = False,
    vox_axis=None,
):
    """Per-voxel any(alive & track <= max_movable) as u8[V] — the dense scan
    of map._move_and_cleanup without [V, K]-minor layout penalties.

    Sizes derive from the particle arrays (slab-local under sharding, with
    the slab's ``vox_axis`` passed in)."""
    K = cfg.slots_per_voxel
    V = particles.px.shape[0] // K
    G = _VOX_PER_ROW
    L = K * G
    NB = (V * K) // L
    R = min(_ROWS, NB)

    vax = (
        codecs.axis_stamps_per_voxel(cfg, scroll)
        if vox_axis is None else vox_axis
    )

    resh = lambda a: a.reshape(NB, L)
    spec_s = pl.BlockSpec((R, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((R, G), lambda i: (i, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_movable_kernel, K=K, max_movable=max_movable)
    hm = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NB, G), jnp.uint8),
        grid=(NB // R,),
        in_specs=[spec_s] * 3 + [spec_v],
        out_specs=spec_v,
        interpret=interpret,
    )(
        resh(particles.track), resh(particles.status), resh(particles.stamp),
        vax.reshape(NB, G),
    )
    return hm.reshape(-1)


@partial(jax.jit, static_argnums=(0, 5))
def front_candidates(
    cfg: MapConfig,
    particles: Particles,
    scroll,
    r_cw: jax.Array,
    t_cw: jax.Array,
    interpret: bool = False,
    vox_axis=None,
):
    """Dense candidate pass: returns (has_alive u8[V], has_cand u8[V]).

    Sizes derive from the particle arrays (slab-local under sharding, with
    the slab's ``vox_axis`` passed in)."""
    K = cfg.slots_per_voxel
    V = particles.px.shape[0] // K
    G = _VOX_PER_ROW
    L = K * G
    NB = (V * K) // L
    R = min(_ROWS, NB)

    vax = (
        codecs.axis_stamps_per_voxel(cfg, scroll)
        if vox_axis is None else vox_axis
    )
    pose = jnp.concatenate([r_cw.reshape(-1), t_cw.reshape(-1)]).reshape(1, 12)

    resh = lambda a: a.reshape(NB, L)
    spec_s = pl.BlockSpec((R, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((R, G), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((1, 12), lambda i: (0, 0), memory_space=pltpu.SMEM)

    kernel = functools.partial(
        _kernel,
        K=K,
        fx=float(cfg.fx), fy=float(cfg.fy),
        cx0=float(cfg.cx), cy0=float(cfg.cy),
        h=int(cfg.height), w=int(cfg.width),
        dmin=float(cfg.depth_range_min), dmax=float(cfg.depth_range_max),
    )
    ha, hc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((NB, G), jnp.uint8),
            jax.ShapeDtypeStruct((NB, G), jnp.uint8),
        ),
        grid=(NB // R,),
        in_specs=[spec_p] + [spec_s] * 5 + [spec_v],
        out_specs=(spec_v, spec_v),
        interpret=interpret,
    )(
        pose, resh(particles.px), resh(particles.py), resh(particles.pz),
        resh(particles.status), resh(particles.stamp), vax.reshape(NB, G),
    )
    return ha.reshape(-1), hc.reshape(-1)
