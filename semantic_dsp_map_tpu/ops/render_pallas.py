"""Pallas TPU kernel for the occupancy render reduction (hot loop #4).

The XLA formulation in ops/render.py (calculateWeightAndSemanticsInVoxel +
determineIfVoxelOccupied, operations.h:390-448,606-639) lowers to many small
reduce/elementwise HLOs that each re-stream the 58.7M-slot particle state
from HBM; round-3 profiling put it at ~200 ms/frame at VKITTI2 scale,
latency- not bandwidth-bound.  This kernel does the whole reduction in one
pass: each grid step holds a [R, K*128] tile of the flat slot storage in
VMEM (rows = 128 whole voxels, so K = 2^n - 1 slot groups always align to
rows) and computes

  - pre-clamp weight sum, clamped guessed-weight sum,
  - the per-(voxel, track) weight argmax with lowest-track tie-break and the
    winning track's last-writer label,
  - the storage side effects (weight clamp, feeble-UPDATED GC),

using two in-VMEM primitives:

  * within-voxel circular lane rolls (``pltpu.roll`` pairs selected by lane
    phase) for the same-track pairwise sums and group max/min broadcasts —
    the proven-fast shape from ops/render.py's lane-shift formulation, now
    reading VMEM instead of HBM per step;
  * one-hot MXU matmuls for slot->voxel segment sums / lane-0 extraction and
    voxel->slot broadcast.  Extraction matmuls run at Precision.HIGHEST:
    the DEFAULT bf16 pass truncates the value operand (measured 2e-3 rel
    error), while the 3-way bf16 split recombines f32 values exactly when
    the other operand is a 0/1 matrix (verified exact on hardware,
    benchmarks/probe_mosaic.py).

The alive/voxel-valid masks against the scroll stamps are computed by one
fused XLA prepass (flat ``jnp.repeat`` broadcast — the proven layout-safe
pattern) so the kernel never touches the i32 stamp plane.

Semantics are identical to ops/render.py (the tested oracle); equality is
asserted by tests/test_render_pallas.py in interpret mode and by
benchmarks/check_render_pallas.py on hardware.  Weight sums may differ from
the XLA reduction by float association only (MXU accumulation order).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MapConfig, PARTICLE_OCC_INIT_WEIGHT
from ..state import (
    MapState,
    STATUS_GUESSED_BORN,
    STATUS_INVALID,
    STATUS_UPDATED,
)
from . import codecs
from .render import RenderResult

#: Voxels per slot-tile row; rows are K * 128 lanes holding whole voxels.
_VOX_PER_ROW = 128

#: Sublane rows per grid step.
_ROWS = 128


def render_pallas_supported(cfg: MapConfig) -> bool:
    return cfg.num_voxels % _VOX_PER_ROW == 0 and cfg.slots_per_voxel >= 1


def _kernel(
    weight_ref, stamp_ref, status_ref, track_ref, label_ref,
    vax_ref, vst_ref,
    nw_ref, ns_ref, occ_ref, lab_ref, trk_ref, ws_ref,
    *,
    K: int,
    thr: float,
):
    R, L = weight_ref.shape
    G = L // K

    w = weight_ref[:]
    # u8 loads upcast immediately: Mosaic rejects i8 vector comparisons.
    st = status_ref[:].astype(jnp.int32)
    trk = track_ref[:].astype(jnp.int32)
    lab = label_ref[:].astype(jnp.int32)
    # Stamps are frame counters (< 2^24), exact in f32.
    stamp_f = stamp_ref[:].astype(jnp.float32)
    vax_v = vax_ref[:].astype(jnp.float32)                   # [R, G]
    vst_v = vst_ref[:].astype(jnp.float32)

    dot_d = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    dot_h = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # One-hot maps between the slot row [*, L] and voxel row [*, G] domains.
    rows_s = jax.lax.broadcasted_iota(jnp.int32, (L, G), 0)
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (L, G), 1)
    gsum = (rows_s // K == cols_s).astype(jnp.float32)       # segment sum
    first = gsum * (rows_s % K == 0).astype(jnp.float32)     # pick slot 0
    rows_e = jax.lax.broadcasted_iota(jnp.int32, (G, L), 0)
    cols_e = jax.lax.broadcasted_iota(jnp.int32, (G, L), 1)
    expand = (cols_e // K == rows_e).astype(jnp.float32)     # voxel -> slots

    # Voxel->slot broadcast of the scroll stamps IN-KERNEL via an exact
    # HIGHEST one-hot matmul: the XLA-side jnp.repeat(vax, K) alternative is
    # a 58.7M-element gather measured at ~14 ms/frame.
    vax_s = dot_h(vax_v, expand)                             # [R, L]
    alive = (st != STATUS_INVALID) & (stamp_f >= vax_s)
    vvalid_v = (vst_v != 0.0) & (vst_v >= vax_v)
    vvalid_s = dot_d(vvalid_v.astype(jnp.float32), expand) > 0.5

    # weight_sum accumulates the *pre-clamp* weights (operations.h:414).
    ws_v = dot_h(jnp.where(alive, w, 0.0), gsum)             # [R, G]
    w_c = jnp.minimum(w, 1.0)
    guessed = alive & (st == STATUS_GUESSED_BORN)
    gc = alive & (st == STATUS_UPDATED) & (w_c < PARTICLE_OCC_INIT_WEIGHT)
    gw_v = dot_h(jnp.where(guessed, w_c, 0.0), gsum)

    contrib_mask = alive & ~gc
    contrib = jnp.where(contrib_mask, w_c, 0.0)

    d_lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1) % K

    def groll(x, s):
        """Within-voxel circular shift: lane with phase d reads phase
        (d + s) mod K of its own voxel.  Row-edge wraps of the two full-row
        rolls are never selected (rows hold whole voxels)."""
        a = pltpu.roll(x, L - s, axis=1)      # x[j + s]
        b = pltpu.roll(x, K - s, axis=1)      # x[j - (K - s)]
        return jnp.where(d_lane < K - s, a, b)

    # Per-slot same-track sum over the voxel's K slots (pairwise offsets,
    # same order as the XLA lane-shift formulation).
    trk_sum = contrib
    for s in range(1, K):
        t_n = groll(trk, s)
        c_n = groll(contrib, s)
        trk_sum = trk_sum + jnp.where(trk == t_n, c_n, 0.0)

    def greduce(x, op):
        """All-lanes group reduction for an IDEMPOTENT op (max/min): each
        doubling step widens the circular window; the final window of size
        2^ceil(log2 K) >= K over-covers the group, which idempotent ops
        absorb (K = 2^n - 1 here, not a power of two)."""
        s = 1
        while s < K:
            x = op(x, groll(x, s))
            s *= 2
        return x

    # Argmax by (track weight, then lowest track id), restricted to
    # contributing slots with positive summed weight (operations.h:440-447).
    score_ok = contrib_mask & (trk_sum > 0.0)
    bw = greduce(jnp.where(score_ok, trk_sum, -1.0), jnp.maximum)
    is_best = score_ok & (trk_sum == bw)
    bt = greduce(jnp.where(is_best, trk, jnp.int32(1 << 30)), jnp.minimum)
    # Label of the winning track = last contributing writer's label
    # (operations.h:435): encode (slot << 8 | label) and max-reduce.
    match = contrib_mask & (trk == bt)
    pk = greduce(jnp.where(match, (d_lane << 8) | (lab & 0xFF), -1), jnp.maximum)

    # Lane-0 extraction (all lanes of a group hold the group result; track
    # ids <= 2^30 and packed labels <= 2047 are f32-exact).
    ext = lambda x: dot_h(x, first)
    bt_v = ext(bt.astype(jnp.float32)).astype(jnp.int32)
    pk_v = ext(pk.astype(jnp.float32)).astype(jnp.int32)
    found_v = ext(bw) > 0.0

    best_label = jnp.where(pk_v >= 0, pk_v & 0xFF, 0)
    best_track = jnp.where(found_v, bt_v, 0)
    best_label = jnp.where(found_v, best_label, 0)

    ws_out = jnp.where(vvalid_v, ws_v, -1.0)
    gw_out = jnp.where(vvalid_v, gw_v, 0.0)
    best_track = jnp.where(vvalid_v, best_track, 0)
    best_label = jnp.where(vvalid_v, best_label, 0)

    occ = jnp.where(
        ws_out > thr,
        1,
        jnp.where(
            ws_out < 0,
            -1,
            jnp.where(gw_out >= PARTICLE_OCC_INIT_WEIGHT, 2, 0),
        ),
    )

    # Side effects: clamp stored weights, GC feeble UPDATED particles — only
    # in valid voxels (operations.h:401-407).
    touched = alive & vvalid_s
    nw_ref[:] = jnp.where(touched, w_c, w)
    ns_ref[:] = jnp.where(gc & vvalid_s, jnp.zeros_like(st), st).astype(
        ns_ref.dtype
    )
    occ_ref[:] = occ.astype(jnp.int32)
    lab_ref[:] = best_label.astype(jnp.int32)
    trk_ref[:] = best_track.astype(jnp.int32)
    ws_ref[:] = ws_out


@partial(jax.jit, static_argnums=(0, 2, 3))
def render_occupancy_pallas(
    cfg: MapConfig,
    state: MapState,
    occupancy_threshold: float,
    interpret: bool = False,
):
    """Drop-in Pallas replacement for ops.render.render_occupancy.

    Returns (particles_after_gc, RenderResult)."""
    vax = codecs.axis_stamps_per_voxel(cfg, state.scroll)    # i32[V]
    return render_core_pallas(
        cfg, state.particles, state.voxel_stamp, vax,
        occupancy_threshold, interpret,
    )


def render_core_pallas(
    cfg: MapConfig,
    p,
    voxel_stamp: jax.Array,
    vax: jax.Array,
    occupancy_threshold: float,
    interpret: bool = False,
):
    """Size-agnostic kernel wrapper (full grid or a voxel slab)."""
    K = cfg.slots_per_voxel
    V = voxel_stamp.shape[0]
    N = V * K
    G = _VOX_PER_ROW
    L = K * G
    NB = N // L
    R = min(_ROWS, NB)

    resh = lambda a: a.reshape(NB, L)
    reshv = lambda a: a.reshape(NB, G)

    spec_s = pl.BlockSpec((R, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((R, G), lambda i: (i, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, K=K, thr=float(occupancy_threshold))
    nw, ns, occ, lab, trk, ws = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((NB, L), jnp.float32),
            jax.ShapeDtypeStruct((NB, L), p.status.dtype),
            jax.ShapeDtypeStruct((NB, G), jnp.int32),
            jax.ShapeDtypeStruct((NB, G), jnp.int32),
            jax.ShapeDtypeStruct((NB, G), jnp.int32),
            jax.ShapeDtypeStruct((NB, G), jnp.float32),
        ),
        grid=(NB // R,),
        in_specs=[spec_s] * 5 + [spec_v] * 2,
        out_specs=(spec_s, spec_s, spec_v, spec_v, spec_v, spec_v),
        interpret=interpret,
    )(
        resh(p.weight), resh(p.stamp), resh(p.status), resh(p.track),
        resh(p.label), reshv(vax), reshv(voxel_stamp),
    )

    particles = p.replace(weight=nw.reshape(-1), status=ns.reshape(-1))
    return particles, RenderResult(
        occ=occ.reshape(-1),
        label=lab.reshape(-1),
        track=trk.reshape(-1),
        weight_sum=ws.reshape(-1),
    )
