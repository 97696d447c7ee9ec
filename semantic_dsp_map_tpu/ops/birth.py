"""Particle birth, slot-constrained insertion, and per-voxel resampling.

The reference inserts newborn particles point-by-point into the first vacant
slot of the target voxel, resampling a voxel (at most once per frame) when an
insertion finds it full (semantic_dsp_map.h:1148-1230, 1448-1519;
operations.h:782-803).  That retry loop is inherently serial; the TPU-native
reformulation is:

  1. resample every voxel that is targeted by at least one birth candidate
     this frame (the resampling decision only involves UPDATED particles, so
     it is independent of the interleaved insertions and can run first);
  2. rank all candidates per voxel by the reference's deterministic sweep
     order (the 3x3-interleaved pixel sweep, semantic_dsp_map.h:777-800) and
     scatter the top (vacancy) candidates of each voxel into its vacant slots
     in first-vacant order — exactly the slots the serial loop would fill.

The same insertion primitive serves newborn particles, rigid-moved particles
of dynamic objects (operations.h:321-362), and guessed/template births.
"""

from __future__ import annotations

from typing import NamedTuple

from functools import partial

import jax
import jax.numpy as jnp

from ..config import FilterParams, MapConfig, PARTICLE_OCC_INIT_WEIGHT
from ..state import (
    Particles,
    ScrollState,
    STATUS_INVALID,
    STATUS_REGULAR_BORN,
    STATUS_UPDATED,
)
from . import codecs
from .projection import LabeledCloud


class Candidates(NamedTuple):
    """A batch of particles to insert (padding rows have valid=False)."""

    pos: jax.Array      # f32[N, 3] global frame
    weight: jax.Array   # f32[N]
    label: jax.Array    # i32[N]
    track: jax.Array    # i32[N]
    status: jax.Array   # i32[N]
    stamp: jax.Array    # i32[N]
    forget: jax.Array   # i32[N]
    priority: jax.Array # i32[N] smaller = inserted earlier
    valid: jax.Array    # bool[N]


# ---------------------------------------------------------------------------
# Per-voxel systematic resampling
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=0)
def resample_voxels(cfg: MapConfig, particles: Particles, target: jax.Array) -> Particles:
    """resampleParticlesInVoxel (semantic_dsp_map.h:1448-1519) for every voxel
    in ``target`` (bool[V]) at once.

    Only UPDATED particles participate (the reference checks status alone,
    without the staleness test).  A voxel resamples iff more than half its
    total slot count (including the time slot: trigger = 2^n >> 1,
    semantic_dsp_map.h:1463) is UPDATED:
      - if their weight sum < 0.01, all UPDATED particles are wiped
        (:1466-1481);
      - else the serial keep/delete walk with threshold steps of
        weight_sum/trigger is applied in slot order (:1483-1513); kept
        particles get the equalized weight.
    """
    K = cfg.slots_per_voxel
    trigger = (1 << cfg.max_particle_num_per_voxel_n) >> 1

    updated = particles.status == STATUS_UPDATED
    # Sequential f32 accumulation in slot order, matching the reference's
    # ``weight_sum +=`` loop bit-for-bit (the final walked particle's
    # cumulative sum ties exactly with weight_sum, so rounding order decides
    # its keep/delete fate).
    wsum = jnp.zeros(cfg.num_voxels, jnp.float32)
    for k in range(K):
        wsum = wsum + jnp.where(updated[:, k], particles.weight[:, k], 0.0)
    count = jnp.sum(updated.astype(jnp.int32), axis=1)

    do_resample = target & (count > trigger)
    wipe = do_resample & (wsum < 0.01)
    walk = do_resample & ~wipe

    wpp = jnp.minimum(wsum / trigger, 1.0)

    # Serial keep/delete walk, unrolled over the (small, static) K slots.
    new_status = []
    new_weight = []
    csum = jnp.zeros(cfg.num_voxels, jnp.float32)
    thresh = wpp
    for k in range(K):
        upd_k = updated[:, k]
        w_k = particles.weight[:, k]
        csum_k = csum + jnp.where(upd_k, w_k, 0.0)
        delete = csum_k < thresh
        # Kept particle: weight -> wpp; the threshold advances by repeated
        # f32 additions of wpp until it is >= csum, reproducing the
        # reference's inner while loop exactly (semantic_dsp_map.h:1505-1510;
        # at most K updated particles fit, so K extra bumps suffice).
        thresh_kept = thresh + wpp
        for _ in range(K + 8):
            thresh_kept = jnp.where(csum_k > thresh_kept, thresh_kept + wpp, thresh_kept)
        active = walk & upd_k
        new_status.append(
            jnp.where(
                (wipe & upd_k) | (active & delete),
                STATUS_INVALID,
                particles.status[:, k],
            )
        )
        new_weight.append(
            jnp.where(active & ~delete, wpp, w_k)
        )
        csum = jnp.where(walk & upd_k, csum_k, csum)
        thresh = jnp.where(active & ~delete, thresh_kept, thresh)

    return particles.replace(
        status=jnp.stack(new_status, axis=1),
        weight=jnp.stack(new_weight, axis=1),
    )


# ---------------------------------------------------------------------------
# Capacity-constrained batched insertion
# ---------------------------------------------------------------------------

def _group_rank(sorted_voxel, n):
    """Rank of each element within its run of equal voxel ids (input sorted)."""
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones(1, bool), sorted_voxel[1:] != sorted_voxel[:-1]]
    )
    start_idx = jnp.where(is_start, idx, 0)
    group_start = jax.lax.associative_scan(jnp.maximum, start_idx)
    return idx - group_start


@partial(jax.jit, static_argnums=0)
def insert_particles(
    cfg: MapConfig,
    particles: Particles,
    scroll: ScrollState,
    cand: Candidates,
):
    """Insert candidates into first-vacant slots of their target voxels.

    Vacancy matches isParticleVacant (operations.h:810-816): INVALID status or
    a stamp older than the voxel column's wrap-out stamp.  Per voxel, the
    lowest-priority-first candidates fill vacant slots in ascending slot
    order; the rest are dropped — the batched equivalent of the serial
    addParticleByGlobalPos loop (operations.h:782-803).

    TPU shape: candidates are sorted by (voxel, priority), ranked within
    their voxel, scattered into a per-voxel staging buffer [V, K] with
    unique (voxel, rank) targets, and the staging buffer is merged into the
    vacant slots with K x K dense select passes — no per-candidate gathers
    of [V, K] rows (TPU gathers run at scalar rate).

    Returns (particles', accepted bool[N], target_voxel i32[N]).
    """
    K = cfg.slots_per_voxel
    N = cand.pos.shape[0]
    V = cfg.num_voxels

    vox, _, _, _, in_map = codecs.global_pos_to_voxel(cfg, scroll, cand.pos)
    valid = cand.valid & in_map
    vox = jnp.where(valid, vox, V)  # padding group at the end

    vox_axis_stamp = codecs.axis_stamps_per_voxel(cfg, scroll)
    alive = codecs.particle_alive(particles.status, particles.stamp, vox_axis_stamp)
    vacant = ~alive
    vacancy_count = jnp.sum(vacant.astype(jnp.int32), axis=1)
    # Rank of each vacant slot within its voxel (0 = first vacant).
    vacant_rank = jnp.cumsum(vacant.astype(jnp.int32), axis=1) - 1

    # Two stable sorts give ordering by (voxel, priority).
    order1 = jnp.argsort(cand.priority, stable=True)
    vox1 = vox[order1]
    order2 = jnp.argsort(vox1, stable=True)
    order = order1[order2]
    sv = vox[order]

    rank = _group_rank(sv, N)
    sv_safe = jnp.minimum(sv, V - 1)

    # Stage the first K candidates of each voxel: unique (voxel, rank)
    # scatter.  Fields are packed to keep the scatter count low:
    # meta = forget(3b) | status(3b) | label(8b) | track(16b).
    g = lambda a: a[order]
    stage_ok = (sv < V) & (rank < K)
    tv = jnp.where(stage_ok, sv, V)
    tr = jnp.clip(rank, 0, K - 1)

    meta = (
        (g(cand.forget) << 27)
        | (g(cand.status) << 24)
        | (g(cand.label) << 16)
        | g(cand.track)
    )

    def stage(fill, vals, dtype):
        base = jnp.full((V, K), fill, dtype)
        return base.at[tv, tr].set(vals.astype(dtype), mode="drop", unique_indices=True)

    cpos = g(cand.pos)
    in_px = stage(0.0, cpos[:, 0], jnp.float32)
    in_py = stage(0.0, cpos[:, 1], jnp.float32)
    in_pz = stage(0.0, cpos[:, 2], jnp.float32)
    in_w = stage(0.0, g(cand.weight), jnp.float32)
    in_stamp = stage(0, g(cand.stamp), jnp.int32)
    in_meta = stage(-1, meta, jnp.int32)  # -1 = no candidate staged

    # Dense merge: vacant slot s (vacant-rank r) takes staged candidate r.
    pos = particles.pos
    weight, label, track = particles.weight, particles.label, particles.track
    status, stamp, forget = particles.status, particles.stamp, particles.forget

    new_cols = {"weight": [], "label": [], "track": [], "status": [],
                "stamp": [], "forget": [], "px": [], "py": [], "pz": []}
    for s in range(K):
        vr_s = vacant_rank[:, s]
        take = jnp.zeros(V, bool)
        c_px = jnp.zeros(V, jnp.float32)
        c_py = jnp.zeros(V, jnp.float32)
        c_pz = jnp.zeros(V, jnp.float32)
        c_w = jnp.zeros(V, jnp.float32)
        c_st = jnp.zeros(V, jnp.int32)
        c_m = jnp.zeros(V, jnp.int32)
        for c in range(K):
            hit = vacant[:, s] & (vr_s == c) & (in_meta[:, c] >= 0)
            take = take | hit
            c_px = jnp.where(hit, in_px[:, c], c_px)
            c_py = jnp.where(hit, in_py[:, c], c_py)
            c_pz = jnp.where(hit, in_pz[:, c], c_pz)
            c_w = jnp.where(hit, in_w[:, c], c_w)
            c_st = jnp.where(hit, in_stamp[:, c], c_st)
            c_m = jnp.where(hit, in_meta[:, c], c_m)
        new_cols["px"].append(jnp.where(take, c_px, pos[0, :, s]))
        new_cols["py"].append(jnp.where(take, c_py, pos[1, :, s]))
        new_cols["pz"].append(jnp.where(take, c_pz, pos[2, :, s]))
        new_cols["weight"].append(jnp.where(take, c_w, weight[:, s]))
        new_cols["stamp"].append(jnp.where(take, c_st, stamp[:, s]))
        new_cols["track"].append(jnp.where(take, c_m & 0xFFFF, track[:, s]))
        new_cols["label"].append(jnp.where(take, (c_m >> 16) & 0xFF, label[:, s]))
        new_cols["status"].append(jnp.where(take, (c_m >> 24) & 0x7, status[:, s]))
        new_cols["forget"].append(jnp.where(take, (c_m >> 27) & 0x7, forget[:, s]))

    col = lambda k: jnp.stack(new_cols[k], axis=1)
    new = particles.replace(
        pos=jnp.stack([col("px"), col("py"), col("pz")], axis=0),
        weight=col("weight"),
        label=col("label"),
        track=col("track"),
        status=col("status"),
        stamp=col("stamp"),
        forget=col("forget"),
    )

    # Per-candidate accepted mask, back in candidate order.
    accepted_sorted = stage_ok & (rank < vacancy_count[sv_safe])
    accepted = jnp.zeros(N, bool).at[order].set(accepted_sorted)
    return new, accepted, vox


# ---------------------------------------------------------------------------
# Newborn candidates from the labeled cloud
# ---------------------------------------------------------------------------

def newborn_candidates(
    cfg: MapConfig,
    params: FilterParams,
    cloud: LabeledCloud,
    global_time,
    rng: jax.Array,
) -> Candidates:
    """Build the per-frame newborn candidate batch.

    One candidate per valid pixel (no-noise path, semantic_dsp_map.h:1148-1171)
    or nb_ptc_num_per_point jittered copies (noise path, :1177-1230; zero
    noise when nb == 1, :1183-1188).  Priority encodes the reference's
    3x3-interleaved sweep order (semantic_dsp_map.h:777-800).
    """
    H, W = cfg.height, cfg.width
    nb = params.nb_ptc_num_per_point if params.if_consider_depth_noise else 1

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    phase = (rows % 3) * 3 + cols % 3
    pixel_pri = (phase * H + rows) * W + cols

    pos = cloud.pos.reshape(-1, 3)
    valid = cloud.valid.reshape(-1)
    label = cloud.label.reshape(-1)
    track = cloud.track.reshape(-1)
    sigma = cloud.sigma.reshape(-1)
    pri = pixel_pri.reshape(-1)

    if nb > 1:
        pos = jnp.repeat(pos, nb, axis=0)
        valid = jnp.repeat(valid, nb)
        label = jnp.repeat(label, nb)
        track = jnp.repeat(track, nb)
        sigma = jnp.repeat(sigma, nb)
        pri = pri * nb + jnp.tile(jnp.arange(nb, dtype=jnp.int32), H * W)
        noise = jax.random.normal(rng, pos.shape, jnp.float32) * sigma[:, None]
        pos = pos + noise
    elif params.if_consider_depth_noise:
        pri = pri * nb

    n = pos.shape[0]
    return Candidates(
        pos=pos,
        weight=jnp.full(n, PARTICLE_OCC_INIT_WEIGHT, jnp.float32),
        label=label,
        track=track,
        status=jnp.full(n, STATUS_REGULAR_BORN, jnp.int32),
        stamp=jnp.full(n, global_time, jnp.int32),
        forget=jnp.zeros(n, jnp.int32),
        priority=pri,
        valid=valid,
    )


def birth_and_resample(
    cfg: MapConfig,
    params: FilterParams,
    particles: Particles,
    scroll: ScrollState,
    cloud: LabeledCloud,
    global_time,
    rng: jax.Array,
):
    """Resample birth-target voxels, then insert newborn particles.

    Returns (particles', accepted bool[N], candidates).
    """
    cand = newborn_candidates(cfg, params, cloud, global_time, rng)

    vox, _, _, _, in_map = codecs.global_pos_to_voxel(cfg, scroll, cand.pos)
    targeted = jnp.zeros(cfg.num_voxels, bool)
    targeted = targeted.at[jnp.where(cand.valid & in_map, vox, cfg.num_voxels)].set(
        True, mode="drop"
    )

    particles = resample_voxels(cfg, particles, targeted)
    particles, accepted, _ = insert_particles(cfg, particles, scroll, cand)
    return particles, accepted, cand
