"""Template-matching frame stage (flag ``if_use_template_matching``).

Orchestrates the two template paths of the reference frame kernel:

  1. **Rematch** (semantic_dsp_map.h:616-669): objects flagged
     ``to_match_with_previous`` get their particles re-aligned to the observed
     object cloud (alignPointCloudToSource = center + non-FS PHD sweep); on a
     good match the old particles are deleted and the aligned cloud re-added
     at weight 0.2 (operations.h:125-146).
  2. **Template birth** (semantic_dsp_map.h:806-894): newly-observed Cars with
     1500..8000 observed points and a >=1 m bbox are matched against the CAD
     template bank (FS-considered sweep, best template wins); on a good match,
     3 noise-jittered GUESSED_BORN particles are added per template point.

The per-hypothesis sweep is one jitted program (ops.templates.template_match);
the orchestration below is host-side because the eligible-object count is
O(1) per frame and data-dependent.  Sequencing (reference order, restored in
round 4): the frame step is built as (stage1, stage2, render) —
map.build_frame_step(split_template=True).  ``rematch`` runs between stage1
(object update + labeled cloud + scroll/expiry) and stage2 (rigid moves +
PHD + birth), i.e. inside the PREDICTION phase exactly like the reference
(semantic_dsp_map.h:616-669), so re-matched particles participate in the PHD
update the same frame.  ``template_birth`` runs after stage2 and before
render, matching the reference's placement (:806-894).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import FilterParams, MapConfig, PARTICLE_OCC_INIT_WEIGHT
from .labels import LabelRegistry
from .ops.birth import Candidates, insert_particles
from .ops import codecs
from .ops.templates import (
    GUESSED_BIRTH_COPIES,
    GUESSED_BIRTH_NOISE,
    MATCHED_WEIGHT,
    MatchGridConfig,
    TM_MIN_BBOX_XY,
    TM_MIN_POINTS,
    TM_MAX_POINTS,
    REMATCH_MIN_POINTS,
    TemplateBank,
    template_match,
)
from .state import MapState, STATUS_GUESSED_BORN, STATUS_INVALID, particles_vk


def _compact_by_sort(mask_flat, xs, ys, zs, n_max: int):
    """Stable compaction of masked points into a fixed buffer via one
    multi-operand sort (the PROFILE_r02.md pattern: never jnp.nonzero on a
    big domain).  Selected points keep ascending source order, matching what
    nonzero would have produced."""
    key = (~mask_flat).astype(jnp.int32)
    ks, sx, sy, sz = jax.lax.sort((key, xs, ys, zs), num_keys=1)
    ok = ks[:n_max] == 0
    pts = jnp.stack([sx[:n_max], sy[:n_max], sz[:n_max]], axis=-1)
    return jnp.where(ok[:, None], pts, 0.0), ok


@partial(jax.jit, static_argnums=(0, 1))
def _extract_track_points(cfg: MapConfig, n_max: int, cloud_pos, cloud_track, cloud_valid, tid):
    """Compact the labeled-cloud points of one track id into a fixed buffer.

    The reference gathers mask pixels without checking point validity
    (semantic_dsp_map.h:625-638 takes every mask pixel's labeled point);
    we keep only valid points — strictly less noise fed to the matcher.
    Returns (pts f32[n_max, 3], valid bool[n_max], count i32).
    """
    m = ((cloud_track == tid) & cloud_valid).reshape(-1)
    pts, ok = _compact_by_sort(
        m,
        cloud_pos[..., 0].reshape(-1),
        cloud_pos[..., 1].reshape(-1),
        cloud_pos[..., 2].reshape(-1),
        n_max,
    )
    return pts, ok, jnp.sum(m.astype(jnp.int32))


@partial(jax.jit, static_argnums=(0, 1))
def _extract_particle_points(cfg: MapConfig, n_max: int, state: MapState, tid, weight_threshold):
    """getParticlesAsPointCloud (operations.h:242-255) for one track id:
    alive particles with weight > threshold.

    Block-compacted (ops/blocks.py): the [V, K] domain is reduced to the
    blocks that contain matching particles before any per-element work —
    jnp.nonzero at [V, K] costs ~0.5 s at VKITTI2 scale (PROFILE_r02.md)."""
    from .ops.blocks import (
        block_layout, gather_rows_flat, mask_to_block_mask, row_valid,
        select_blocks,
    )

    flat = state.particles
    p = particles_vk(cfg, flat)
    vox_axis = codecs.axis_stamps_per_voxel(cfg, state.scroll)
    alive = codecs.particle_alive(p.status, p.stamp, vox_axis)
    m = alive & (p.track == tid) & (p.weight > weight_threshold)

    bv, nb, spb = block_layout(cfg)
    A = min(cfg.max_moving_blocks, nb)
    K = cfg.slots_per_voxel
    blocks = select_blocks(mask_to_block_mask(m, bv), A)
    rv = row_valid(blocks)
    bm = (gather_rows_flat(m.reshape(-1), blocks, bv * K) & rv[:, None]).reshape(-1)
    bx = gather_rows_flat(flat.px, blocks, bv * K).reshape(-1)
    by = gather_rows_flat(flat.py, blocks, bv * K).reshape(-1)
    bz = gather_rows_flat(flat.pz, blocks, bv * K).reshape(-1)
    pts, ok = _compact_by_sort(bm, bx, by, bz, min(n_max, A * spb))
    if pts.shape[0] < n_max:
        pad = n_max - pts.shape[0]
        pts = jnp.pad(pts, ((0, pad), (0, 0)))
        ok = jnp.pad(ok, (0, pad))
    return pts, ok, jnp.sum(m.astype(jnp.int32))


@partial(jax.jit, static_argnums=0, donate_argnums=1)
def _delete_track_particles(cfg: MapConfig, state: MapState, tid):
    """deleteParticlesInSet over an object's particle set
    (semantic_dsp_map.h:659, operations.h:216-224): every slot carrying the
    track id is invalidated (the hash-map index is the track predicate here,
    see state.py docstring)."""
    p = state.particles
    status = jnp.where(p.track == tid, STATUS_INVALID, p.status)
    return state.replace(particles=p.replace(status=status))


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=2)
def _insert_cloud(cfg: MapConfig, n_pts: int, state: MapState, pts, valid, weight, label, tid):
    """Insert a matched/guessed cloud as GUESSED_BORN particles at a fixed
    weight (addMatchedParticles operations.h:125-146 / addGuessedParticles
    operations.h:192-205)."""
    n = pts.shape[0]
    cand = Candidates(
        pos=pts,
        weight=jnp.full(n, weight, jnp.float32),
        label=jnp.full(n, label, jnp.int32),
        track=jnp.full(n, tid, jnp.int32),
        status=jnp.full(n, STATUS_GUESSED_BORN, jnp.int32),
        stamp=jnp.full(n, 1, jnp.int32) * state.global_time,
        forget=jnp.zeros(n, jnp.int32),
        priority=jnp.arange(n, dtype=jnp.int32),
        valid=valid,
    )
    particles, accepted, _ = insert_particles(cfg, state.particles, state.scroll, cand)
    return state.replace(particles=particles), jnp.sum(accepted.astype(jnp.int32))


class TemplateEngine:
    """Per-frame template-matching stage over a :class:`TemplateBank`."""

    def __init__(
        self,
        cfg: MapConfig,
        params: FilterParams,
        registry: LabelRegistry,
        bank: Optional[TemplateBank] = None,
        grid: Optional[MatchGridConfig] = None,
    ):
        self.cfg = cfg
        self.params = params
        self.registry = registry
        self.grid = grid or MatchGridConfig()
        self.bank = bank
        self.car_label = registry.label_to_id.get("Car", -1)
        self._rng = np.random.RandomState(0)

    def set_template_path(self, folder: str) -> int:
        """setTemplatePath (semantic_dsp_map.h:163-166)."""
        self.bank = TemplateBank.from_folder(folder, self.grid)
        return int(self.bank.label.size)

    # ------------------------------------------------------------------
    # ``gate`` is the i32[O, 8] eligibility array from the frame step's
    # stage1 (map.template_gate): columns [valid, rematch_ok, birth_ok,
    # track_id, label, cloud_point_count, bbox_extent_x_mm, bbox_extent_y_mm]
    # (the two mm columns are read by template_birth's getBoundingBox-style
    # size gate).  The caller fetches it with ONE
    # host sync; these methods touch the device again only for objects that
    # actually have work (each separate small read costs ~25 ms of tunnel
    # latency — reading the object table per-field cost ~500 ms/frame).

    def rematch(self, state: MapState, cloud, cam_pos: np.ndarray, gate):
        """Prediction-phase rematch (semantic_dsp_map.h:616-669): objects
        flagged ``to_match_with_previous`` get their particles re-aligned to
        the observed cloud BEFORE the PHD update, so the re-matched set
        participates in the filter the same frame (the reference's order)."""
        rows = np.nonzero(gate[:, 1])[0]
        if rows.size == 0:
            return state
        cam_pos = np.asarray(cam_pos, np.float32)
        g = self.grid

        for row in rows:
            tid = int(gate[row, 3])
            label = int(gate[row, 4])
            if int(gate[row, 5]) < REMATCH_MIN_POINTS:
                continue
            pts, ok, _count = _extract_track_points(
                self.cfg, g.max_source_points, cloud.pos, cloud.track,
                cloud.valid, tid,
            )
            ppts, pok, pcount = _extract_particle_points(
                self.cfg, g.max_template_points, state, tid,
                jnp.float32(0.1),
            )
            if int(pcount) == 0:
                continue
            # alignPointCloudToXYZCenter on the particle cloud
            # (pointcloud_tools.h:320).
            ppts_np = np.asarray(ppts)
            pok_np = np.asarray(pok)
            live = ppts_np[pok_np]
            c = (live.min(0) + live.max(0)) * 0.5
            ppts = jnp.asarray(
                np.where(pok_np[:, None], ppts_np - c, 0.0), jnp.float32
            )
            res = template_match(
                g, False, pts, ok, jnp.asarray(cam_pos), ppts, pok
            )
            if float(res.score) > self.params.match_score_threshold:
                state = _delete_track_particles(self.cfg, state, tid)
                state, _n = _insert_cloud(
                    self.cfg, g.max_template_points, state,
                    res.aligned, pok, MATCHED_WEIGHT, label, tid,
                )
        return state

    # ------------------------------------------------------------------
    def template_birth(self, state: MapState, cloud, cam_pos: np.ndarray, gate):
        """Template birth (semantic_dsp_map.h:806-894), after birth and
        before render.  The whole template bank sweeps in ONE jitted call
        (ops.templates.template_match_bank) with a single host sync per
        eligible object — no per-template ``float(score)`` round-trips."""
        from .ops.templates import template_match_bank

        if self.bank is None:
            return state
        rows = np.nonzero(gate[:, 2])[0]
        if rows.size == 0:
            return state
        cam_pos = np.asarray(cam_pos, np.float32)
        g = self.grid

        flag_updates = {}
        for row in rows:
            tid = int(gate[row, 3])
            label = int(gate[row, 4])
            # Intentional: the gate carries the UNCAPPED per-track cloud
            # count, matching the reference's points_num size gate
            # (semantic_dsp_map.h:815 tests the full observed count, not a
            # truncated buffer size).  Rounds <=3 compared the count capped
            # at max_source_points, which could flip the upper bound for
            # very dense objects.
            n = int(gate[row, 5])
            if not (TM_MIN_POINTS < n < TM_MAX_POINTS):
                continue
            # getBoundingBox extent, precomputed on device (gate mm columns)
            if (
                gate[row, 6] < TM_MIN_BBOX_XY * 1000
                or gate[row, 7] < TM_MIN_BBOX_XY * 1000
            ):
                continue
            pts, ok, _count = _extract_track_points(
                self.cfg, g.max_source_points, cloud.pos, cloud.track,
                cloud.valid, tid,
            )

            flag_updates[row] = False  # match once (":842")
            tpls, tvalids = self.bank.of_label(label)
            best_idx, best_score, aligned = template_match_bank(
                g, True, pts, ok, jnp.asarray(cam_pos),
                jnp.asarray(tpls), jnp.asarray(tvalids),
            )
            if float(best_score) < self.params.match_score_threshold:
                flag_updates[row] = True  # retry next frame (":873-875")
                continue
            best_ok = tvalids[int(best_idx)]

            # 3 jittered GUESSED_BORN copies per template point
            # (semantic_dsp_map.h:878-891).
            reps = np.repeat(np.asarray(aligned), GUESSED_BIRTH_COPIES, axis=0)
            reps = reps + self._rng.randn(*reps.shape).astype(np.float32) * GUESSED_BIRTH_NOISE
            rvalid = np.repeat(best_ok, GUESSED_BIRTH_COPIES)
            state, _n = _insert_cloud(
                self.cfg, reps.shape[0], state, jnp.asarray(reps),
                jnp.asarray(rvalid), PARTICLE_OCC_INIT_WEIGHT, label, tid,
            )

        cleared = [r for r, v in flag_updates.items() if not v]
        if cleared:
            idx = jnp.asarray(np.array(cleared, np.int32))
            state = state.replace(
                objects=state.objects.replace(
                    to_match_templates=state.objects.to_match_templates
                    .at[idx].set(False)
                )
            )
        return state
