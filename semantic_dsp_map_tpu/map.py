"""The map engine: SemanticDSPMap.

TPU-native re-design of the reference engine (include/semantic_dsp_map.h:21).
One frame is one jitted pure function over the :class:`MapState` pytree,
mirroring the reference's frame kernel ``update()``
(semantic_dsp_map.h:170-251) stage for stage:

  1. object-level update               (objectLevelUpdate, :306-566)
  2. labeled point cloud               (generateLabeledPointCloud)
  3. prediction: ego scroll, object expiry/cleanup, rigid particle moves
                                       (subObjectLevelUpdate, :579-737)
  4. visibility projection             (updateVisibleParitlcesWithBFS, :749)
  5. PHD weight update                 (updateParticles, :960-1121)
  6. birth + resampling                (:768-801, 1148-1230, 1448-1519)
  7. occupancy render                  (getOccupancyResult, :1239-1383)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import FilterParams, KEYPOINTS_BBOX3D, MapConfig
from .frontend import FrameInput, MaskKpts, build_frame_input
from .labels import LabelRegistry
from .objects import (
    ObservedInstances,
    expire_objects,
    object_level_update,
    track_lookup_table,
)
from .ops import codecs
from .ops.birth import Candidates, birth_and_resample, insert_particles
from .ops.geometry import camera_matrices
from .ops.phd import phd_weight_update
from .ops.projection import generate_labeled_cloud, visibility_pass
from .ops.render import RenderResult, render_occupancy
from .state import MapState, Particles, STATUS_INVALID, clear_map_state, init_map_state


class StepDiagnostics(NamedTuple):
    visible_count: jax.Array   # i32: particles in the pixel map this frame
    born_count: jax.Array      # i32: accepted newborn particles
    moved_count: jax.Array     # i32: rigid-moved particles re-inserted


def _move_and_cleanup(
    cfg: MapConfig,
    params: FilterParams,
    particles: Particles,
    scroll,
    objects,
    global_time,
    rng,
    max_movable: int,
):
    """Prediction-phase particle maintenance (semantic_dsp_map.h:587-737):

      - "floating" particles whose movable track id has no live object are
        invalidated (:712-737; also covers particles of just-expired objects,
        whose rows were removed by expire_objects — the reference invalidates
        them via removeObjectByTrackID, object_layer.h:414-425);
      - particles of moving objects are rigidly transformed by the object's
        current/predicted transform with preset-sigma Gaussian jitter, then
        re-inserted in one batch (:672-693; operations.h:321-362).
    """
    vox_axis = codecs.axis_stamps_per_voxel(cfg, scroll)
    alive = codecs.particle_alive(particles.status, particles.stamp, vox_axis)

    mv_obj = objects.valid & objects.has_moved_record & objects.moving & objects.has_tmatrix
    if params.if_use_template_matching:
        # Objects flagged for cloud re-matching skip the rigid move; the
        # matching path re-seeds their particles separately
        # (semantic_dsp_map.h:616-669).
        mv_obj = mv_obj & ~objects.to_match_previous

    # Per-particle ownership / moving masks via a fori over the (small)
    # object table rather than a [V, K]-wide track-id table gather: TPU
    # gathers run at scalar rate, dense compares at vector rate.
    O = objects.valid.shape[0]

    def owner_body(o, carry):
        owned, moving_mask = carry
        eq = particles.track == objects.track_id[o]
        owned = owned | (eq & objects.valid[o])
        moving_mask = moving_mask | (eq & (objects.valid[o] & mv_obj[o]))
        return owned, moving_mask

    zero = jnp.zeros(particles.track.shape, bool)
    owned, moving_mask = jax.lax.fori_loop(0, O, owner_body, (zero, zero))

    movable = (particles.track >= 0) & (particles.track <= max_movable)
    floating = movable & alive & ~owned
    status = jnp.where(floating, STATUS_INVALID, particles.status)
    alive = alive & ~floating

    move_p = alive & moving_mask

    M = cfg.max_moving_particles
    mv, mk = jnp.nonzero(move_p, size=M, fill_value=-1)
    ok = mv >= 0
    gv = jnp.maximum(mv, 0)
    gk = jnp.maximum(mk, 0)

    pos = jnp.stack(
        [particles.pos[0][gv, gk], particles.pos[1][gv, gk], particles.pos[2][gv, gk]],
        axis=-1,
    )
    # Object row per moving particle: a [M]-sized gather from the small
    # track-id table (M << V*K).
    table = track_lookup_table(objects)
    track_e = jnp.clip(particles.track[gv, gk], 0, 65535)
    po = jnp.maximum(table[track_e], 0)
    T = objects.tmatrix[po]
    noise = jax.random.normal(rng, (M, 3), jnp.float32) * params.prediction_stddev
    new_pos = jnp.einsum("nij,nj->ni", T[:, :3, :3], pos) + T[:, :3, 3] + noise

    cand = Candidates(
        pos=new_pos,
        weight=particles.weight[gv, gk],
        label=particles.label[gv, gk],
        track=particles.track[gv, gk],
        status=particles.status[gv, gk],
        stamp=particles.stamp[gv, gk],
        forget=particles.forget[gv, gk],
        priority=jnp.arange(M, dtype=jnp.int32),
        valid=ok,
    )

    # Delete sources first (the batched move copies-then-deletes-then-readds,
    # operations.h:330-361).
    V = particles.status.shape[0]
    status = status.at[jnp.where(ok, mv, V), gk].set(STATUS_INVALID, mode="drop")
    particles = particles.replace(status=status)

    particles, accepted, _ = insert_particles(cfg, particles, scroll, cand)
    moved = jnp.sum(accepted.astype(jnp.int32))
    return particles, moved


def build_frame_step(
    cfg: MapConfig,
    params: FilterParams,
    registry: LabelRegistry,
    split_render: bool = False,
):
    """Returns the jitted per-frame update: (MapState, FrameInput) ->
    (MapState, RenderResult, StepDiagnostics).

    With ``split_render=True`` returns (core, render) jitted separately:
    core: (MapState, FrameInput) -> (MapState, LabeledCloud, StepDiagnostics)
    render: MapState -> (MapState, RenderResult).  The split exists for the
    template-matching path, which injects host-orchestrated work between
    birth and render (semantic_dsp_map.h:806-894)."""

    max_movable = registry.max_movable_instance_id
    sky_label = registry.label_to_id.get("Sky", registry.label_to_id.get("sky", -1))
    sky_instance = registry.static_label_to_instance.get(
        "Sky", registry.static_label_to_instance.get("sky", -1)
    )
    use_sky_cull = cfg.keypoint_mode == KEYPOINTS_BBOX3D  # ZED2-only, pointcloud_tools.h:234-241
    use_bbox_gate = cfg.keypoint_mode == KEYPOINTS_BBOX3D

    def core(state: MapState, f: FrameInput):
        gt = state.global_time + 1
        rng, k_obj, k_move, k_birth = jax.random.split(state.rng, 4)
        r_wc, t_wc, r_cw, t_cw = camera_matrices(f.cam_pos, f.cam_quat)

        # 1. Object layer (only with instances, semantic_dsp_map.h:189-191).
        objects = state.objects
        if cfg.consider_instance:
            obs = ObservedInstances(
                valid=f.inst_valid,
                track=f.inst_track,
                label=f.inst_label,
                kpts_curr=f.kpts_curr,
                kpts_prev=f.kpts_prev,
                kpts_count=f.kpts_count,
            )
            objects = object_level_update(
                cfg, params, objects, obs, f.cam_pos, r_cw, t_cw,
                f.time, state.prev_frame_time, gt, k_obj,
            )

        # 2. Labeled point cloud.
        cloud = generate_labeled_cloud(
            cfg, params, f.depth, f.track_raster, f.track_label_table,
            r_wc, t_wc, max_movable,
            sky_instance_id=sky_instance if use_sky_cull else -1,
            inst_bbox_min=f.inst_bbox_min if use_bbox_gate else None,
            inst_bbox_max=f.inst_bbox_max if use_bbox_gate else None,
        )

        # 3. Prediction: scroll, expiry, cleanup, rigid moves.
        scroll = codecs.update_ego_center(cfg, state.scroll, f.cam_pos, gt)
        objects, _expired = expire_objects(params, objects, gt)
        particles, moved = _move_and_cleanup(
            cfg, params, state.particles, scroll, objects, gt, k_move, max_movable
        )

        state = state.replace(
            particles=particles, scroll=scroll, objects=objects, global_time=gt
        )

        # 4. Visibility projection.
        particles, voxel_stamp, vis = visibility_pass(cfg, state, f.depth, r_cw, t_cw)

        # 5. PHD weight update.
        particles = phd_weight_update(cfg, params, vis, cloud, particles, gt)

        # 6. Birth + resampling.
        particles, accepted, _cand = birth_and_resample(
            cfg, params, particles, scroll, cloud, gt, k_birth
        )

        state = state.replace(
            particles=particles,
            voxel_stamp=voxel_stamp,
            prev_frame_time=f.time,
            rng=rng,
        )

        diag = StepDiagnostics(
            visible_count=vis.count,
            born_count=jnp.sum(accepted.astype(jnp.int32)),
            moved_count=moved,
        )
        return state, cloud, diag

    def render(state: MapState):
        # 7. Occupancy render (with its in-reduction GC side effects).
        particles, result = render_occupancy(cfg, state, params.occupancy_threshold)
        return state.replace(particles=particles), result

    if split_render:
        return (
            jax.jit(core, donate_argnums=0),
            jax.jit(render, donate_argnums=0),
        )

    def step(state: MapState, f: FrameInput):
        state, _cloud, diag = core(state, f)
        state, result = render(state)
        return state, result, diag

    return jax.jit(step, donate_argnums=0)


class SemanticDSPMap:
    """User-facing map engine (reference: class SemanticDSPMap,
    semantic_dsp_map.h:21).

    Typical use::

        dsp = SemanticDSPMap(virtual_kitti2_config(), FilterParams(...))
        for frame in frames:
            result = dsp.update(depth, masks, cam_pos, cam_quat, t)
    """

    def __init__(
        self,
        cfg: MapConfig,
        params: Optional[FilterParams] = None,
        registry: Optional[LabelRegistry] = None,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.params = params or FilterParams()
        self.registry = registry or LabelRegistry.default()
        self.state = init_map_state(cfg, seed)
        self._time_origin: Optional[float] = None
        self._templates = None
        if self.params.if_use_template_matching:
            # Template matching injects host-orchestrated work between birth
            # and render (semantic_dsp_map.h:806-894), so the step is built
            # as (core, render) with the template stage in between.
            from .template_engine import TemplateEngine

            self._core, self._render = build_frame_step(
                cfg, self.params, self.registry, split_render=True
            )
            self._templates = TemplateEngine(cfg, self.params, self.registry)
            self._step = None
        else:
            self._step = build_frame_step(cfg, self.params, self.registry)

    # ------------------------------------------------------------------
    def set_template_path(self, folder: str) -> int:
        """setTemplatePath (semantic_dsp_map.h:163-166): load the CAD
        template bank (.pcd files grouped by label-id directory)."""
        if self._templates is None:
            raise ValueError(
                "set_template_path requires FilterParams(if_use_template_matching=True)"
            )
        return self._templates.set_template_path(folder)

    def clear(self):
        """semantic_dsp_map.h:74-81."""
        self.state = clear_map_state(self.state, self.cfg)

    def update_from_frame(self, frame: FrameInput):
        """Run one frame from pre-built arrays; returns (RenderResult, diag)."""
        if self._step is not None:
            self.state, result, diag = self._step(self.state, frame)
            return result, diag
        state, cloud, diag = self._core(self.state, frame)
        state = self._templates.run(state, cloud, frame.cam_pos)
        self.state, result = self._render(state)
        return result, diag

    def update(
        self,
        depth: np.ndarray,
        masks,
        cam_pos,
        cam_quat,
        time: float = 0.0,
    ):
        """Reference-parity entry (semantic_dsp_map.h:170): depth image,
        MaskKpts list, camera pose -> occupancy render result."""
        if self._time_origin is None:
            self._time_origin = float(time)
        frame = build_frame_input(
            self.cfg, self.registry, depth, masks, cam_pos, cam_quat,
            float(time) - self._time_origin,
        )
        return self.update_from_frame(frame)
