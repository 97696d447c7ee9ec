"""Depth back-projection (labeled point cloud) and particle visibility.

These are hot loops #1 and #2 of the reference frame kernel:
  - generateLabeledPointCloud (pointcloud_tools.h:88-310): per-pixel K^-1
    back-projection with mask fusion -> here a fully vectorized [H, W] map.
  - updateVisibleParitlcesWithBFS / getIdxOfVisibleParitlces
    (operations.h:653-667, 1297-1457): the reference walks frustum voxels
    with a vertex BFS purely to avoid scanning all voxels on a CPU.  On TPU
    we project *every* live particle with one vectorized transform and mask
    by frustum/occlusion — a trivially parallel map that also subsumes the
    pixel "pyramid" hash structure (buffer.h:89-93): instead of per-pixel
    particle lists we keep, per particle, its pixel coordinates, and compact
    the visible subset into a fixed-size index buffer.
"""

from __future__ import annotations

from typing import NamedTuple

from functools import partial

import jax
import jax.numpy as jnp

from ..config import FilterParams, MapConfig, PARTICLE_OCC_INIT_WEIGHT
from ..labels import BACKGROUND_INSTANCE_ID
from ..state import MapState, Particles, STATUS_INVALID
from . import codecs
from .geometry import project_to_image, project_to_image_xyz


class LabeledCloud(NamedTuple):
    """Dense per-pixel observation grid (the reference's
    vector<vector<LabeledPoint>>, data_base.h:78-92)."""

    pos: jax.Array     # f32[H, W, 3] global-frame point
    sigma: jax.Array   # f32[H, W] noise stddev
    label: jax.Array   # i32[H, W]
    track: jax.Array   # i32[H, W]
    valid: jax.Array   # bool[H, W]


def generate_labeled_cloud(
    cfg: MapConfig,
    params: FilterParams,
    depth: jax.Array,           # f32[H, W], already BOOST-resized if needed
    track_raster: jax.Array,    # i32[H, W] per-pixel instance/track id
    track_label_table: jax.Array,  # i32[65536] track id -> label id
    r_wc: jax.Array,
    t_wc: jax.Array,
    max_movable_instance_id: int,
    sky_instance_id: int = -1,
    inst_bbox_min: jax.Array | None = None,  # f32[65536?]-free: see below
    inst_bbox_max: jax.Array | None = None,
) -> LabeledCloud:
    """Vectorized generateLabeledPointCloud (pointcloud_tools.h:217-307).

    ``track_raster`` is the fused static+instance mask built by the frontend
    (mirroring pointcloud_tools.h:116-215).  ``track_label_table`` maps any
    instance id (movable track ids and reserved static ids alike) to its
    label id, replacing the two-way branch at pointcloud_tools.h:275-282.

    ZED2-mode extras (enabled by passing the optional args):
      - sky culling (pointcloud_tools.h:234-241);
      - per-instance 3D-bbox gating of mask pixels with a 1 m margin, which
        demotes out-of-box points to Background (pointcloud_tools.h:254-273).
        ``inst_bbox_min/max`` are dense [T, 3] tables indexed by track id
        (T = max_movable_instance_id+1-safe size chosen by caller) already
        including the margin.
    """
    H, W = cfg.height, cfg.width
    rows = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    valid = (
        jnp.isfinite(depth)
        & (depth >= cfg.depth_range_min)
        & (depth <= cfg.depth_range_max)
    )

    track = track_raster.astype(jnp.int32)
    if sky_instance_id >= 0:
        valid &= track != sky_instance_id

    # K^-1 back-projection then camera->world (pointcloud_tools.h:243-249).
    x_cam = (cols - cfg.cx) / cfg.fx * depth
    y_cam = (rows - cfg.cy) / cfg.fy * depth
    cam = jnp.stack([x_cam, y_cam, depth], axis=-1)
    pos = cam @ r_wc.T + t_wc

    # ZED2 bbox gating: movable-instance pixels whose 3D point falls outside
    # the instance's keypoint bbox (+margin) become Background.
    if inst_bbox_min is not None:
        movable = track <= max_movable_instance_id
        tid = jnp.clip(track, 0, inst_bbox_min.shape[0] - 1)
        bmin = inst_bbox_min[tid]
        bmax = inst_bbox_max[tid]
        outside = jnp.any((pos < bmin) | (pos > bmax), axis=-1)
        demote = movable & outside
        track = jnp.where(demote, BACKGROUND_INSTANCE_ID, track)

    label = track_label_table[jnp.clip(track, 0, track_label_table.shape[0] - 1)]

    if params.if_consider_depth_noise:
        sigma = (
            params.depth_noise_model_zero_order
            + params.depth_noise_model_first_order * depth
        )
    else:
        sigma = jnp.full((H, W), 0.1, jnp.float32)
    # The reference leaves sigma uninitialized for invalid pixels
    # (pointcloud_tools.h:228-231); we define it everywhere from the noise
    # model (benign: invalid pixels are masked in every consumer).
    sigma = jnp.where(jnp.isfinite(sigma), sigma, params.depth_noise_model_zero_order)

    return LabeledCloud(
        pos=pos.astype(jnp.float32),
        sigma=sigma.astype(jnp.float32),
        label=label,
        track=track,
        valid=valid,
    )


class VisibleSet(NamedTuple):
    """Compacted candidate-particle buffer (replaces the pixel pyramid maps,
    buffer.h:89-93).  Entries beyond the real count are padding with
    vox == -1; particles are addressed by their 2-D (voxel, slot) coordinates
    so scatters back into the [V, K] arrays never need a flat relayout.
    ``visible`` distinguishes truly visible entries (in the reference's
    pyramid) from far-free/occluded candidates that were compacted only for
    their side effects."""

    vox: jax.Array      # i32[P] voxel index, -1 pad
    slot: jax.Array     # i32[P] slot index within the voxel
    row: jax.Array      # i32[P]
    col: jax.Array      # i32[P]
    pos: jax.Array      # f32[P, 3]
    weight: jax.Array   # f32[P]
    track: jax.Array    # i32[P]
    forget: jax.Array   # i32[P]
    visible: jax.Array  # bool[P] in-pyramid (unoccluded, not far-free)
    count: jax.Array    # i32 scalar, number of visible entries


@partial(jax.jit, static_argnums=0)
def visibility_pass(
    cfg: MapConfig,
    state: MapState,
    depth: jax.Array,
    r_cw: jax.Array,
    t_cw: jax.Array,
):
    """Project all particles; classify visible / occluded / free-reset; update
    voxel observation stamps; compact the visible set.

    Mirrors getIdxOfVisibleParitlces (operations.h:1297-1457):
      - stale particles (older than their voxel column's wrap-out stamp) are
        pruned to INVALID (operations.h:1374-1377; the reference prunes only
        BFS-visited voxels but treats stale slots as vacant everywhere, so
        global pruning is equivalent);
      - particles whose pixel measures depth > range max get their weight
        reset to the newborn weight — observed free space
        (operations.h:1389-1395);
      - particles behind the measured surface by more than one sigma are
        occluded and skipped (operations.h:1397-1400);
      - a voxel's stamp is refreshed when any of its particles was observed,
        or when it has no live particles but its (corner) point projects in
        front of the measured depth (operations.h:1414-1431).

    Returns (particles', voxel_stamp', VisibleSet).
    """
    V, K = cfg.num_voxels, cfg.slots_per_voxel
    p = state.particles

    vox_axis_stamp = codecs.axis_stamps_per_voxel(cfg, state.scroll)
    alive = codecs.particle_alive(p.status, p.stamp, vox_axis_stamp)

    # Prune stale-but-flagged slots.
    status = jnp.where(alive, p.status, STATUS_INVALID)

    # Dense projection of every slot.  NOTE: no depth lookups here — a
    # [V, K]-wide gather runs at ~10-30 ns/element on TPU (scalar rate);
    # all pixel-dependent tests happen on the compacted [P] buffer below.
    row, col, cam_z, proj_ok = project_to_image_xyz(
        cfg, r_cw, t_cw, p.pos[0], p.pos[1], p.pos[2]
    )
    cand = proj_ok & alive

    # Pack (track, forget) so the compaction needs one gather, not two.
    packed_tf = (p.track << 8) | (p.forget & 0xFF)

    P = cfg.max_visible_particles
    vi, ki = jnp.nonzero(cand, size=P, fill_value=-1)
    ok = vi >= 0
    vs = jnp.maximum(vi, 0)
    ks = jnp.maximum(ki, 0)

    px = p.pos[0][vs, ks]
    py = p.pos[1][vs, ks]
    pz = p.pos[2][vs, ks]
    w_e = p.weight[vs, ks]
    tf_e = packed_tf[vs, ks]

    # Recompute pixel coords / camera depth from the gathered positions (the
    # identical arithmetic on identical f32 inputs gives identical results).
    row_e, col_e, camz_e, _ = project_to_image_xyz(cfg, r_cw, t_cw, px, py, pz)
    rs = jnp.clip(row_e, 0, cfg.height - 1)
    cs = jnp.clip(col_e, 0, cfg.width - 1)
    depth_at = depth[rs, cs]

    far_free = ok & (depth_at > cfg.depth_range_max)
    one_sigma = 1.0 + cfg.depth_error_stddev_at_one_meter
    occluded = ok & ~far_free & (camz_e > depth_at * one_sigma)
    visible = ok & ~far_free & ~occluded

    # Far-depth free-space reset (operations.h:1389-1395): weight -> newborn
    # weight; (voxel, slot) targets are unique.
    weight = p.weight.at[jnp.where(far_free, vi, V), ks].set(
        PARTICLE_OCC_INIT_WEIGHT, mode="drop", unique_indices=True
    )

    # Voxel stamp refresh (operations.h:1414-1431): a voxel is observed when
    # any of its particles is visible or far-free...
    observed_voxel = jnp.zeros(V, bool).at[
        jnp.where(visible | far_free, vi, V)
    ].set(True, mode="drop")
    has_alive = jnp.any(alive, axis=1)

    # ...or when it has no live particles but its corner point projects in
    # front of the measured surface (the "imaginary particle" rule).
    corner = codecs.voxel_to_global_pos(
        cfg, state.scroll, jnp.arange(V, dtype=jnp.int32)
    )
    crow, ccol, cz, cok = project_to_image(cfg, r_cw, t_cw, corner)
    cdepth = depth[jnp.clip(crow, 0, cfg.height - 1), jnp.clip(ccol, 0, cfg.width - 1)]
    center_observed = cok & (cz <= cdepth)

    stamp_now = observed_voxel | (~has_alive & center_observed)
    voxel_stamp = jnp.where(stamp_now, state.global_time, state.voxel_stamp)

    vpos = jnp.stack([px, py, pz], axis=-1)
    vis = VisibleSet(
        vox=jnp.where(ok, vi, -1),
        slot=jnp.where(ok, ki, 0),
        row=jnp.where(ok, row_e, 0),
        col=jnp.where(ok, col_e, 0),
        pos=jnp.where(ok[:, None], vpos, 0.0),
        weight=jnp.where(ok, w_e, 0.0),
        track=jnp.where(ok, tf_e >> 8, -1),
        forget=jnp.where(ok, tf_e & 0xFF, 0),
        visible=visible,
        count=jnp.sum(visible.astype(jnp.int32)),
    )

    particles = p.replace(status=status, weight=weight)
    return particles, voxel_stamp, vis
