"""Metamorphic end-to-end properties (SURVEY.md section 4).

Two invariants that hold for the reference map by construction and guard
exactly the scroll/index math that sharding stresses:

  1. **Static fixed-point**: with an unchanging scene and a stationary
     camera, the rendered occupancy decision reaches a fixed point — the
     weights converge under the repeated PHD update + birth + resample
     cycle, and the thresholded occupancy / dominant labels stop changing.

  2. **Ego-translation index-shift**: translating the WHOLE scene (camera +
     world content) by an exact multiple of the voxel size produces the same
     map content relocated by that many voxel columns — the ring-buffer
     scroll (operations.h:68-96, 1111-1191) re-labels indices without
     touching content, so the rendered grids of the two runs must agree on
     the overlap of their (ego-centric) domains.
"""

import numpy as np

from semantic_dsp_map_tpu import FilterParams, MaskKpts, SemanticDSPMap
from semantic_dsp_map_tpu.config import tiny_test_config
from semantic_dsp_map_tpu.viz import voxel_positions


def _depth(cfg, wall_z):
    return np.full((cfg.height, cfg.width), wall_z, np.float32)


def _static_mask(cfg, label_value=6):
    m = np.full((cfg.height, cfg.width), label_value - 1, np.uint8)
    return MaskKpts(track_id=65535, label="static", mask=m)


def test_static_scene_occupancy_fixed_point():
    """Same frame repeated => occupancy is a fixed point after warmup."""
    cfg = tiny_test_config()
    dsp = SemanticDSPMap(cfg, FilterParams(nb_ptc_num_per_point=1))
    pos = np.zeros(3, np.float32)
    quat = np.array([1.0, 0, 0, 0], np.float32)
    depth = _depth(cfg, 1.37)
    masks = [_static_mask(cfg)]

    renders = []
    for t in range(18):
        result, _diag = dsp.update(depth, masks, pos, quat, time=t * 0.1)
        if t >= 6:
            renders.append(
                (np.asarray(result.occ).copy(), np.asarray(result.label).copy())
            )

    # 12 post-warmup frames, all bit-identical to the first of them.
    occ0, lab0 = renders[0]
    assert (occ0 == 1).sum() > 0, "scene must produce occupied voxels"
    for i, (occ, lab) in enumerate(renders[1:], start=1):
        np.testing.assert_array_equal(
            occ, occ0, err_msg=f"occupancy changed at post-warmup frame {i}"
        )
        np.testing.assert_array_equal(
            lab[occ == 1], lab0[occ0 == 1],
            err_msg=f"labels changed at post-warmup frame {i}",
        )


def test_ego_translation_index_shift_equivalence():
    """Scene translated by an exact voxel multiple => identical rendered
    content at shifted indices (compared in global coordinates on the
    overlap of the two ego-centric domains)."""
    cfg = tiny_test_config()
    quat = np.array([1.0, 0, 0, 0], np.float32)
    depth = _depth(cfg, 1.37)
    masks = [_static_mask(cfg)]

    shift_vox = 2
    delta = np.array([shift_vox * cfg.voxel_size, 0.0, 0.0], np.float32)

    runs = []
    for cam in (np.zeros(3, np.float32), delta):
        dsp = SemanticDSPMap(cfg, FilterParams(nb_ptc_num_per_point=1))
        for t in range(6):
            result, _ = dsp.update(depth, masks, cam, quat, time=t * 0.1)
        runs.append((np.asarray(result.occ), voxel_positions(cfg, dsp.state.scroll)))

    (occ_a, pos_a), (occ_b, pos_b) = runs
    # Key voxels by their integer global grid coordinate.  Run B's world is
    # run A's world translated by delta, so content at key k in B must equal
    # content at key k - shift in A; the ego-centric domains correspond
    # one-to-one under that shift (the scroll re-labels indices only).
    key_a = {tuple(k): v for k, v in zip(
        np.round(pos_a / cfg.voxel_size).astype(np.int64), occ_a)}
    key_b = {tuple(k): v for k, v in zip(
        np.round(pos_b / cfg.voxel_size).astype(np.int64), occ_b)}

    mismatches = []
    matched = 0
    for (x, y, z), v in key_b.items():
        ka = (x - shift_vox, y, z)
        assert ka in key_a, "shifted domains must coincide exactly"
        matched += 1
        if key_a[ka] != v:
            mismatches.append((x, y, z))
    assert matched == cfg.num_voxels
    assert not mismatches, (
        f"{len(mismatches)} voxels differ after an exact-voxel ego "
        f"translation, e.g. {sorted(mismatches)[:5]}"
    )
    # And the scene is non-trivial: occupied + free + unknown all present.
    vals = set(key_a.values())
    assert {0, 1, -1} <= vals
