"""Checkpoint round-trip: a mapped state survives save/restore bit-exactly
and the restored map continues producing identical output."""

import numpy as np

from semantic_dsp_map_tpu.checkpoint import load_checkpoint, save_checkpoint
from semantic_dsp_map_tpu.config import FilterParams, tiny_test_config
from semantic_dsp_map_tpu.frontend import MaskKpts
from semantic_dsp_map_tpu.labels import LabelRegistry
from semantic_dsp_map_tpu.map import SemanticDSPMap


def test_checkpoint_roundtrip(tmp_path):
    import jax

    cfg = tiny_test_config()
    params = FilterParams()
    registry = LabelRegistry.default()
    dsp = SemanticDSPMap(cfg, params, registry)

    H, W = cfg.height, cfg.width
    depth = np.full((H, W), 2.0, np.float32)
    static = np.full((H, W), 6, np.uint8)
    masks = [MaskKpts(track_id=65535, label="static", mask=static)]
    for t in range(3):
        r1, _ = dsp.update(depth, masks, np.zeros(3), np.array([1.0, 0, 0, 0]), 0.1 * t)

    save_checkpoint(str(tmp_path / "ck"), dsp.state, step=3)

    dsp2 = SemanticDSPMap(cfg, params, registry)
    dsp2.state = load_checkpoint(str(tmp_path / "ck"), cfg)
    dsp2._time_origin = dsp._time_origin

    # Bit-exact state restore.
    for a, b in zip(
        jax.tree_util.tree_leaves(dsp.state), jax.tree_util.tree_leaves(dsp2.state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Identical continuation.
    ra, _ = dsp.update(depth, masks, np.zeros(3), np.array([1.0, 0, 0, 0]), 0.3)
    rb, _ = dsp2.update(depth, masks, np.zeros(3), np.array([1.0, 0, 0, 0]), 0.3)
    np.testing.assert_array_equal(np.asarray(ra.occ), np.asarray(rb.occ))
    np.testing.assert_array_equal(np.asarray(ra.track), np.asarray(rb.track))
