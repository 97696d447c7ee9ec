"""Replay the committed npz sequence (data/replay_tiny) and assert the
occupancy summary matches the committed EXPECTED.json — the framework's
analog of the reference's bag-replay validation (README.md:49-70), kept
in-tree so full-frame semantic regressions are visible in CI.

Regenerate the artifact after an intentional semantics change with
``python tools/make_replay_sequence.py``.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from semantic_dsp_map_tpu import SemanticDSPMap
from semantic_dsp_map_tpu.config import tiny_test_config
from semantic_dsp_map_tpu.datasets import NpzSequence

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data", "replay_tiny")


def test_committed_replay_matches_expected():
    from make_replay_sequence import replay_params

    with open(os.path.join(DATA, "EXPECTED.json")) as f:
        expected = json.load(f)

    cfg = tiny_test_config()
    dsp = SemanticDSPMap(cfg, replay_params())
    seq = NpzSequence(DATA)
    assert len(seq) == expected["n_frames"]

    got = []
    for i, frame in enumerate(seq):
        if i < expected["drop_first"]:
            continue
        result, diag = dsp.update(
            frame.depth, frame.masks, frame.cam_pos, frame.cam_quat, frame.time
        )
        occ = np.asarray(result.occ)
        got.append(
            dict(
                index=frame.index,
                occupied=int((occ == 1).sum()),
                free=int((occ == 0).sum()),
                unknown=int((occ == -1).sum()),
                visible=int(np.asarray(diag.visible_count)),
                born=int(np.asarray(diag.born_count)),
                moved=int(np.asarray(diag.moved_count)),
            )
        )

    assert got == expected["frames"]
