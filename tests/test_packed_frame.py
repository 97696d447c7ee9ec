"""Packed single-buffer frame transfer: pack_frame -> unpack_frame must
reproduce build_frame_input's FrameInput exactly (bitcast round trip), and
the packed step must equal the unpacked step."""

import numpy as np

from semantic_dsp_map_tpu import FilterParams, MaskKpts, SemanticDSPMap
from semantic_dsp_map_tpu.config import tiny_test_config, zed2_config
from semantic_dsp_map_tpu.frontend import (
    build_frame_input,
    pack_frame,
    packed_frame_words,
    static_label_table,
)
from semantic_dsp_map_tpu.labels import LabelRegistry
from semantic_dsp_map_tpu.map import build_frame_step, unpack_frame
from semantic_dsp_map_tpu.state import init_map_state


def _scene(cfg, t=1):
    H, W = cfg.image_height, cfg.image_width
    rng = np.random.RandomState(t)
    depth = (1.0 + rng.rand(H, W) * 3).astype(np.float32)
    static = np.full((H, W), 6, np.uint8)
    car = np.zeros((H, W), np.uint8)
    car[H // 3 : H // 2, W // 4 : W // 2] = 1
    kpts = np.array([[0.3, 0.1, 1.9], [0.8, 0.1, 1.9], [0.3, -0.2, 1.9],
                     [0.8, -0.2, 1.9], [0.3, 0.1, 2.2]], np.float32)
    masks = [
        MaskKpts(track_id=65535, label="static", mask=static),
        MaskKpts(track_id=7, label="Car", mask=car, kpts_current=kpts,
                 kpts_previous=kpts - 0.05),
    ]
    pos = np.array([0.1, -0.05, 0.2 * t], np.float32)
    quat = np.array([1.0, 0, 0, 0], np.float32)
    return depth, masks, pos, quat


def _assert_frames_equal(a, b):
    for name in a._fields:
        va, vb = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        np.testing.assert_array_equal(va, vb, err_msg=name)


def test_pack_unpack_roundtrip_tiny():
    cfg = tiny_test_config()
    registry = LabelRegistry.default()
    depth, masks, pos, quat = _scene(cfg)
    ref = build_frame_input(cfg, registry, depth, masks, pos, quat, 0.4)
    buf = pack_frame(cfg, registry, depth, masks, pos, quat, 0.4)
    assert buf.size == packed_frame_words(cfg)
    got = unpack_frame(cfg, static_label_table(registry), buf)
    _assert_frames_equal(ref, got)


def test_pack_unpack_roundtrip_zed2_bbox_mode():
    cfg = zed2_config()
    registry = LabelRegistry.default()
    depth, masks, pos, quat = _scene(cfg)
    ref = build_frame_input(cfg, registry, depth, masks, pos, quat, 1.1)
    buf = pack_frame(cfg, registry, depth, masks, pos, quat, 1.1)
    got = unpack_frame(cfg, static_label_table(registry), buf)
    _assert_frames_equal(ref, got)


def test_packed_step_equals_unpacked_step():
    cfg = tiny_test_config()
    params = FilterParams(if_consider_depth_noise=True, nb_ptc_num_per_point=1,
                          depth_noise_model_zero_order=0.2)
    registry = LabelRegistry.default()

    step_u = build_frame_step(cfg, params, registry)
    step_p = build_frame_step(cfg, params, registry, packed=True)

    s1 = init_map_state(cfg, seed=0)
    s2 = init_map_state(cfg, seed=0)
    for t in range(3):
        depth, masks, pos, quat = _scene(cfg, t)
        f = build_frame_input(cfg, registry, depth, masks, pos, quat, 0.15 * t)
        buf = pack_frame(cfg, registry, depth, masks, pos, quat, 0.15 * t)
        s1, r1, d1 = step_u(s1, f)
        s2, r2, d2 = step_p(s2, buf)
    np.testing.assert_array_equal(np.asarray(r1.occ), np.asarray(r2.occ))
    np.testing.assert_array_equal(
        np.asarray(s1.particles.weight), np.asarray(s2.particles.weight)
    )
    assert int(d1.visible_count) == int(d2.visible_count)
    assert int(d1.born_count) == int(d2.born_count)
