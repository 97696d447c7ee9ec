"""Neighbor-smoothed occupancy reduction vs a scalar numpy oracle
(operations.h:457-600 semantics), plus the evaluation-format RGB encoding
round-trip (semantic_dsp_map.h:1290-1315, docs/static_mode.md:48-52)."""

import numpy as np

from semantic_dsp_map_tpu.config import FilterParams, tiny_test_config
from semantic_dsp_map_tpu.labels import LabelRegistry
from semantic_dsp_map_tpu.ops.render import render_occupancy_smoothed
from semantic_dsp_map_tpu.state import (
    STATUS_GUESSED_BORN,
    STATUS_INVALID,
    STATUS_UPDATED,
    init_map_state,
)
from semantic_dsp_map_tpu import viz


def _random_state(cfg, seed=0, fill=0.3):
    rng = np.random.RandomState(seed)
    V, K = cfg.num_voxels, cfg.slots_per_voxel
    state = init_map_state(cfg, seed)
    occ = rng.rand(V, K) < fill
    status = np.where(
        occ, rng.choice([STATUS_UPDATED, STATUS_GUESSED_BORN, 2], size=(V, K)),
        STATUS_INVALID,
    ).astype(np.int32)
    weight = np.where(occ, rng.rand(V, K) * 1.4, 0).astype(np.float32)
    track = rng.randint(0, 6, (V, K)).astype(np.int32)
    label = rng.randint(0, 12, (V, K)).astype(np.int32)
    stamp = np.ones((V, K), np.int32)
    vstamp = (rng.rand(V) < 0.8).astype(np.int32)  # some invalid voxels
    p = state.particles.replace(
        status=status.reshape(-1), weight=weight.reshape(-1),
        track=track.reshape(-1), label=label.reshape(-1),
        stamp=stamp.reshape(-1),
        px=np.zeros(V * K, np.float32), py=np.zeros(V * K, np.float32),
        pz=np.zeros(V * K, np.float32),
    )
    return state.replace(particles=p, voxel_stamp=vstamp, global_time=np.int32(1))


def _oracle(cfg, state, thr):
    from semantic_dsp_map_tpu.config import PARTICLE_OCC_INIT_WEIGHT

    V, K = cfg.num_voxels, cfg.slots_per_voxel
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    st = np.asarray(state.particles.status).reshape(V, K)
    w = np.asarray(state.particles.weight).reshape(V, K)
    trk = np.asarray(state.particles.track).reshape(V, K)
    lab = np.asarray(state.particles.label).reshape(V, K)
    vst = np.asarray(state.voxel_stamp)

    def ring(v):
        x = v & (nx - 1)
        y = (v >> cfg.voxel_num_axis_x_n) & (ny - 1)
        z = v >> (cfg.voxel_num_axis_x_n + cfg.voxel_num_axis_y_n)
        return x, y, z

    def vidx(x, y, z):
        return ((z << cfg.voxel_num_axis_y_n | y) << cfg.voxel_num_axis_x_n) | x

    valid = vst != 0  # axis stamps all zero in this synthetic state

    occ_o = np.full(V, -1, np.int64)
    trk_o = np.zeros(V, np.int64)
    lab_o = np.zeros(V, np.int64)
    ws_o = np.full(V, -1.0, np.float32)

    for v in range(V):
        x, y, z = ring(v)
        if not valid[v]:
            continue
        nbs = [(v, True)]
        if x - 1 >= 1 and valid[vidx(x - 1, y, z)]:
            nbs.append((vidx(x - 1, y, z), False))
        if x + 1 < nx - 1 and valid[vidx(x + 1, y, z)]:
            nbs.append((vidx(x + 1, y, z), False))
        if y - 1 >= 1 and valid[vidx(x, y - 1, z)]:
            nbs.append((vidx(x, y - 1, z), False))
        if y + 1 < ny - 1 and valid[vidx(x, y + 1, z)]:
            nbs.append((vidx(x, y + 1, z), False))

        wvec = []
        gsum = np.float32(0.0)
        tmap, lmap = {}, {}
        for nv, _self in nbs:
            wv = np.float32(0.0)
            for k in range(K):
                if st[nv, k] == STATUS_INVALID:
                    continue
                pw = w[nv, k]
                if st[nv, k] == STATUS_GUESSED_BORN:
                    gsum = np.float32(gsum + pw)
                elif st[nv, k] == STATUS_UPDATED and min(pw, 1.0) < PARTICLE_OCC_INIT_WEIGHT:
                    continue  # GC'd, skips the track map too
                else:
                    pw = min(pw, np.float32(1.0))
                    wv = np.float32(wv + pw)
                t = trk[nv, k]
                tmap[t] = np.float32(tmap.get(t, np.float32(0.0)) + pw)
                lmap[t] = lab[nv, k]
            wvec.append(wv)

        if wvec[0] > thr:
            ws = np.float32(0.0) if all(wj <= thr for wj in wvec[1:]) else wvec[0]
        else:
            big = sum(1 for wj in wvec[1:] if wj > thr)
            ws = np.float32(thr + 0.1) if big >= 2 else wvec[0]

        best_t, best_w = 0, 0.0
        for t in sorted(tmap):
            if tmap[t] > best_w:
                best_w, best_t = tmap[t], t
        ws_o[v] = ws
        occ_o[v] = (
            1 if ws > thr else (2 if gsum >= PARTICLE_OCC_INIT_WEIGHT else 0)
        )
        if best_w > 0:
            trk_o[v] = best_t
            lab_o[v] = lmap[best_t]
    return occ_o, trk_o, lab_o, ws_o


def test_smoothed_reduction_matches_oracle():
    cfg = tiny_test_config()
    state = _random_state(cfg)
    thr = 0.2
    _, res = render_occupancy_smoothed(cfg, state, thr)
    occ_o, trk_o, lab_o, ws_o = _oracle(cfg, state, thr)
    np.testing.assert_array_equal(np.asarray(res.occ), occ_o)
    np.testing.assert_array_equal(np.asarray(res.track), trk_o)
    np.testing.assert_array_equal(np.asarray(res.label), lab_o)
    np.testing.assert_allclose(np.asarray(res.weight_sum), ws_o, rtol=1e-5, atol=1e-6)


def test_evaluation_format_roundtrip():
    """if_out_evaluation_format encodes (label, track) losslessly into RGB
    for instance voxels (semantic_dsp_map.h:1311-1315): r=label, g=track>>8,
    b=track&0xFF; background renders black and FOV dimming is disabled."""
    cfg = tiny_test_config()
    registry = LabelRegistry.default()
    state = _random_state(cfg, seed=3)
    _, res = render_occupancy_smoothed(cfg, state, 0.2)

    params = FilterParams(if_out_evaluation_format=True)
    vpos = viz.voxel_positions(cfg, state.scroll)
    out = viz.colorize(cfg, params, registry, res, np.zeros(3, np.float32), vpos)

    occ = np.asarray(res.occ)
    lab = np.asarray(res.label)
    trk = np.asarray(res.track)
    sel = (occ == 1) | (occ == 2)
    rgb = out["occupied_rgb"]

    bg_id = registry.label_to_id["Background"]
    max_movable = registry.max_movable_instance_id
    inst = (lab[sel] != bg_id) & (trk[sel] <= max_movable) & (occ[sel] != 2)
    assert inst.any()
    # decode and compare
    dec_label = rgb[inst, 0].astype(np.int64)
    dec_track = (rgb[inst, 1].astype(np.int64) << 8) | rgb[inst, 2].astype(np.int64)
    np.testing.assert_array_equal(dec_label, lab[sel][inst])
    np.testing.assert_array_equal(dec_track, trk[sel][inst])
    # background voxels are blacked out in evaluation format (guessed voxels
    # stay white, semantic_dsp_map.h:1325-1330 runs after the encoding)
    bg = (lab[sel] == bg_id) & (occ[sel] != 2)
    if bg.any():
        assert (rgb[bg] == 0).all()
