"""Template matching: jitted sweep vs a direct NumPy port-of-the-semantics
oracle, PCD/PLY IO round-trips, and the engine integration smoke test."""

import numpy as np
import pytest

from semantic_dsp_map_tpu.ops.templates import (
    MatchGridConfig,
    TM_EXPAND,
    TM_NOISE_RANGE,
    TM_NUM_ANGLES,
    TM_PUSH_DISTANCE,
    TM_VOXEL_SIZE,
    TemplateBank,
    center_cloud,
    compute_mhd,
    remove_outliers,
    template_match,
)


def oracle_match(src, cam, tpl, use_fs, grid_n=32, ray_steps=96):
    """The reference hypothesis sweep (pointcloud_tools.h:686-865 / 874-1097)
    on a static grid anchored like ops.templates (origin = bbox_min - expand),
    with order-independent ray blocking (the documented deviation)."""
    vs = np.float32(TM_VOXEL_SIZE)
    expand = TM_EXPAND if use_fs else 0
    src = src.astype(np.float32)
    tpl = tpl.astype(np.float32)
    cam = cam.astype(np.float32)
    origin = (src.min(0) - np.float32(expand) * vs).astype(np.float32)

    def cell(p):
        # f32 arithmetic to match the on-device kernel bit for bit.
        rel = (p.astype(np.float32) - origin) / vs
        i2 = rel.astype(np.int32)
        ok = np.all((rel >= 0) & (i2 < grid_n), axis=-1)
        return i2, ok

    state = np.zeros((grid_n,) * 3, np.int8)  # 0 unknown, 1 occ, 2 free
    ci, ok = cell(src)
    for i, o in zip(ci, ok):
        if o:
            state[tuple(i)] = 1
    occupied_count = int((state == 1).sum())

    closest = src[np.argmin(((src - cam) ** 2).sum(1))]

    if use_fs:
        free = np.zeros_like(state, bool)
        for p in src:
            ray = p - cam
            L = np.linalg.norm(ray)
            if L < 1e-6:
                continue
            d = ray / L
            k = 0
            while k * vs < L and k < ray_steps:
                q = cam + k * vs * d
                i2, o = cell(q[None])
                k += 1
                if not o[0]:
                    continue
                if state[tuple(i2[0])] == 1:
                    break
                free[tuple(i2[0])] = True
        state[free & (state != 1)] = 2

    def count_for(pts):
        """Unique-voxel intersection count of a transformed template."""
        seen = np.zeros_like(state, bool)
        inter = 0
        for p in pts:
            i2, o = cell(p[None])
            if not o[0]:
                continue
            t = tuple(i2[0])
            if seen[t]:
                continue
            if state[t] == 1:
                inter += 1
                seen[t] = True
            elif state[t] == 2:
                inter -= 1
                seen[t] = True
        return inter

    push_dir = (closest - cam) / np.float32(np.linalg.norm(closest - cam))
    push = (push_dir * np.float32(TM_PUSH_DISTANCE)).astype(np.float32)

    best = (0, 0.0, np.zeros(3))
    for ai in range(TM_NUM_ANGLES):
        ang = np.float32(ai) * np.float32(10.0 * np.pi / 180.0)
        ca, sa = np.cos(ang, dtype=np.float32), np.sin(ang, dtype=np.float32)
        R = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], dtype=np.float32)
        rot = (tpl @ R.T + push).astype(np.float32)
        tcl = rot[np.argmin((rot ** 2).sum(1))]
        corr = (closest - tcl).astype(np.float32)
        for dx in range(-TM_NOISE_RANGE, TM_NOISE_RANGE + 1):
            for dy in range(-TM_NOISE_RANGE, TM_NOISE_RANGE + 1):
                off = (corr + np.array([dx * vs, dy * vs, 0.0], np.float32)).astype(np.float32)
                inter = count_for(rot + off)
                if inter > best[0]:
                    best = (inter, ang, push + off)
    return best[0] / max(occupied_count, 1), best[1], best[2], count_for, occupied_count


def _box_cloud(rng, n, size, center):
    """Random points on the surface of an axis-aligned box.  A small jitter
    keeps face points off exact match-grid cell boundaries (coincident face
    coordinates would make whole faces flip cells on 1-ULP differences
    between XLA and BLAS float32 arithmetic)."""
    pts = (rng.rand(n, 3) - 0.5) * size
    axis = rng.randint(0, 3, n)
    side = rng.randint(0, 2, n) * 2 - 1
    for i in range(n):
        pts[i, axis[i]] = side[i] * size[axis[i]] / 2
    pts += rng.randn(n, 3) * 0.004
    return (pts + center).astype(np.float32)


@pytest.mark.parametrize("use_fs", [False, True])
def test_template_match_vs_oracle(use_fs):
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    size = np.array([2.93, 1.37, 1.61])
    center = np.array([1.03, 0.47, 6.11])
    src = _box_cloud(rng, 300, size, center)
    tpl = center_cloud(_box_cloud(rng, 250, size, np.zeros(3)))
    cam = np.zeros(3, np.float32)

    g = MatchGridConfig(grid_n=32, max_source_points=512, max_template_points=512, fs_ray_steps=96)
    src_pad = np.zeros((512, 3), np.float32)
    src_pad[: src.shape[0]] = src
    sv = np.zeros(512, bool)
    sv[: src.shape[0]] = True
    tpl_pad = np.zeros((512, 3), np.float32)
    tpl_pad[: tpl.shape[0]] = tpl
    tv = np.zeros(512, bool)
    tv[: tpl.shape[0]] = True

    res = template_match(
        g, use_fs, jnp.asarray(src_pad), jnp.asarray(sv), jnp.asarray(cam),
        jnp.asarray(tpl_pad), jnp.asarray(tv),
    )
    o_score, o_ang, o_move, count_for, occ_n = oracle_match(src, cam, tpl, use_fs)

    # XLA and BLAS matmuls round differently, so points landing exactly on a
    # match-grid cell boundary can flip cells and near-tie hypotheses can swap
    # winners.  Two robust invariants: (a) the oracle's count of the *jitted
    # winner's* transform matches the jitted score within a couple boundary
    # voxels; (b) neither sweep beats the other by more than that slack.
    T = np.asarray(res.tmatrix)
    aligned = tpl @ T[:3, :3].T + T[:3, 3]
    o_count_of_jit_winner = count_for(aligned)
    assert abs(float(res.score) * occ_n - o_count_of_jit_winner) <= 2.5
    assert abs(float(res.score) - o_score) <= 3.0 / occ_n
    # Sanity: the sweep found a positive-overlap alignment.  (The reference's
    # closest-point snap is a coarse heuristic; on synthetic all-faces box
    # clouds its absolute score is modest, especially with the FS free-space
    # penalty.)
    assert float(res.score) > (0.03 if use_fs else 0.12)


def test_template_match_identifies_rotation():
    """A 90-degree-rotated template should recover ~90 degrees yaw."""
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    size = np.array([3.97, 1.23, 1.79])
    src = _box_cloud(rng, 400, size, np.array([0.0, 0.0, 8.0]))
    ang = np.deg2rad(90.0)
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]])
    tpl = center_cloud(src) @ R  # inverse rotation applied
    g = MatchGridConfig(grid_n=32, max_source_points=512, max_template_points=512)

    pad = lambda a: np.pad(a, ((0, 512 - a.shape[0]), (0, 0))).astype(np.float32)
    vmask = lambda a: np.arange(512) < a.shape[0]
    res = template_match(
        g, False, jnp.asarray(pad(src)), jnp.asarray(vmask(src)),
        jnp.zeros(3, jnp.float32), jnp.asarray(pad(tpl)), jnp.asarray(vmask(tpl)),
    )
    Rb = np.asarray(res.tmatrix)[:3, :3]
    yaw = np.rad2deg(np.arctan2(Rb[0, 2], Rb[0, 0])) % 360
    assert abs(yaw - 90.0) <= 10.0 + 1e-6
    assert float(res.score) > 0.35


def test_pcd_ply_roundtrip(tmp_path):
    from semantic_dsp_map_tpu.io import read_pcd, read_ply, write_pcd, write_ply

    rng = np.random.RandomState(0)
    xyz = rng.randn(100, 3).astype(np.float32)
    rgb = (rng.rand(100, 3) * 255).astype(np.uint8)

    write_pcd(str(tmp_path / "a.pcd"), xyz, rgb)
    back = read_pcd(str(tmp_path / "a.pcd"))
    np.testing.assert_allclose(back, xyz, rtol=1e-6)

    write_pcd(str(tmp_path / "b.pcd"), xyz, binary=False)
    np.testing.assert_allclose(read_pcd(str(tmp_path / "b.pcd")), xyz, atol=1e-5)

    write_ply(str(tmp_path / "c.ply"), xyz, rgb)
    bx, brgb = read_ply(str(tmp_path / "c.ply"))
    np.testing.assert_allclose(bx, xyz, rtol=1e-6)
    np.testing.assert_array_equal(brgb, rgb)


def test_template_bank_folder(tmp_path):
    from semantic_dsp_map_tpu.io import write_pcd

    d = tmp_path / "templates" / "14"
    d.mkdir(parents=True)
    rng = np.random.RandomState(1)
    write_pcd(str(d / "car1.pcd"), rng.randn(50, 3).astype(np.float32))
    write_pcd(str(d / "car2.pcd"), rng.randn(80, 3).astype(np.float32))

    g = MatchGridConfig(max_template_points=64)
    bank = TemplateBank.from_folder(str(tmp_path / "templates"), g)
    assert bank.label.tolist() == [14, 14]
    pts, valid = bank.of_label(14)
    assert pts.shape == (2, 64, 3)
    assert valid[0].sum() == 50 and valid[1].sum() == 64  # 80 subsampled to 64
    # Centered: min+max ~ 0 per axis.
    live = pts[0][valid[0]]
    np.testing.assert_allclose(live.min(0) + live.max(0), 0, atol=1e-5)


def test_mhd_and_outliers():
    rng = np.random.RandomState(2)
    a = rng.randn(50, 3).astype(np.float32)
    assert compute_mhd(a, a) == pytest.approx(0.0, abs=1e-6)
    b = a + np.array([0.5, 0, 0], np.float32)
    assert compute_mhd(a, b) <= 0.5 + 1e-5

    # A dense cluster + a far outlier blob smaller than min_cluster.
    main = rng.rand(3000, 3).astype(np.float32) * 2.0
    noise = rng.rand(30, 3).astype(np.float32) * 0.5 + 50.0
    out = remove_outliers(np.concatenate([main, noise]), min_cluster=50)
    assert out.shape[0] > 0
    assert out[:, 0].max() < 10.0  # outlier blob removed


def test_engine_smoke(tiny_map):
    """Template flag on: a car-labeled cloud triggers the bank match path and
    the step still runs end to end."""
    import jax.numpy as jnp

    from semantic_dsp_map_tpu.config import FilterParams, tiny_test_config
    from semantic_dsp_map_tpu.frontend import MaskKpts
    from semantic_dsp_map_tpu.labels import LabelRegistry
    from semantic_dsp_map_tpu.map import SemanticDSPMap
    from semantic_dsp_map_tpu.ops.templates import MatchGridConfig, TemplateBank

    cfg = tiny_test_config()
    params = FilterParams(if_use_template_matching=True, match_score_threshold=0.1)
    registry = LabelRegistry.default()
    dsp = SemanticDSPMap(cfg, params, registry)

    g = dsp._templates.grid = MatchGridConfig(
        grid_n=32, max_source_points=1024, max_template_points=256
    )
    rng = np.random.RandomState(0)
    dsp._templates.bank = TemplateBank.from_dict(
        {14: [rng.randn(100, 3).astype(np.float32)]}, g
    )

    H, W = cfg.height, cfg.width
    # Keep the wall inside the tiny map: the grid spans z in [-2, 2) m
    # (2^4 voxels x 0.25 m centered on the ego), so depth 2.0 would land
    # exactly on the boundary and be rejected (correctly) by the birth gate.
    depth = np.full((H, W), 1.5, np.float32)
    static = np.full((H, W), 6, np.uint8)
    car = np.zeros((H, W), np.uint8)
    car[8:20, 8:28] = 1
    kpts = np.array([[0, 0, 2], [1, 0, 2], [0, 1, 2], [1, 1, 2], [0, 0, 3]], np.float32)
    masks = [
        MaskKpts(track_id=65535, label="static", mask=static),
        MaskKpts(track_id=7, label="Car", mask=car, kpts_current=kpts, kpts_previous=kpts),
    ]
    for t in range(6):
        result, diag = dsp.update(
            depth, masks, np.zeros(3), np.array([1.0, 0, 0, 0]), time=0.1 * t
        )
    assert np.asarray(result.occ).max() >= 1


@pytest.fixture
def tiny_map():
    return None
