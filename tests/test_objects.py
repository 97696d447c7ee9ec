"""Object layer: Kabsch/RANSAC fits, Bayesian moving filter, velocity window."""

import numpy as np
import jax
import jax.numpy as jnp

from semantic_dsp_map_tpu.config import FilterParams, tiny_test_config
from semantic_dsp_map_tpu.objects import (
    ObservedInstances,
    expire_objects,
    object_level_update,
    track_lookup_table,
)
from semantic_dsp_map_tpu.ops.geometry import camera_matrices
from semantic_dsp_map_tpu.ops.transforms import apply_transform, kabsch, ransac_transform
from semantic_dsp_map_tpu.state import init_objects

CFG = tiny_test_config()
PARAMS = FilterParams(
    bayesian_movement_distance_threshold=0.1,
    bayesian_movement_probability_threshold=0.69,
    bayesian_movement_increment=0.1,
    bayesian_movement_decrement=0.15,
)


def random_rigid(rng):
    A = rng.randn(3, 3)
    U, _, Vt = np.linalg.svd(A)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        U[:, 2] *= -1
        R = U @ Vt
    t = rng.randn(3)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T.astype(np.float32)


def test_kabsch_recovers_transform():
    rng = np.random.RandomState(0)
    T = random_rigid(rng)
    P = rng.randn(10, 3).astype(np.float32)
    Q = (P @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    T_est, ok = kabsch(jnp.asarray(P), jnp.asarray(Q), jnp.ones(10, bool))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(T_est), T, atol=5e-3)  # f32 SVD


def test_ransac_rejects_outliers():
    rng = np.random.RandomState(1)
    T = random_rigid(rng)
    n = 20
    P = rng.randn(n, 3).astype(np.float32)
    Q = (P @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    Q[0] += 10.0
    Q[5] -= 7.0
    T_est, inl, n_inl, mse, first = ransac_transform(
        jax.random.PRNGKey(0), jnp.asarray(P), jnp.asarray(Q),
        jnp.ones(n, bool), 100, 0.5, True,
    )
    assert int(n_inl) == n - 2
    inl = np.asarray(inl)
    assert not inl[0] and not inl[5]
    assert int(first) == 1
    assert float(mse) < 1e-4
    np.testing.assert_allclose(np.asarray(T_est), T, atol=5e-3)


def _obs(track, label, kpts_prev, kpts_curr):
    I, Kp = CFG.max_instances_per_frame, CFG.max_keypoints
    valid = np.zeros(I, bool)
    tr = np.zeros(I, np.int32)
    lb = np.full(I, -1, np.int32)
    kc = np.zeros((I, Kp, 3), np.float32)
    kp = np.zeros((I, Kp, 3), np.float32)
    cnt = np.zeros(I, np.int32)
    valid[0] = True
    tr[0] = track
    lb[0] = label
    n = kpts_curr.shape[0]
    kc[0, :n] = kpts_curr
    kp[0, :n] = kpts_prev
    cnt[0] = n
    return ObservedInstances(
        valid=jnp.asarray(valid), track=jnp.asarray(tr), label=jnp.asarray(lb),
        kpts_curr=jnp.asarray(kc), kpts_prev=jnp.asarray(kp), kpts_count=jnp.asarray(cnt),
    )


def _run_update(objects, obs, gt, time_now=0.0, prev_time=0.0):
    cam_pos = jnp.zeros(3, jnp.float32)
    quat = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    _, _, r_cw, t_cw = camera_matrices(cam_pos, quat)
    return object_level_update(
        CFG, PARAMS, objects, obs, cam_pos, r_cw, t_cw,
        jnp.float32(time_now), jnp.float32(prev_time), jnp.int32(gt),
        jax.random.PRNGKey(gt),
    )


def test_new_object_then_moving_decision():
    rng = np.random.RandomState(2)
    objects = init_objects(CFG)

    # Frame 1: new object appears within range (map half * 1.2 = 2.4m).
    kpts = rng.randn(8, 3).astype(np.float32) * 0.3 + np.array([0, 0, 1.5], np.float32)
    obs = _obs(3, 14, kpts, kpts)
    objects = _run_update(objects, obs, gt=1)
    v = np.asarray(objects.valid)
    assert v.sum() == 1
    assert int(np.asarray(objects.track_id)[v][0]) == 3
    assert not bool(np.asarray(objects.has_moved_record)[v][0])
    assert float(np.asarray(objects.moved_probability)[v][0]) == 0.5

    # Frames 2..4: the object translates by 0.5m each frame -> probability
    # climbs by +0.1 per frame; threshold 0.69 crossed on frame 4 (0.5->0.8).
    shift = np.array([0.5, 0, 0], np.float32)
    cur = kpts
    for t in range(2, 5):
        prev = cur
        cur = prev + shift
        obs = _obs(3, 14, prev, cur)
        objects = _run_update(objects, obs, gt=t, time_now=0.1 * t, prev_time=0.1 * (t - 1))
    v = np.asarray(objects.valid)
    p = float(np.asarray(objects.moved_probability)[v][0])
    assert abs(p - 0.8) < 1e-5, p
    assert bool(np.asarray(objects.moving)[v][0])
    assert bool(np.asarray(objects.has_moved_record)[v][0])
    # Transform ~ +0.5m x translation.
    T = np.asarray(objects.tmatrix)[v][0]
    np.testing.assert_allclose(T[:3, 3], shift, atol=1e-2)  # f32 SVD
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-2)
    # Velocity: window dt is the 0.15 default; the object became "moving" on
    # frame 3 (prob 0.7 > 0.69), so the window holds 2 entries by frame 4 and
    # the reference's divide-by-(n-1) quirk (object_layer.h:158) doubles the
    # per-entry velocity: v = 0.5/0.15 * 2/(2-1).
    assert bool(np.asarray(objects.vel_valid)[v][0])
    vel = np.asarray(objects.velocity)[v][0]
    np.testing.assert_allclose(vel, shift / 0.15 * 2.0, atol=5e-2)  # f32 SVD noise


def test_static_object_probability_drops():
    rng = np.random.RandomState(3)
    objects = init_objects(CFG)
    kpts = rng.randn(8, 3).astype(np.float32) * 0.3 + np.array([0, 0, 1.5], np.float32)
    obs = _obs(5, 14, kpts, kpts)
    objects = _run_update(objects, obs, gt=1)
    for t in range(2, 5):
        obs = _obs(5, 14, kpts, kpts)  # no motion
        objects = _run_update(objects, obs, gt=t)
    v = np.asarray(objects.valid)
    p = float(np.asarray(objects.moved_probability)[v][0])
    assert abs(p - (0.5 - 3 * 0.15)) < 1e-5
    assert not bool(np.asarray(objects.moving)[v][0])


def test_out_of_range_object_not_added():
    objects = init_objects(CFG)
    far = np.full((6, 3), 50.0, np.float32)
    obs = _obs(9, 14, far, far)
    objects = _run_update(objects, obs, gt=1)
    assert np.asarray(objects.valid).sum() == 0


def test_expiry_and_lookup():
    rng = np.random.RandomState(4)
    objects = init_objects(CFG)
    kpts = rng.randn(8, 3).astype(np.float32) * 0.2 + np.array([0, 0, 1.0], np.float32)
    obs = _obs(2, 14, kpts, kpts)
    objects = _run_update(objects, obs, gt=1)
    # Force it moving with a record.
    objects = objects.replace(
        moving=objects.moving | objects.valid,
        has_moved_record=objects.has_moved_record | objects.valid,
    )
    table = np.asarray(track_lookup_table(objects))
    assert table[2] >= 0

    params = FilterParams(max_observation_lost_time=5)
    objects2, expired = expire_objects(params, objects, jnp.int32(3))
    assert np.asarray(expired).sum() == 0
    objects2, expired = expire_objects(params, objects, jnp.int32(10))
    assert np.asarray(expired).sum() == 1
    assert np.asarray(objects2.valid).sum() == 0
