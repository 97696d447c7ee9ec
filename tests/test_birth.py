"""Resampling and slot-constrained insertion vs scalar oracles."""

import numpy as np
import jax.numpy as jnp

from semantic_dsp_map_tpu.config import tiny_test_config
from semantic_dsp_map_tpu.ops.birth import Candidates, insert_particles, resample_voxels
from semantic_dsp_map_tpu.state import (
    STATUS_INVALID,
    STATUS_REGULAR_BORN,
    STATUS_UPDATED,
    init_particles,
    init_scroll,
)

CFG = tiny_test_config()  # K = 3 slots/voxel, trigger = 2


def oracle_resample(weights, statuses, trigger):
    """Scalar model of resampleParticlesInVoxel (semantic_dsp_map.h:1448-1519)
    for one voxel, in float32 like the reference's C++ floats.
    weights/statuses are per-slot lists; returns new lists."""
    f32 = np.float32
    w = [f32(x) for x in weights]
    s = list(statuses)
    wsum = f32(0)
    for wi, si in zip(w, s):
        if si == STATUS_UPDATED:
            wsum = f32(wsum + wi)
    count = sum(1 for si in s if si == STATUS_UPDATED)
    if count <= trigger:
        return w, s, False
    if wsum < 0.01:
        for i in range(len(s)):
            if s[i] == STATUS_UPDATED:
                s[i] = STATUS_INVALID
        return w, s, True
    wpp = f32(min(f32(wsum / trigger), f32(1.0)))
    csum = f32(0)
    thresh = wpp
    for i in range(len(s)):
        if s[i] != STATUS_UPDATED:
            continue
        csum = f32(csum + w[i])
        if csum < thresh:
            s[i] = STATUS_INVALID
        else:
            w[i] = wpp
            thresh = f32(thresh + wpp)
            while csum > thresh:
                thresh = f32(thresh + wpp)
    return w, s, True


def test_resample_matches_oracle():
    rng = np.random.RandomState(3)
    K = CFG.slots_per_voxel
    trigger = (1 << CFG.max_particle_num_per_voxel_n) >> 1
    V = CFG.num_voxels

    particles = init_particles(CFG)
    status = rng.choice(
        [STATUS_INVALID, STATUS_UPDATED, STATUS_REGULAR_BORN], size=(V, K),
        p=[0.3, 0.5, 0.2],
    ).astype(np.int32)
    weight = (rng.rand(V, K) * 0.8).astype(np.float32)
    # Some voxels with tiny weights to hit the wipe path.
    weight[: V // 4] *= 0.002
    particles = particles.replace(
        status=jnp.asarray(status.reshape(-1)),
        weight=jnp.asarray(weight.reshape(-1)),
        stamp=jnp.ones(V * K, jnp.int32),
    )
    target = rng.rand(V) > 0.5

    out = resample_voxels(CFG, particles, jnp.asarray(target))
    out_w = np.asarray(out.weight).reshape(V, K)
    out_s = np.asarray(out.status).reshape(V, K)

    for v in range(0, V, 7):  # sample voxels
        if target[v]:
            ew, es, _ = oracle_resample(weight[v], status[v], trigger)
        else:
            ew, es = list(weight[v]), list(status[v])
        np.testing.assert_allclose(out_w[v], ew, rtol=1e-5, atol=1e-7, err_msg=str(v))
        np.testing.assert_array_equal(out_s[v], es, err_msg=str(v))


def test_insert_first_vacant_and_capacity():
    """Candidates fill vacant slots in slot order; overflow is dropped; lower
    priority wins."""
    K = CFG.slots_per_voxel
    particles = init_particles(CFG)
    scroll = init_scroll(CFG)

    # Voxel containing the origin-ish point; make slot 1 occupied.
    from semantic_dsp_map_tpu.ops import codecs

    p0 = jnp.asarray([[0.1, 0.1, 0.1]], jnp.float32)
    v0 = int(np.asarray(codecs.global_pos_to_voxel(CFG, scroll, p0)[0])[0])
    status = np.asarray(particles.status).reshape(-1, K).copy()
    status[v0, 1] = STATUS_UPDATED
    particles = particles.replace(
        status=jnp.asarray(status.reshape(-1)),
        stamp=particles.stamp.at[v0 * K + 1].set(1),
    )

    # 4 candidates into the same voxel with K=3 slots (1 occupied -> 2 free).
    n = 4
    cand = Candidates(
        pos=jnp.tile(p0, (n, 1)),
        weight=jnp.asarray([0.1, 0.2, 0.3, 0.4], jnp.float32),
        label=jnp.arange(n, dtype=jnp.int32),
        track=jnp.full(n, 7, jnp.int32),
        status=jnp.full(n, STATUS_REGULAR_BORN, jnp.int32),
        stamp=jnp.full(n, 2, jnp.int32),
        forget=jnp.zeros(n, jnp.int32),
        priority=jnp.asarray([5, 2, 9, 0], jnp.int32),
        valid=jnp.ones(n, bool),
    )
    new, accepted, vox = insert_particles(CFG, particles, scroll, cand)
    acc = np.asarray(accepted)
    # Two lowest priorities (3 then 1) accepted.
    np.testing.assert_array_equal(acc, [False, True, False, True])
    s = np.asarray(new.status).reshape(-1, K)[v0]
    w = np.asarray(new.weight).reshape(-1, K)[v0]
    lab = np.asarray(new.label).reshape(-1, K)[v0]
    assert s[0] == STATUS_REGULAR_BORN and s[2] == STATUS_REGULAR_BORN
    # First vacant slot (0) gets the lowest priority candidate (index 3).
    assert lab[0] == 3 and w[0] == np.float32(0.4)
    assert lab[2] == 1 and w[2] == np.float32(0.2)
    # Occupied slot untouched.
    assert s[1] == STATUS_UPDATED


def test_insert_out_of_map_dropped():
    particles = init_particles(CFG)
    scroll = init_scroll(CFG)
    n = 2
    cand = Candidates(
        pos=jnp.asarray([[100.0, 0, 0], [0.1, 0.1, 0.1]], jnp.float32),
        weight=jnp.full(n, 0.05, jnp.float32),
        label=jnp.zeros(n, jnp.int32),
        track=jnp.zeros(n, jnp.int32),
        status=jnp.full(n, STATUS_REGULAR_BORN, jnp.int32),
        stamp=jnp.ones(n, jnp.int32),
        forget=jnp.zeros(n, jnp.int32),
        priority=jnp.arange(n, dtype=jnp.int32),
        valid=jnp.ones(n, bool),
    )
    _, accepted, _ = insert_particles(CFG, particles, scroll, cand)
    np.testing.assert_array_equal(np.asarray(accepted), [False, True])
