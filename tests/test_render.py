"""Occupancy render vs a scalar oracle of calculateWeightAndSemanticsInVoxel +
determineIfVoxelOccupied (operations.h:390-448, 623-639)."""

import numpy as np
import jax.numpy as jnp

from semantic_dsp_map_tpu.config import tiny_test_config
from semantic_dsp_map_tpu.ops.render import render_occupancy
from semantic_dsp_map_tpu.state import (
    STATUS_GUESSED_BORN,
    STATUS_INVALID,
    STATUS_REGULAR_BORN,
    STATUS_UPDATED,
    init_map_state,
)

CFG = tiny_test_config()
INIT_W = 0.05


def oracle_voxel(weights, statuses, tracks, labels, voxel_observed, threshold):
    """One-voxel oracle.  Returns (occ, label, track, new_weights, new_statuses)."""
    w = [np.float32(x) for x in weights]
    s = list(statuses)
    if not voxel_observed:
        return -1, 0, 0, w, s

    weight_sum = np.float32(0)
    guessed = np.float32(0)
    track_w = {}
    track_l = {}
    for i in range(len(w)):
        if s[i] == STATUS_INVALID:
            continue
        weight_sum = np.float32(weight_sum + w[i])
        if w[i] > 1.0:
            w[i] = np.float32(1.0)
        if s[i] == STATUS_GUESSED_BORN:
            guessed = np.float32(guessed + w[i])
        elif s[i] == STATUS_UPDATED and w[i] < INIT_W:
            s[i] = STATUS_INVALID
            continue
        track_w[tracks[i]] = np.float32(track_w.get(tracks[i], np.float32(0)) + w[i])
        track_l[tracks[i]] = labels[i]

    best_t, best_l, best = 0, 0, np.float32(0)
    for t in sorted(track_w):  # std::map ascending order, strict '>'
        if track_w[t] > best:
            best = track_w[t]
            best_t = t
            best_l = track_l[t]

    if weight_sum > threshold:
        occ = 1
    elif guessed >= INIT_W:
        occ = 2
    else:
        occ = 0
    return occ, best_l, best_t, w, s


def test_render_matches_oracle():
    rng = np.random.RandomState(5)
    V, K = CFG.num_voxels, CFG.slots_per_voxel
    state = init_map_state(CFG)

    status = rng.choice(
        [STATUS_INVALID, STATUS_UPDATED, STATUS_REGULAR_BORN, STATUS_GUESSED_BORN],
        size=(V, K), p=[0.3, 0.4, 0.2, 0.1],
    ).astype(np.int32)
    weight = (rng.rand(V, K) * 1.4).astype(np.float32)
    weight[: V // 8] *= 0.05  # hit the GC path
    track = rng.randint(0, 4, (V, K)).astype(np.int32)
    label = rng.randint(0, 8, (V, K)).astype(np.int32)
    vstamp = (rng.rand(V) > 0.2).astype(np.int32)  # some voxels unobserved

    state = state.replace(
        particles=state.particles.replace(
            status=jnp.asarray(status.reshape(-1)),
            weight=jnp.asarray(weight.reshape(-1)),
            track=jnp.asarray(track.reshape(-1)),
            label=jnp.asarray(label.reshape(-1)),
            stamp=jnp.ones(V * K, jnp.int32),
        ),
        voxel_stamp=jnp.asarray(vstamp),
    )

    thr = 0.3
    particles, res = render_occupancy(CFG, state, thr)
    occ = np.asarray(res.occ)
    olab = np.asarray(res.label)
    otrk = np.asarray(res.track)
    nw = np.asarray(particles.weight).reshape(V, K)
    ns = np.asarray(particles.status).reshape(V, K)

    for v in range(0, V, 11):
        eo, el, et, ew, es = oracle_voxel(
            weight[v], status[v], track[v], label[v], vstamp[v] > 0, thr
        )
        assert occ[v] == eo, (v, occ[v], eo)
        if eo >= 0:
            assert otrk[v] == et, (v, otrk[v], et)
            assert olab[v] == el, (v, olab[v], el)
        np.testing.assert_allclose(nw[v], ew, rtol=1e-6)
        np.testing.assert_array_equal(ns[v], es)
