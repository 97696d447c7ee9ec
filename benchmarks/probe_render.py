"""Bisect render_occupancy at VKITTI2 scale (ablation: ~475 ms/frame)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from semantic_dsp_map_tpu.config import virtual_kitti2_config  # noqa: E402
from semantic_dsp_map_tpu.ops import codecs  # noqa: E402
from semantic_dsp_map_tpu.state import (  # noqa: E402
    STATUS_GUESSED_BORN,
    STATUS_INVALID,
    STATUS_UPDATED,
    init_map_state,
    particles_vk,
)
from semantic_dsp_map_tpu.config import PARTICLE_OCC_INIT_WEIGHT  # noqa: E402

cfg = virtual_kitti2_config()
V, K = cfg.num_voxels, cfg.slots_per_voxel
rng = np.random.RandomState(0)
state = init_map_state(cfg, 0)
n = V * K
occm = rng.rand(n) < 0.034
state = state.replace(
    particles=state.particles.replace(
        status=jnp.asarray(np.where(occm, STATUS_UPDATED, 0).astype(np.int32)),
        weight=jnp.asarray(np.where(occm, rng.rand(n), 0).astype(np.float32)),
        track=jnp.asarray(rng.randint(0, 65530, n).astype(np.int32)),
        label=jnp.asarray(rng.randint(0, 12, n).astype(np.int32)),
        stamp=jnp.asarray(np.ones(n, np.int32)),
    ),
    voxel_stamp=jnp.asarray((rng.rand(V) < 0.5).astype(np.int32)),
)


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    print(f"{name:<28} {(time.perf_counter()-t0)/iters*1e3:8.1f} ms", flush=True)


def stage(which):
    def fn(st):
        p = particles_vk(cfg, st.particles)
        vox_axis_stamp = codecs.axis_stamps_per_voxel(cfg, st.scroll)
        alive = codecs.particle_alive(p.status, p.stamp, vox_axis_stamp)
        vvalid = codecs.voxel_valid(st.voxel_stamp, vox_axis_stamp)
        w = p.weight
        weight_sum = jnp.sum(jnp.where(alive, w, 0.0), axis=1)
        if which == "sums":
            return weight_sum
        w_clamped = jnp.minimum(w, 1.0)
        guessed = alive & (p.status == STATUS_GUESSED_BORN)
        gc = alive & (p.status == STATUS_UPDATED) & (w_clamped < PARTICLE_OCC_INIT_WEIGHT)
        guessed_weight = jnp.sum(jnp.where(guessed, w_clamped, 0.0), axis=1)
        contrib_mask = alive & ~gc
        contrib = jnp.where(contrib_mask, w_clamped, 0.0)
        track_sum = jnp.zeros((V, K), jnp.float32)
        for j in range(K):
            same = p.track == p.track[:, j : j + 1]
            track_sum = track_sum + jnp.where(same, contrib[:, j : j + 1], 0.0)
        if which == "track_sum":
            return track_sum.reshape(-1)[:8] + weight_sum[:8] + guessed_weight[:8]
        big = jnp.int32(1 << 30)
        cand_track = jnp.where(contrib_mask, p.track, big)
        score_ok = contrib_mask & (track_sum > 0.0)
        best_w = jnp.zeros(V, jnp.float32)
        best_track = jnp.zeros(V, jnp.int32)
        found = jnp.zeros(V, bool)
        for j in range(K):
            tsj = track_sum[:, j]
            tj = cand_track[:, j]
            okj = score_ok[:, j]
            better = okj & (~found | (tsj > best_w) | ((tsj == best_w) & (tj < best_track)))
            best_w = jnp.where(better, tsj, best_w)
            best_track = jnp.where(better, tj, best_track)
            found = found | okj
        if which == "argmax":
            return best_track + weight_sum.astype(jnp.int32)
        best_label = jnp.zeros(V, jnp.int32)
        for j in range(K):
            match = contrib_mask[:, j] & (p.track[:, j] == best_track)
            best_label = jnp.where(match, p.label[:, j], best_label)
        return best_label + best_track + weight_sum.astype(jnp.int32)

    return jax.jit(fn)


from semantic_dsp_map_tpu.ops.render import render_occupancy  # noqa: E402

timeit("full render", lambda s: render_occupancy(cfg, s, 0.5)[1].occ, state)
timeit("sums only", stage("sums"), state)
timeit("`+track_sum KxK", stage("track_sum"), state)
timeit("+argmax", stage("argmax"), state)
timeit("+label", stage("label"), state)
