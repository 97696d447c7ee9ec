"""Bisect the do_move branch of _move_and_cleanup at VKITTI2 shape."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from semantic_dsp_map_tpu.config import FilterParams, virtual_kitti2_config  # noqa: E402
from semantic_dsp_map_tpu.ops import codecs  # noqa: E402
from semantic_dsp_map_tpu.ops.birth import Candidates, _insert_core  # noqa: E402
from semantic_dsp_map_tpu.ops.blocks import (  # noqa: E402
    block_layout,
    gather_rows,
    mask_to_block_mask,
    row_valid,
    scatter_rows,
    select_blocks,
)
from semantic_dsp_map_tpu.state import STATUS_INVALID, STATUS_UPDATED, init_map_state  # noqa: E402

cfg = virtual_kitti2_config()
params = FilterParams(nb_ptc_num_per_point=1, if_consider_depth_noise=True)
V, K = cfg.num_voxels, cfg.slots_per_voxel
bv, nb, spb = block_layout(cfg)
A = min(cfg.max_moving_blocks, nb)
rng = np.random.RandomState(0)

state = init_map_state(cfg, 0)
p = state.particles
occ = rng.rand(V, K) < 0.034
car = occ & (rng.rand(V, K) < 0.03)
track = np.where(car, 3, 65529).astype(np.int32)
status = np.where(occ, STATUS_UPDATED, 0).astype(np.int32)
p = p.replace(
    px=jnp.asarray(np.where(occ, rng.randn(V, K) * 10, 0).astype(np.float32)),
    py=jnp.asarray(np.where(occ, rng.randn(V, K) * 3, 0).astype(np.float32)),
    pz=jnp.asarray(np.where(occ, rng.rand(V, K) * 25, 0).astype(np.float32)),
    weight=jnp.asarray(np.where(occ, rng.rand(V, K), 0).astype(np.float32)),
    track=jnp.asarray(track),
    status=jnp.asarray(status),
    stamp=jnp.asarray(np.ones((V, K), np.int32)),
)
O = cfg.max_objects
T = np.broadcast_to(np.eye(4, dtype=np.float32), (O, 4, 4)).copy()
T[0, 0, 3] = 0.4
tmatrix = jnp.asarray(T)
track_ids = jnp.asarray(np.where(np.arange(O) == 0, 3, -1).astype(np.int32))
mv_obj = jnp.asarray(np.arange(O) == 0)
key = jax.random.PRNGKey(0)
gt = jnp.int32(2)
scroll = state.scroll


def stagefn(stage):
    def fn(particles, k):
        vox_axis = codecs.axis_stamps_per_voxel(cfg, scroll)
        alive = codecs.particle_alive(particles.status, particles.stamp, vox_axis)
        move_p = alive & (particles.track == 3)
        if stage == 0:
            return move_p
        blocks = select_blocks(mask_to_block_mask(move_p, bv), A)
        rv = row_valid(blocks)
        g = lambda f: gather_rows(f, blocks, bv)
        bpx, bpy, bpz = g(particles.px), g(particles.py), g(particles.pz)
        bw, blab, btrk = g(particles.weight), g(particles.label), g(particles.track)
        bst, bstamp, bfg = g(particles.status), g(particles.stamp), g(particles.forget)
        bmove = g(move_p) & rv[:, None]
        if stage == 1:
            return bpx, bmove
        def obj_body(o, pos):
            nx_, ny_, nz_ = pos
            Tm = tmatrix[o]
            match = bmove & (btrk == track_ids[o]) & mv_obj[o]
            tx = Tm[0, 0] * bpx + Tm[0, 1] * bpy + Tm[0, 2] * bpz + Tm[0, 3]
            ty = Tm[1, 0] * bpx + Tm[1, 1] * bpy + Tm[1, 2] * bpz + Tm[1, 3]
            tz = Tm[2, 0] * bpx + Tm[2, 1] * bpy + Tm[2, 2] * bpz + Tm[2, 3]
            return (jnp.where(match, tx, nx_), jnp.where(match, ty, ny_),
                    jnp.where(match, tz, nz_))
        nx_, ny_, nz_ = jax.lax.fori_loop(0, O, obj_body, (bpx, bpy, bpz))
        noise = jax.random.normal(k, (3,) + bpx.shape, jnp.float32) * params.prediction_stddev
        nx_, ny_, nz_ = nx_ + noise[0], ny_ + noise[1], nz_ + noise[2]
        if stage == 2:
            return nx_, ny_, nz_
        bst_del = jnp.where(bmove, STATUS_INVALID, bst)
        particles = particles.replace(
            status=scatter_rows(particles.status, blocks, bv, bst_del)
        )
        if stage == 3:
            return particles.status
        n = A * spb
        cand = Candidates(
            pos=jnp.stack([nx_.reshape(-1), ny_.reshape(-1), nz_.reshape(-1)], axis=-1),
            weight=bw.reshape(-1),
            label=blab.reshape(-1),
            track=btrk.reshape(-1),
            status=bst.reshape(-1),
            stamp=bstamp.reshape(-1),
            forget=bfg.reshape(-1),
            priority=jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1),
            valid=bmove.reshape(-1),
        )
        res = _insert_core(cfg, particles, scroll, cand, resample_targets=False)
        return res.particles.status, res.accepted_count

    return jax.jit(fn)


def timeit(name, fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:<26} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)


for s, name in enumerate(["mask", "gather", "transform", "delete", "insert"]):
    timeit(f"stage {s} ({name})", stagefn(s), p, key)
