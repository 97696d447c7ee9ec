"""Bisect birth_and_resample: time cumulative prefixes of the _insert_core
pipeline (replicated here with early returns) on realistic zed2 data."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from semantic_dsp_map_tpu.config import FilterParams, zed2_config  # noqa: E402
from semantic_dsp_map_tpu.ops import codecs  # noqa: E402
from semantic_dsp_map_tpu.ops.birth import (  # noqa: E402
    Candidates,
    newborn_candidates,
    resample_slots,
)
from semantic_dsp_map_tpu.ops.blocks import (  # noqa: E402
    ActiveBlocks,
    block_layout,
    gather_rows,
    group_rank,
    scatter_rows,
)
from semantic_dsp_map_tpu.state import STATUS_INVALID, init_map_state  # noqa: E402
from semantic_dsp_map_tpu.ops.projection import LabeledCloud  # noqa: E402

cfg = zed2_config()
params = FilterParams(nb_ptc_num_per_point=1, if_consider_depth_noise=True)
K = cfg.slots_per_voxel
V = cfg.num_voxels
bv, nb, spb = block_layout(cfg)
A = min(cfg.max_birth_blocks, nb)
H, W = cfg.height, cfg.width

rng = np.random.RandomState(0)
state = init_map_state(cfg, 0)
particles = state.particles
scroll = state.scroll
gt = jnp.int32(3)
key = jax.random.PRNGKey(0)

cloud = LabeledCloud(
    pos=jnp.asarray((rng.randn(H, W, 3) * 2 + np.array([0, 0, 5])).astype(np.float32)),
    sigma=jnp.asarray((0.2 + rng.rand(H, W) * 0.2).astype(np.float32)),
    label=jnp.asarray(rng.randint(0, 10, (H, W)).astype(np.int32)),
    track=jnp.asarray(rng.randint(0, 5, (H, W)).astype(np.int32)),
    valid=jnp.asarray(rng.rand(H, W) < 0.9),
)


def prefix(stage: int):
    def fn(particles, scroll, cloud, key):
        cand = newborn_candidates(cfg, params, cloud, gt, key)
        if stage == 0:
            return cand
        N = cand.pos.shape[0]
        bv_n = bv.bit_length() - 1
        vox, _, _, _, in_map = codecs.global_pos_to_voxel(cfg, scroll, cand.pos)
        valid = cand.valid & in_map
        vox = jnp.where(valid, vox, V)
        meta = (
            (jnp.clip(cand.forget, 0, 7) << 27)
            | (jnp.clip(cand.status, 0, 7) << 24)
            | ((cand.label & 0xFF) << 16)
            | (cand.track & 0xFFFF)
        )
        if stage == 1:
            return vox, meta
        (sv, _pri, spx, spy, spz, sw, sstamp, smeta, ssrc) = jax.lax.sort(
            (vox, cand.priority, cand.pos[:, 0], cand.pos[:, 1], cand.pos[:, 2],
             cand.weight, cand.stamp, meta,
             jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)),
            num_keys=2,
        )
        rank = group_rank(sv)
        stage_ok = (sv < V) & (rank < K)
        if stage == 2:
            return sv, rank, stage_ok
        sblock = sv >> bv_n
        new_block = jnp.concatenate([jnp.ones(1, bool), sblock[1:] != sblock[:-1]])
        new_block &= sv < V
        block_rank = jnp.cumsum(new_block.astype(jnp.int32)) - 1
        n_blocks = jnp.maximum(block_rank[-1] + 1, 0)
        ids = (nb + jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0).squeeze(-1)).at[
            jnp.where(new_block & (block_rank < A), block_rank, A)
        ].set(jnp.minimum(sblock, nb - 1), mode="drop")
        blocks = ActiveBlocks(
            ids=ids, count=jnp.minimum(n_blocks, A),
            overflow=jnp.maximum(n_blocks - A, 0),
        )
        if stage == 3:
            return blocks
        dest_ok = stage_ok & (block_rank < A)
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
        dest = jnp.where(
            dest_ok, block_rank * spb + (sv & (bv - 1)) * K + rank, A * spb + iota_n
        )

        def stage_f(fill, vals, dtype):
            return (
                jnp.full(A * spb, fill, dtype)
                .at[dest]
                .set(vals.astype(dtype), mode="drop", unique_indices=True)
                .reshape(A, spb)
            )

        in_px = stage_f(0.0, spx, jnp.float32)
        in_py = stage_f(0.0, spy, jnp.float32)
        in_pz = stage_f(0.0, spz, jnp.float32)
        in_w = stage_f(0.0, sw, jnp.float32)
        in_stamp = stage_f(0, sstamp, jnp.int32)
        in_meta = stage_f(-1, smeta, jnp.int32)
        staged_src = stage_f(N, ssrc, jnp.int32)
        if stage == 4:
            return in_px, in_py, in_pz, in_w, in_stamp, in_meta, staged_src
        g = lambda f: gather_rows(f, blocks, bv)
        bpx, bpy, bpz = g(particles.px), g(particles.py), g(particles.pz)
        bw, blab, btrk = g(particles.weight), g(particles.label), g(particles.track)
        bst, bstamp, bfg = g(particles.status), g(particles.stamp), g(particles.forget)
        vox_axis = codecs.axis_stamps_per_voxel(cfg, scroll)
        baxis = jnp.repeat(gather_rows(vox_axis, blocks, bv), K, axis=1)
        stale = (bst != STATUS_INVALID) & (bstamp < baxis)
        bst = jnp.where(stale, STATUS_INVALID, bst)
        if stage == 5:
            return bpx, bpy, bpz, bw, blab, btrk, bst, bstamp, bfg
        K3 = (A, bv, K)
        targeted = jnp.any((in_meta >= 0).reshape(K3), axis=2)
        rst, rw = resample_slots(cfg, bst.reshape(K3), bw.reshape(K3), targeted)
        bst = rst.reshape(bst.shape)
        bw = rw.reshape(bw.shape)
        if stage == 6:
            return bst, bw
        return None

    return jax.jit(fn)


for s, name in enumerate(["candidates", "vox+meta", "sort+rank", "blocks",
                          "staging x7", "gather+stale", "resample"]):
    fn = prefix(s)
    out = jax.block_until_ready(fn(particles, scroll, cloud, key))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(particles, scroll, cloud, key)
    jax.block_until_ready(out)
    print(f"prefix {s} ({name:<14}) {(time.perf_counter()-t0)/10*1e3:8.2f} ms", flush=True)

from semantic_dsp_map_tpu.ops.birth import birth_and_resample  # noqa: E402

fn = jax.jit(lambda p, s, c, k: birth_and_resample(cfg, params, p, s, c, gt, k))
out = jax.block_until_ready(fn(particles, scroll, cloud, key))
t0 = time.perf_counter()
for _ in range(10):
    out = fn(particles, scroll, cloud, key)
jax.block_until_ready(out)
print(f"full birth_and_resample        {(time.perf_counter()-t0)/10*1e3:8.2f} ms")
