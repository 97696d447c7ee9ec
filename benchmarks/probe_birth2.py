"""Round-5 bisect of birth_and_resample at VKITTI2 scale on a warmed bench
state: times cumulative prefixes of the _insert_core pipeline (replicated
with early returns) plus the resampling delta."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402
from semantic_dsp_map_tpu import SemanticDSPMap  # noqa: E402
from semantic_dsp_map_tpu.config import FilterParams, virtual_kitti2_config  # noqa: E402
from semantic_dsp_map_tpu.frontend import build_frame_input  # noqa: E402
from semantic_dsp_map_tpu.labels import LabelRegistry  # noqa: E402
from semantic_dsp_map_tpu.map import _move_and_cleanup  # noqa: E402
from semantic_dsp_map_tpu.ops import codecs  # noqa: E402
from semantic_dsp_map_tpu.ops.birth import (  # noqa: E402
    _insert_core,
    birth_and_resample,
    newborn_candidates,
)
from semantic_dsp_map_tpu.ops.blocks import ActiveBlocks, block_layout, group_rank  # noqa: E402
from semantic_dsp_map_tpu.ops.geometry import camera_matrices  # noqa: E402
from semantic_dsp_map_tpu.ops.projection import generate_labeled_cloud  # noqa: E402

cfg = virtual_kitti2_config()
params = FilterParams(
    detection_probability=0.98, noise_number=0.001, nb_ptc_num_per_point=1,
    occupancy_threshold=0.5, if_consider_depth_noise=True,
    depth_noise_model_first_order=0.01, depth_noise_model_zero_order=0.2,
)
reg = LabelRegistry.default()
dsp = SemanticDSPMap(cfg, params, reg)
for t in range(8):
    d, m, p, q = bench.synth_vkitti2_frame(cfg, t)
    dsp.update(d, m, p, q, time=t * 0.1)
state = dsp.state

d, m, p, q = bench.synth_vkitti2_frame(cfg, 8)
f = build_frame_input(cfg, reg, d, m, p, q, 0.8)
r_wc, t_wc, r_cw, t_cw = camera_matrices(f.cam_pos, f.cam_quat)
gt = state.global_time + 1
key = jax.random.PRNGKey(3)

cloud = jax.jit(lambda f: generate_labeled_cloud(
    cfg, params, f.depth, f.track_raster, f.track_label_table,
    r_wc, t_wc, reg.max_movable_instance_id))(f)
jax.block_until_ready(cloud)


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)
    return out


K = cfg.slots_per_voxel
V = cfg.num_voxels
bv, nb, spb = block_layout(cfg)
A = min(cfg.max_birth_blocks, nb)
bv_n = bv.bit_length() - 1

cand_j = jax.jit(lambda cl, k: newborn_candidates(cfg, params, cl, gt, k))
cand = timeit("newborn_candidates", cand_j, cloud, key)


def prefix(stop):
    def fn(particles, cl, k):
        cand = newborn_candidates(cfg, params, cl, gt, k)
        vox, _, _, _, in_map = codecs.global_pos_to_voxel(cfg, state.scroll, cand.pos)
        valid = cand.valid & in_map
        vox_ = jnp.where(valid, vox, V)
        meta = (
            (jnp.clip(cand.forget.astype(jnp.int32), 0, 7) << 27)
            | (jnp.clip(cand.status.astype(jnp.int32), 0, 7) << 24)
            | ((cand.label.astype(jnp.int32) & 0xFF) << 16)
            | (cand.track.astype(jnp.int32) & 0xFFFF)
        )
        ops = [vox_, cand.priority, cand.pos[:, 0], cand.pos[:, 1],
               cand.pos[:, 2], meta]
        sorted_ops = list(jax.lax.sort(tuple(ops), num_keys=2))
        if stop == "sort":
            return sorted_ops[0]
        sv, _pri, spx, spy, spz, smeta = sorted_ops[:6]
        rank = group_rank(sv)
        stage_ok = (sv < V) & (rank < K)
        sblock = sv >> bv_n
        new_block = jnp.concatenate([jnp.ones(1, bool), sblock[1:] != sblock[:-1]])
        new_block &= sv < V
        block_rank = jnp.cumsum(new_block.astype(jnp.int32)) - 1
        n_blocks = jnp.maximum(block_rank[-1] + 1, 0)
        ids = (nb + jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0).squeeze(-1)).at[
            jnp.where(new_block & (block_rank < A), block_rank, A)
        ].set(jnp.minimum(sblock, nb - 1), mode="drop")
        if stop == "blocks":
            return ids
        N = cand.pos.shape[0]
        dest_ok = stage_ok & (block_rank < A)
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
        dest = jnp.where(
            dest_ok,
            block_rank * spb + (sv & (bv - 1)) * K + rank,
            A * spb + iota_n,
        )

        def stage(fill, vals, dtype):
            return (
                jnp.full(A * spb, fill, dtype)
                .at[dest]
                .set(vals.astype(dtype), mode="drop", unique_indices=True)
                .reshape(A, spb)
            )

        in_px = stage(0.0, spx, jnp.float32)
        in_py = stage(0.0, spy, jnp.float32)
        in_pz = stage(0.0, spz, jnp.float32)
        in_meta = stage(-1, smeta, jnp.int32)
        if stop == "staged":
            return in_px, in_py, in_pz, in_meta
        return None
    return jax.jit(fn)


timeit("cand+vox+sort", prefix("sort"), state.particles, cloud, key)
timeit("... +block list", prefix("blocks"), state.particles, cloud, key)
timeit("... +staging scatters", prefix("staged"), state.particles, cloud, key)


def ins_nores(particles, cl, k):
    cand = newborn_candidates(cfg, params, cl, gt, k)
    from semantic_dsp_map_tpu.config import PARTICLE_OCC_INIT_WEIGHT
    res = _insert_core(
        cfg, particles, state.scroll, cand, resample_targets=False,
        need_src=False, uniform_weight=PARTICLE_OCC_INIT_WEIGHT,
        uniform_stamp=gt,
    )
    return res.particles, res.accepted_count


timeit("insert (no resample)", jax.jit(ins_nores), state.particles, cloud, key)

full = jax.jit(lambda pt, cl, k: birth_and_resample(
    cfg, params, pt, state.scroll, cl, gt, k)[:3])
timeit("birth_and_resample (full)", full, state.particles, cloud, key)
