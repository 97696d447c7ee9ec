"""Fine-grained observe_and_update stage timing at VKITTI2 scale.

Sub-jits on a warmed state; each stage timed with real readback sync.  Some
double-counting vs the fused step is expected (XLA fuses across stages), but
this locates the dominant primitive costs.
"""

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
from semantic_dsp_map_tpu.ops import codecs  # noqa: E402
from semantic_dsp_map_tpu.ops.blocks import (  # noqa: E402
    block_layout, gather_rows, mask_to_block_mask, select_blocks,
)
from semantic_dsp_map_tpu.ops.geometry import camera_matrices, project_to_image_xyz  # noqa: E402
from semantic_dsp_map_tpu.ops.projection import generate_labeled_cloud  # noqa: E402
from semantic_dsp_map_tpu.state import particles_vk, STATUS_INVALID  # noqa: E402

cfg = virtual_kitti2_config()
params = FilterParams(
    detection_probability=0.98, noise_number=0.001, nb_ptc_num_per_point=1,
    occupancy_threshold=0.5, if_consider_depth_noise=True,
    depth_noise_model_first_order=0.01, depth_noise_model_zero_order=0.2,
)
reg = LabelRegistry.default()
dsp = SemanticDSPMap(cfg, params, reg)
for t in range(6):
    d, m, p, q = bench.synth_vkitti2_frame(cfg, t)
    dsp.update(d, m, p, q, time=t * 0.1)
state = dsp.state

d, m, p, q = bench.synth_vkitti2_frame(cfg, 6)
f = build_frame_input(cfg, reg, d, m, p, q, 0.6)
r_wc, t_wc, r_cw, t_cw = camera_matrices(f.cam_pos, f.cam_quat)

K = cfg.slots_per_voxel
bv, nb, spb = block_layout(cfg)
A = min(cfg.max_active_blocks, nb)
C = min(cfg.max_table_entries, A * spb)
HW = cfg.height * cfg.width


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)
    return out


@jax.jit
def front(particles, scroll):
    pv = particles_vk(cfg, particles)
    vox_axis = codecs.axis_stamps_per_voxel(cfg, scroll)
    alive = codecs.particle_alive(pv.status, pv.stamp, vox_axis)
    _, _, _, proj_ok = project_to_image_xyz(
        cfg, r_cw, t_cw, pv.px, pv.py, pv.pz
    )
    cand = proj_ok & alive
    has_alive = jnp.any(alive, axis=1)
    bm = mask_to_block_mask(cand, bv)
    return bm, has_alive

bm, has_alive = timeit("front (dense cand pass)", front, state.particles, state.scroll)
print("active blocks:", int(np.asarray(jnp.sum(bm.astype(jnp.int32)))))


@jax.jit
def pick(bm):
    return select_blocks(bm, A)

blocks = timeit("select_blocks", pick, bm)


@jax.jit
def gathers(particles, scroll, blocks):
    pv = particles_vk(cfg, particles)
    vox_axis = codecs.axis_stamps_per_voxel(cfg, scroll)
    g = lambda fld: gather_rows(fld, blocks, bv)
    out = (g(pv.px), g(pv.py), g(pv.pz), g(pv.weight), g(pv.status),
           g(pv.stamp), g(pv.forget), g(pv.track),
           jnp.repeat(gather_rows(vox_axis, blocks, bv), K, axis=1))
    return out

gath = timeit("9x row gathers", gathers, state.particles, state.scroll, blocks)
bpx, bpy, bpz, bw, bst, bstamp, bforget, btrack, baxis = gath


@jax.jit
def work_and_sort(bpx, bpy, bpz, bw, bst, bstamp, bforget, btrack, baxis):
    not_invalid = bst != STATUS_INVALID
    fresh = bstamp >= baxis
    balive = not_invalid & fresh
    brow, bcol, bcamz, bok = project_to_image_xyz(cfg, r_cw, t_cw, bpx, bpy, bpz)
    bcand = bok & balive
    pix = jnp.where(bcand, brow * cfg.width + bcol, HW)
    n_work = A * spb
    src = jax.lax.broadcasted_iota(jnp.int32, (n_work, 1), 0).squeeze(-1)
    meta = (btrack.astype(jnp.int32) << 8) | (bforget.astype(jnp.int32) & 0xFF)
    out = jax.lax.sort(
        (pix.reshape(-1), bcamz.reshape(-1), bpx.reshape(-1), bpy.reshape(-1),
         bpz.reshape(-1), bw.reshape(-1), meta.reshape(-1), src),
        num_keys=2,
    )
    return tuple(o[:C] for o in out)

sorted_ = timeit("proj + 8-operand sort", work_and_sort, *gath)
pix_s, camz_s, px_s, py_s, pz_s, w_s, meta_s, src_s = sorted_

depth_j = jnp.asarray(f.depth)


@jax.jit
def classify(pix_s, camz_s):
    real = pix_s < HW
    depth_at = depth_j.reshape(-1)[jnp.minimum(pix_s, HW - 1)]
    one_sigma = 1.0 + cfg.depth_error_stddev_at_one_meter
    far_free = real & (depth_at > cfg.depth_range_max)
    occluded = real & ~far_free & (camz_s > depth_at * one_sigma)
    visible = real & ~far_free & ~occluded
    return visible, far_free

vis_ff = timeit("classify (depth gather @C)", classify, pix_s, camz_s)


@jax.jit
def backscatter(visible, w_s, meta_s, src_s):
    n_work = A * spb
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0).squeeze(-1)
    back_idx = jnp.where(visible, src_s, n_work + iota_c)
    w_back = jnp.zeros(n_work, jnp.float32).at[back_idx].set(
        w_s, mode="drop", unique_indices=True).reshape(A, spb)
    m_back = jnp.zeros(n_work, jnp.int32).at[back_idx].set(
        meta_s, mode="drop", unique_indices=True).reshape(A, spb)
    return w_back, m_back

timeit("2x back-scatter @C", backscatter, vis_ff[0], w_s, meta_s, src_s)


@jax.jit
def tablegather(pix_s, visible):
    # stand-in for the nw/nf gathers from the [S, H, W] tables
    tbl = jnp.arange(cfg.phd_pixel_table_slots * HW, dtype=jnp.float32)
    dest = jnp.where(visible, pix_s, 0)
    a = tbl[dest]
    b = tbl[dest + 1]
    return a, b

timeit("2x table gather @C", tablegather, pix_s, vis_ff[0])
