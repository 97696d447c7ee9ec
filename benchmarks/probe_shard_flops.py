"""Per-stage compiled-FLOP breakdown of the sharded step vs the 1-device
step at the weak-scaling 'medium' workload (round-5: locate the 2.2x
per-device FLOP overhead WEAKSCALING.json reports at D=8).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/probe_shard_flops.py
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_platforms", "cpu")

from jax.sharding import PartitionSpec as P  # noqa: E402

from semantic_dsp_map_tpu.config import FilterParams  # noqa: E402
from semantic_dsp_map_tpu.frontend import MaskKpts, build_frame_input  # noqa: E402
from semantic_dsp_map_tpu.labels import LabelRegistry  # noqa: E402
from semantic_dsp_map_tpu.parallel.distributed import _base_config  # noqa: E402
from semantic_dsp_map_tpu.parallel.sharding import make_mesh, shard_state  # noqa: E402
from semantic_dsp_map_tpu.state import init_map_state  # noqa: E402

D = 8
params = FilterParams(if_consider_depth_noise=True, nb_ptc_num_per_point=1,
                      depth_noise_model_zero_order=0.2)
base = _base_config("medium")
grown = dataclasses.replace(
    base,
    voxel_num_axis_z_n=base.voxel_num_axis_z_n + 3,
    image_height=base.image_height * D,
    camera_fy=base.camera_fy * D,
    camera_cy=base.camera_cy * D,
    max_active_blocks=base.max_active_blocks * D,
    max_birth_blocks=base.max_birth_blocks * D,
    max_moving_blocks=base.max_moving_blocks * D,
    max_table_entries=base.max_table_entries * D,
    corner_gather_blocks=base.corner_gather_blocks * D,
)
registry = LabelRegistry.default()


def frame_for(cfg):
    H, W = cfg.height, cfg.width
    depth = (1.0 + np.arange(H, dtype=np.float32)[:, None] / H) * np.ones((1, W), np.float32)
    return build_frame_input(
        cfg, registry, depth,
        [MaskKpts(track_id=65535, label="static", mask=np.full((H, W), 5, np.uint8))],
        np.zeros(3, np.float32), np.array([1, 0, 0, 0], np.float32), 0.0,
    )


def flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    return c.cost_analysis().get("flops", 0.0) / 1e9


# ---------------- 1-device stage FLOPs ----------------
from semantic_dsp_map_tpu.map import _move_and_cleanup, build_frame_step  # noqa: E402
from semantic_dsp_map_tpu.objects import expire_objects  # noqa: E402
from semantic_dsp_map_tpu.ops import codecs  # noqa: E402
from semantic_dsp_map_tpu.ops.birth import birth_and_resample  # noqa: E402
from semantic_dsp_map_tpu.ops.geometry import camera_matrices  # noqa: E402
from semantic_dsp_map_tpu.ops.observe import observe_and_update  # noqa: E402
from semantic_dsp_map_tpu.ops.projection import generate_labeled_cloud  # noqa: E402
from semantic_dsp_map_tpu.ops.render import render_occupancy  # noqa: E402

cfg = base
f = frame_for(cfg)
state = init_map_state(cfg, seed=0)
gt = state.global_time + 1
k = jax.random.PRNGKey(0)
r_wc, t_wc, r_cw, t_cw = camera_matrices(f.cam_pos, f.cam_quat)
mm = registry.max_movable_instance_id

cloud_g = flops(
    lambda d, tr, tbl: generate_labeled_cloud(cfg, params, d, tr, tbl, r_wc, t_wc, mm),
    f.depth, f.track_raster, f.track_label_table)
move_g = flops(
    lambda pt, s, o, kk: _move_and_cleanup(cfg, params, pt, s, o, gt, kk, mm),
    state.particles, state.scroll, state.objects, k)
cloud = generate_labeled_cloud(cfg, params, f.depth, f.track_raster,
                               f.track_label_table, r_wc, t_wc, mm)
obs_g = flops(
    lambda pt, s, vs, c, d: observe_and_update(cfg, params, pt, s, vs, c, d, r_cw, t_cw, gt),
    state.particles, state.scroll, state.voxel_stamp, cloud, f.depth)
birth_g = flops(
    lambda pt, s, c, kk: birth_and_resample(cfg, params, pt, s, c, gt, kk),
    state.particles, state.scroll, cloud, k)
render_g = flops(
    lambda st: render_occupancy(cfg, st, params.occupancy_threshold), state)

step1 = build_frame_step(cfg, params, registry)
total1 = step1.lower(state, f).compile().cost_analysis().get("flops", 0.0) / 1e9
print(f"1-dev  cloud={cloud_g:.4f} move={move_g:.4f} observe={obs_g:.4f} "
      f"birth={birth_g:.4f} render={render_g:.4f}  sum={cloud_g+move_g+obs_g+birth_g+render_g:.4f} total={total1:.4f}")

# ---------------- sharded per-stage FLOPs at D=8 grown ----------------
import semantic_dsp_map_tpu.parallel.shard_step as ss  # noqa: E402

cfg = grown
mesh = make_mesh(D)
f8 = frame_for(cfg)
state8 = shard_state(cfg, mesh, init_map_state(cfg, seed=0))

# Reach inside build_shard_map_step by rebuilding its closure pieces with a
# stage selector: compile shard_map'd single stages.
step8 = ss.build_shard_map_step(cfg, params, registry, mesh)
total8 = step8.lower(state8, f8).compile().cost_analysis().get("flops", 0.0) / 1e9
print(f"8-dev total={total8:.4f}  per-dev={total8/D:.4f}  ratio={total8/D/total1:.3f}")

# stage isolation: monkeypatch stages to identity and diff totals
import functools


def total_with(**disable):
    """Total FLOPs with selected stages stubbed out."""
    orig = {}
    if disable.get("observe"):
        orig["_observe_sharded"] = None
    # simplest robust approach: recompile variants of the body via config
    raise SystemExit


# Differential approach: recompile with stage-disabling params where config
# allows: stencil R=0 isolates the stencil cost.
grown_r0 = dataclasses.replace(grown, phd_neighbor_half=0)
step8_r0 = ss.build_shard_map_step(grown_r0, params, registry, mesh)
t8_r0 = step8_r0.lower(state8, f8).compile().cost_analysis().get("flops", 0.0) / 1e9
base_r0 = dataclasses.replace(base, phd_neighbor_half=0)
f_r0 = frame_for(base_r0)
state_r0 = init_map_state(base_r0, seed=0)
step1_r0 = build_frame_step(base_r0, params, registry)
t1_r0 = step1_r0.lower(state_r0, f_r0).compile().cost_analysis().get("flops", 0.0) / 1e9
print(f"R=0: 1-dev total={t1_r0:.4f}  8-dev per-dev={t8_r0/D:.4f}  "
      f"stencil share 1-dev={total1-t1_r0:.4f} 8-dev per-dev={(total8-t8_r0)/D:.4f}")
