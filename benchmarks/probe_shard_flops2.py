"""Differential per-piece FLOP isolation of the sharded step at the
weak-scaling medium/D=8 workload: monkeypatch module-level pieces of
parallel.shard_step with cheap stand-ins and diff the compiled per-device
FLOPs.  (round-5: locate the 2.2x overhead)

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/probe_shard_flops2.py
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_platforms", "cpu")

from semantic_dsp_map_tpu.config import FilterParams  # noqa: E402
from semantic_dsp_map_tpu.frontend import MaskKpts, build_frame_input  # noqa: E402
from semantic_dsp_map_tpu.labels import LabelRegistry  # noqa: E402
from semantic_dsp_map_tpu.parallel.distributed import _base_config  # noqa: E402
from semantic_dsp_map_tpu.parallel.sharding import make_mesh, shard_state  # noqa: E402
from semantic_dsp_map_tpu.state import init_map_state  # noqa: E402
import semantic_dsp_map_tpu.parallel.shard_step as ss  # noqa: E402

import os

D = int(os.environ.get("PROBE_D", "8"))
params = FilterParams(if_consider_depth_noise=True, nb_ptc_num_per_point=1,
                      depth_noise_model_zero_order=0.2)
base = _base_config("medium")
grown = dataclasses.replace(
    base,
    voxel_num_axis_z_n=base.voxel_num_axis_z_n + D.bit_length() - 1,
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
mesh = make_mesh(D)

H, W = grown.height, grown.width
depth = (1.0 + np.arange(H, dtype=np.float32)[:, None] / H) * np.ones((1, W), np.float32)
f8 = build_frame_input(
    grown, registry, depth,
    [MaskKpts(track_id=65535, label="static", mask=np.full((H, W), 5, np.uint8))],
    np.zeros(3, np.float32), np.array([1, 0, 0, 0], np.float32), 0.0,
)
state8 = shard_state(grown, mesh, init_map_state(grown, seed=0))


def gflops():
    step = ss.build_shard_map_step(grown, params, registry, mesh)
    c = step.lower(state8, f8).compile()
    return c.cost_analysis().get("flops", 0.0) / 1e9


full = gflops()
print(f"full per-device: {full:.4f}", flush=True)

orig = {}


def patch(name, fn):
    orig[name] = getattr(ss, name)
    setattr(ss, name, fn)


def unpatch():
    for k, v in orig.items():
        setattr(ss, k, v)
    orig.clear()


# ---- 1. routing (_route + _route_back): replace with slice/pad stand-ins
def fake_route(fields, valid, dest, n_dev, cap):
    M = n_dev * cap
    N = next(iter(fields.values())).shape[0]
    out = {}
    for k, v in fields.items():
        if N >= M:
            out[k] = v[:M]
        else:
            out[k] = jnp.pad(v, (0, M - N))
    rv = (jnp.arange(M) < N) & (jnp.pad(valid[: min(N, M)], (0, max(0, M - N))) if N < M else valid[:M])
    slot = jnp.where(jnp.arange(N) < M, jnp.arange(N), -1)
    return ss.Routed(fields=out, recv_valid=rv, send_slot=slot,
                     overflow=jnp.int32(0))


def fake_route_back(result_fields, send_slot):
    N = send_slot.shape[0]
    out = {}
    for k, v in result_fields.items():
        if v.shape[0] >= N:
            out[k] = v[:N]
        else:
            out[k] = jnp.pad(v, (0, N - v.shape[0]))
    return out


patch("_route", fake_route)
patch("_route_back", fake_route_back)
g = gflops()
print(f"no routing:      {g:.4f}  (routing = {full - g:.4f})", flush=True)
unpatch()

# ---- 2. halo exchange
def fake_halo(cfg, t_loc, D_, rpd, ext0):
    from semantic_dsp_map_tpu.ops.phd import PixelTable
    padr = lambda a, fill: jnp.pad(a, [(0, 0), (ext0, ext0), (0, 0)],
                                   constant_values=fill)
    return PixelTable(px=padr(t_loc.px, 0.0), py=padr(t_loc.py, 0.0),
                      pz=padr(t_loc.pz, 0.0), weight=padr(t_loc.weight, 0.0),
                      meta=padr(t_loc.meta, -1), dropped=t_loc.dropped)


patch("_exchange_table_halo", fake_halo)
g = gflops()
print(f"no table halo:   {g:.4f}  (halo = {full - g:.4f})", flush=True)
unpatch()

# ---- 3. corner pass
def fake_corner(cfg, scroll, voxel_stamp, has_alive, depth_full, r_cw, t_cw,
                gt, vox_base=0, vox_axis=None):
    return voxel_stamp, jnp.int32(0)


patch("refresh_empty_voxel_stamps", fake_corner)
g = gflops()
print(f"no corner pass:  {g:.4f}  (corner = {full - g:.4f})", flush=True)
unpatch()

# ---- 4. labeled cloud slab
def fake_cloud(cfg, params_, depth_, raster_, table_, r_wc, t_wc, mm, **kw):
    from semantic_dsp_map_tpu.ops.projection import LabeledCloud
    h, w = depth_.shape
    return LabeledCloud(
        pos=jnp.zeros((h, w, 3), jnp.float32),
        sigma=jnp.ones((h, w), jnp.float32),
        label=jnp.zeros((h, w), jnp.int32),
        track=jnp.zeros((h, w), jnp.int32),
        valid=jnp.zeros((h, w), bool),
    )


patch("generate_labeled_cloud", fake_cloud)
g = gflops()
print(f"no cloud slab:   {g:.4f}  (cloud = {full - g:.4f})", flush=True)
unpatch()

# ---- 5. stencils
def fake_stencil_a(cfg, params_, t, cloud):
    return jnp.ones(t.px.shape[1:], jnp.float32)


def fake_stencil_b(cfg, params_, t, cloud, ck):
    return t.weight, jnp.zeros(t.px.shape, jnp.int32)


patch("stencil_pass_a_any", fake_stencil_a)
patch("stencil_pass_b_any", fake_stencil_b)
g = gflops()
print(f"no stencils:     {g:.4f}  (stencils = {full - g:.4f})", flush=True)
unpatch()

# ---- 6. insert core (birth + move insertion)
def fake_insert(cfg, particles, scroll, cand, **kw):
    from semantic_dsp_map_tpu.ops.birth import InsertResult
    A = 1
    return InsertResult(particles=particles, accepted_count=jnp.int32(0),
                        accepted_staged=jnp.zeros((A, 1), bool),
                        staged_src=None, block_overflow=jnp.int32(0))


patch("_insert_core", fake_insert)
g = gflops()
print(f"no insert core:  {g:.4f}  (insert = {full - g:.4f})", flush=True)
unpatch()

# ---- 7. render
def fake_render(cfg, particles, voxel_stamp, vox_axis, thr):
    from semantic_dsp_map_tpu.ops.render import RenderResult
    Vl = voxel_stamp.shape[0]
    return particles, RenderResult(
        occ=jnp.zeros(Vl, jnp.int8), label=jnp.zeros(Vl, jnp.int32),
        track=jnp.zeros(Vl, jnp.int32), weight_sum=jnp.zeros(Vl, jnp.float32),
    )


patch("render_core_xla", fake_render)
g = gflops()
print(f"no render:       {g:.4f}  (render = {full - g:.4f})", flush=True)
unpatch()
