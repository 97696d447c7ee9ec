"""Stage ablation at VKITTI2 scale: rebuild the frame step with one stage
no-op'd at a time and measure the end-to-end rate (chained, donation-safe,
real readback sync — per-stage jits OOM at this scale and tunnel timings of
separate dispatches lie, so ablation on the fused step is the reliable
attribution method on this host)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import semantic_dsp_map_tpu.map as mapmod  # noqa: E402
from bench import synth_vkitti2_frame  # noqa: E402
from semantic_dsp_map_tpu.config import FilterParams, virtual_kitti2_config  # noqa: E402
from semantic_dsp_map_tpu.frontend import pack_frame  # noqa: E402
from semantic_dsp_map_tpu.labels import LabelRegistry  # noqa: E402
from semantic_dsp_map_tpu.map import build_frame_step  # noqa: E402
from semantic_dsp_map_tpu.state import init_map_state  # noqa: E402
from semantic_dsp_map_tpu.ops.observe import ObserveDiag  # noqa: E402

cfg = virtual_kitti2_config()
params = FilterParams(
    detection_probability=0.98, noise_number=0.001, nb_ptc_num_per_point=1,
    occupancy_threshold=0.5, if_consider_depth_noise=True,
    depth_noise_model_first_order=0.01, depth_noise_model_zero_order=0.2,
)
registry = LabelRegistry.default()

FRAMES = 8
bufs = []
for t in range(FRAMES + 3):
    d, m, p, q = synth_vkitti2_frame(cfg, t)
    bufs.append(jnp.asarray(pack_frame(cfg, registry, d, m, p, q, t * 0.1)))


def run(name, patches):
    saved = {k: getattr(mapmod, k) for k in patches}
    for k, v in patches.items():
        setattr(mapmod, k, v)
    try:
        import os
        if os.environ.get("ABLATE_SPLIT"):
            from semantic_dsp_map_tpu.map import unpack_frame
            from semantic_dsp_map_tpu.frontend import static_label_table as _slt
            core, render = build_frame_step(cfg, params, registry, split_render=True)
            stbl = _slt(registry)
            import jax as _jax, functools
            @functools.partial(_jax.jit, donate_argnums=0)
            def _core_p(st, buf):
                return core.__wrapped__(st, unpack_frame(cfg, stbl, buf))
            def step(st, buf):
                st, _cl, dg = _core_p(st, buf)
                st, r = render(st)
                return st, r, dg
        else:
            step = build_frame_step(cfg, params, registry, packed=True)
        state = init_map_state(cfg, 0)
        for t in range(3):
            state, r, dg = step(state, bufs[t])
        _ = float(np.asarray(r.occ[:1])[0])
        t0 = time.perf_counter()
        for t in range(3, 3 + FRAMES):
            state, r, dg = step(state, bufs[t])
        _ = float(np.asarray(r.occ[:1])[0])
        ms = (time.perf_counter() - t0) / FRAMES * 1e3
        print(f"{name:<22} {ms:8.1f} ms/frame", flush=True)
        del state
    finally:
        for k, v in saved.items():
            setattr(mapmod, k, v)


def no_observe(cfg_, params_, particles, scroll, voxel_stamp, cloud, depth, r_cw, t_cw, gt):
    z = jnp.int32(0)
    return particles, voxel_stamp, ObserveDiag(z, z, z, z, z)


def no_birth(cfg_, params_, particles, scroll, cloud, gt, rng):
    return particles, jnp.int32(0), jnp.int32(0), None


def no_move(cfg_, params_, particles, scroll, objects, gt, rng, mm):
    return particles, jnp.int32(0), jnp.int32(0)


def no_render(cfg_, state, thr):
    V = cfg_.num_voxels
    from semantic_dsp_map_tpu.ops.render import RenderResult

    return state.particles, RenderResult(
        occ=jnp.zeros(V, jnp.int32), label=jnp.zeros(V, jnp.int32),
        track=jnp.zeros(V, jnp.int32), weight_sum=jnp.zeros(V, jnp.float32),
    )


def no_objects(cfg_, params_, objects, obs, cam_pos, r_cw, t_cw, tn, pt, gt, rng):
    return objects


run("baseline", {})
run("no observe", {"observe_and_update": no_observe})
run("no birth", {"birth_and_resample": no_birth})
run("no move", {"_move_and_cleanup": no_move})
run("no render", {"render_occupancy": no_render})
run("no object layer", {"object_level_update": no_objects})
