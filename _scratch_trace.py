import os, glob, sys
import jax, jax.numpy as jnp, numpy as np
from semantic_dsp_map_tpu.config import FilterParams, zed2_config
from semantic_dsp_map_tpu.labels import LabelRegistry
from semantic_dsp_map_tpu.state import init_map_state
from semantic_dsp_map_tpu.map import build_frame_step
from semantic_dsp_map_tpu.frontend import MaskKpts, build_frame_input

cfg = zed2_config()
params = FilterParams(nb_ptc_num_per_point=1, if_consider_depth_noise=True,
                      depth_noise_model_zero_order=0.2, depth_noise_model_first_order=0.01)
registry = LabelRegistry.default()
state = init_map_state(cfg, 0)
H, W = cfg.height, cfg.width
rng = np.random.RandomState(0)
depth = np.full((H, W), 8.0, np.float32) + rng.rand(H, W).astype(np.float32)
static = np.full((H, W), 6, np.uint8)
frame = build_frame_input(cfg, registry, depth,
    [MaskKpts(track_id=65535, label="static", mask=static)],
    np.zeros(3, np.float32), np.array([1,0,0,0], np.float32), 0.0)
step = build_frame_step(cfg, params, registry)
state, result, diag = step(state, frame)
jax.block_until_ready(state.particles.weight)

with jax.profiler.trace("/tmp/jaxtrace"):
    state, result, diag = step(state, frame)
    jax.block_until_ready(state.particles.weight)
print("trace done")
