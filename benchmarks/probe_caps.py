"""Round-5 cap probe: measured active-block / entry / birth-target counts on
the warmed VKITTI2 bench scene, to right-size the static capacity knobs
(element gathers/scatters cost ~6-11 ns each; oversized caps are pure loss —
PROFILE_r04.md).  Run with BENCH-style scenes; the hostile scene (bench.py
round 5) must stay under the chosen caps with margin."""
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
from semantic_dsp_map_tpu.ops.birth import newborn_candidates  # noqa: E402
from semantic_dsp_map_tpu.ops.blocks import block_layout, mask_to_block_mask  # noqa: E402
from semantic_dsp_map_tpu.ops.geometry import camera_matrices  # noqa: E402
from semantic_dsp_map_tpu.ops.projection import generate_labeled_cloud  # noqa: E402
from semantic_dsp_map_tpu.ops.geometry import project_to_image_xyz  # noqa: E402
from semantic_dsp_map_tpu.state import particles_vk, STATUS_INVALID  # noqa: E402

cfg = virtual_kitti2_config()
params = FilterParams(
    detection_probability=0.98, noise_number=0.001, nb_ptc_num_per_point=1,
    occupancy_threshold=0.5, if_consider_depth_noise=True,
    depth_noise_model_first_order=0.01, depth_noise_model_zero_order=0.2,
)
reg = LabelRegistry.default()
dsp = SemanticDSPMap(cfg, params, reg)
n_warm = int(sys.argv[1]) if len(sys.argv) > 1 else 10
for t in range(n_warm):
    d, m, p, q = bench.synth_vkitti2_frame(cfg, t)
    _, diag = dsp.update(d, m, p, q, time=t * 0.1)
state = dsp.state
print("warmed diag:", {k: int(np.asarray(v)) for k, v in diag._asdict().items()})

d, m, p, q = bench.synth_vkitti2_frame(cfg, n_warm)
f = build_frame_input(cfg, reg, d, m, p, q, n_warm * 0.1)
r_wc, t_wc, r_cw, t_cw = camera_matrices(f.cam_pos, f.cam_quat)
gt = state.global_time + 1
mm = reg.max_movable_instance_id

bv, nb, spb = block_layout(cfg)
K = cfg.slots_per_voxel


@jax.jit
def probe(state, f):
    particles = particles_vk(cfg, state.particles)
    scroll = codecs.update_ego_center(cfg, state.scroll, f.cam_pos, gt)
    vox_axis = codecs.axis_stamps_per_voxel(cfg, scroll)
    alive = codecs.particle_alive(particles.status, particles.stamp, vox_axis)
    _, _, _, proj_ok = project_to_image_xyz(
        cfg, r_cw, t_cw, particles.px, particles.py, particles.pz
    )
    cand = proj_ok & alive
    active_blocks = jnp.sum(mask_to_block_mask(cand, bv).astype(jnp.int32))
    entry_total = jnp.sum(cand.astype(jnp.int32))
    alive_total = jnp.sum(alive.astype(jnp.int32))

    cloud = generate_labeled_cloud(
        cfg, params, f.depth, f.track_raster, f.track_label_table,
        r_wc, t_wc, mm)
    nc = newborn_candidates(cfg, params, cloud, gt, jax.random.PRNGKey(0))
    vox, _, _, _, in_map = codecs.global_pos_to_voxel(cfg, scroll, nc.pos)
    bvalid = nc.valid & in_map
    birth_cand = jnp.sum(bvalid.astype(jnp.int32))
    tb = jnp.zeros(nb, bool).at[jnp.where(bvalid, vox >> int(np.log2(bv)), nb)].set(
        True, mode="drop")
    birth_blocks = jnp.sum(tb.astype(jnp.int32))

    movable = alive & (particles.track <= mm)
    movable_blocks = jnp.sum(mask_to_block_mask(movable, bv).astype(jnp.int32))
    return dict(
        active_blocks=active_blocks, entry_total=entry_total,
        alive_total=alive_total, birth_cand=birth_cand,
        birth_blocks=birth_blocks, movable_blocks=movable_blocks,
    )


out = {k: int(np.asarray(v)) for k, v in probe(state, f).items()}
out["caps"] = dict(
    max_active_blocks=cfg.max_active_blocks,
    max_table_entries=cfg.max_table_entries,
    max_birth_blocks=cfg.max_birth_blocks,
    max_moving_blocks=cfg.max_moving_blocks,
    nb=nb, spb=spb,
)
print(out)
