import time, jax, jax.numpy as jnp, numpy as np
from semantic_dsp_map_tpu.config import FilterParams, virtual_kitti2_config
from semantic_dsp_map_tpu.labels import LabelRegistry
from semantic_dsp_map_tpu.state import init_map_state, STATUS_INVALID
from semantic_dsp_map_tpu.ops import codecs
from semantic_dsp_map_tpu.ops.birth import Candidates, insert_particles
from semantic_dsp_map_tpu.objects import track_lookup_table, expire_objects

cfg = virtual_kitti2_config()
params = FilterParams()
state = init_map_state(cfg, 0)
pos = jnp.zeros(3, jnp.float32)
M = cfg.max_moving_particles

def timed(name, fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(3): out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/3*1e3:.2f} ms", flush=True)
    return out

@jax.jit
def stage_a(state):
    scroll = codecs.update_ego_center(cfg, state.scroll, pos, state.global_time+1)
    objects, _ = expire_objects(params, state.objects, state.global_time+1)
    return state.replace(scroll=scroll, objects=objects)

@jax.jit
def stage_b(state):
    p = state.particles
    table = track_lookup_table(state.objects)
    vox_axis = codecs.axis_stamps_per_voxel(cfg, state.scroll)
    alive = codecs.particle_alive(p.status, p.stamp, vox_axis)
    track_c = jnp.clip(p.track, 0, 65535)
    obj_of = table[track_c]
    movable = (p.track >= 0) & (p.track <= 65523)
    floating = movable & alive & (obj_of < 0)
    status = jnp.where(floating, STATUS_INVALID, p.status)
    return state.replace(particles=p.replace(status=status))

@jax.jit
def stage_c(state):
    p = state.particles
    move_p = p.weight > 0.5
    (sel,) = jnp.nonzero(move_p.reshape(-1), size=M, fill_value=-1)
    gi = jnp.maximum(sel, 0)
    ppos = p.pos.reshape(-1,3)[gi]
    return jnp.sum(ppos)

@jax.jit
def stage_d(state):
    p = state.particles
    n = M
    cand = Candidates(
        pos=jnp.zeros((n,3),jnp.float32), weight=jnp.full(n,0.1,jnp.float32),
        label=jnp.zeros(n,jnp.int32), track=jnp.zeros(n,jnp.int32),
        status=jnp.ones(n,jnp.int32), stamp=jnp.ones(n,jnp.int32),
        forget=jnp.zeros(n,jnp.int32), priority=jnp.arange(n,dtype=jnp.int32),
        valid=jnp.ones(n,bool))
    particles, acc, _ = insert_particles(cfg, p, state.scroll, cand)
    return particles.weight.sum()

state = timed("scroll+expire", stage_a, state)
state = timed("floating", stage_b, state)
timed("nonzero+gather", stage_c, state)
timed("insert", stage_d, state)
