"""TPU correctness + speed check: Pallas render reduction vs the XLA oracle.

Builds a random-but-plausible full-scale map state per config, asserts the
Pallas kernel's outputs match ops/render.py, then times both (real readback
sync; block_until_ready returns early through the TPU tunnel).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from semantic_dsp_map_tpu.config import (  # noqa: E402
    virtual_kitti2_config,
    zed2_config,
)
from semantic_dsp_map_tpu.ops.render import render_occupancy_xla  # noqa: E402
from semantic_dsp_map_tpu.ops.render_pallas import (  # noqa: E402
    render_occupancy_pallas,
)
from semantic_dsp_map_tpu.state import init_map_state  # noqa: E402


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def build_state(cfg, seed=0):
    rng = np.random.RandomState(seed)
    V, K = cfg.num_voxels, cfg.slots_per_voxel
    n = V * K
    state = init_map_state(cfg)
    state = state.replace(
        particles=state.particles.replace(
            status=jnp.asarray(
                rng.choice([0, 1, 2, 3], size=n, p=[0.5, 0.3, 0.15, 0.05])
                .astype(np.uint8)
            ),
            weight=jnp.asarray((rng.rand(n) * 1.4).astype(np.float32)),
            track=jnp.asarray(rng.randint(0, 50, n).astype(np.uint16)),
            label=jnp.asarray(rng.randint(0, 15, n).astype(np.uint8)),
            stamp=jnp.asarray(rng.randint(0, 3, n).astype(np.int32)),
        ),
        voxel_stamp=jnp.asarray(rng.randint(0, 3, V).astype(np.int32)),
    )
    sc = state.scroll.replace(
        axis_stamp_x=jnp.asarray(rng.randint(0, 2, cfg.nx).astype(np.int32)),
        axis_stamp_y=jnp.asarray(rng.randint(0, 2, cfg.ny).astype(np.int32)),
    )
    return state.replace(scroll=sc)


def check(name, cfg, iters=20):
    print(f"== {name} (V={cfg.num_voxels}, K={cfg.slots_per_voxel})")
    state = build_state(cfg)
    thr = 0.5

    px, rx = render_occupancy_xla(cfg, state, thr)
    pp, rp = render_occupancy_pallas(cfg, state, thr)
    for field in ["occ", "label", "track"]:
        a = np.asarray(getattr(rx, field))
        b = np.asarray(getattr(rp, field))
        assert np.array_equal(a, b), (
            f"{field} mismatch: {(a != b).sum()} voxels"
        )
    wd = np.abs(np.asarray(rx.weight_sum) - np.asarray(rp.weight_sum)).max()
    assert wd < 1e-4, f"weight_sum maxdiff {wd}"
    assert np.array_equal(np.asarray(px.weight), np.asarray(pp.weight))
    assert np.array_equal(np.asarray(px.status), np.asarray(pp.status))
    print(f"  EQUAL (ws maxdiff {wd:.2e})")

    for label, fn in [("xla", render_occupancy_xla), ("pallas", render_occupancy_pallas)]:
        _ = fn(cfg, state, thr)
        sync(_)
        t0 = time.perf_counter()
        for _i in range(iters):
            out = fn(cfg, state, thr)
        sync(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"  {label:8s} {dt:8.2f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "zed2"):
        check("zed2", zed2_config())
    if which in ("all", "vkitti2"):
        check("vkitti2", virtual_kitti2_config())
    print("ALL OK")
