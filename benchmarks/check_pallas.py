"""TPU correctness + speed check: Pallas PHD stencils vs the XLA oracle.

Runs both implementations of passes A and B on the same random-but-plausible
pixel table / observation grids at a chosen config's shapes and asserts
equality to f32 tolerance, then times both.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from semantic_dsp_map_tpu.config import (  # noqa: E402
    FilterParams,
    virtual_kitti2_config,
    zed2_config,
)
from semantic_dsp_map_tpu.ops.phd import (  # noqa: E402
    PixelTable,
    stencil_pass_a,
    stencil_pass_b,
    stencil_passes,
)
from semantic_dsp_map_tpu.ops.projection import LabeledCloud  # noqa: E402


def make_inputs(cfg, seed=0, fill=0.3, front_fill=False):
    rng = np.random.RandomState(seed)
    H, W, S = cfg.height, cfg.width, cfg.phd_pixel_table_slots
    if front_fill:
        # Realistic production shape: the table is front-filled and sparse
        # (~1 entry/pixel on covered regions, PROFILE_r04.md) — this is the
        # case the kernels' slot-group liveness skip accelerates.
        depth_per_pixel = rng.poisson(fill * S, (1, H, W))
        occ = np.arange(S)[:, None, None] < depth_per_pixel
    else:
        occ = rng.rand(S, H, W) < fill
    track = rng.randint(0, 6, (S, H, W)).astype(np.int32)
    forget = rng.randint(0, 6, (S, H, W)).astype(np.int32)
    meta = np.where(occ, (track << 8) | forget, -1).astype(np.int32)
    t = PixelTable(
        px=jnp.asarray(np.where(occ, rng.randn(S, H, W) * 2, 0).astype(np.float32)),
        py=jnp.asarray(np.where(occ, rng.randn(S, H, W) * 2, 0).astype(np.float32)),
        pz=jnp.asarray(np.where(occ, rng.rand(S, H, W) * 8 + 1, 0).astype(np.float32)),
        weight=jnp.asarray(np.where(occ, rng.rand(S, H, W), 0).astype(np.float32)),
        meta=jnp.asarray(meta),
        dropped=jnp.int32(0),
    )
    cloud = LabeledCloud(
        pos=jnp.asarray(rng.randn(H, W, 3).astype(np.float32) * 2 + np.array([0, 0, 4], np.float32)),
        sigma=jnp.asarray((0.2 + rng.rand(H, W) * 0.3).astype(np.float32)),
        label=jnp.asarray(rng.randint(0, 10, (H, W)).astype(np.int32)),
        track=jnp.asarray(rng.randint(0, 6, (H, W)).astype(np.int32)),
        valid=jnp.asarray(rng.rand(H, W) < 0.9),
    )
    return t, cloud


def bench(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {name:<18} {ms:8.2f} ms")
    return out, ms


def check(cfg_name, cfg, params, front_fill=False, fill=0.3):
    print(f"\n== {cfg_name} (R={cfg.neighbor_half}, S={cfg.phd_pixel_table_slots}, "
          f"{cfg.width}x{cfg.height}) independent={params.if_use_independent_filter}"
          f" front_fill={front_fill} fill={fill}")
    t, cloud = make_inputs(cfg, fill=fill, front_fill=front_fill)

    cfg_xla = type(cfg)(**{**cfg.__dict__, "use_pallas_phd": False})
    cfg_pl = type(cfg)(**{**cfg.__dict__, "use_pallas_phd": True})

    @jax.jit
    def xla(t, cloud):
        ck = stencil_pass_a(cfg_xla, params, t, cloud)
        nw, nf = stencil_pass_b(cfg_xla, params, t, cloud, ck)
        return ck, nw, nf

    @jax.jit
    def pallas(t, cloud):
        return stencil_passes(cfg_pl, params, t, cloud)

    (ck1, nw1, nf1), ms_x = bench("xla stencils", xla, t, cloud)
    (ck2, nw2, nf2), ms_p = bench("pallas kernels", pallas, t, cloud)

    np.testing.assert_allclose(np.asarray(ck1), np.asarray(ck2), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nw1), np.asarray(nw2), rtol=2e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(nf1), np.asarray(nf2))
    print(f"  EQUAL; speedup {ms_x / ms_p:.1f}x")


if __name__ == "__main__":
    zp = FilterParams(detection_probability=0.8, noise_number=0.2,
                      if_consider_depth_noise=True)
    check("zed2", zed2_config(), zp)
    check("zed2/independent", zed2_config(),
          FilterParams(if_use_independent_filter=True))
    vp = FilterParams(detection_probability=0.98, noise_number=0.001,
                      if_consider_depth_noise=True)
    check("vkitti2", virtual_kitti2_config(), vp)
    check("vkitti2/front-fill", virtual_kitti2_config(), vp,
          front_fill=True, fill=0.09)
    check("zed2/front-fill", zed2_config(), zp, front_fill=True, fill=0.09)
    print("\nALL OK")
