"""PHD weight update vs a naive scalar oracle of updateParticles
(semantic_dsp_map.h:960-1121)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from semantic_dsp_map_tpu.config import FilterParams, tiny_test_config
from semantic_dsp_map_tpu.ops.phd import compute_ck_kappa, phd_weight_update
from semantic_dsp_map_tpu.ops.projection import LabeledCloud, VisibleSet
from semantic_dsp_map_tpu.state import init_particles, STATUS_UPDATED

GC = 1.0 / math.sqrt(math.pi)


def pdf1(x, mu, sigma):
    z = (x - mu) / max(sigma, 1e-6)
    if abs(z) > 9.9:
        return 1e-9
    return GC * math.exp(-0.5 * z * z)


def pdf3(p, mu, sigma):
    return pdf1(p[0], mu[0], sigma) * pdf1(p[1], mu[1], sigma) * pdf1(p[2], mu[2], sigma)


def forget_factor(n, rate, max_count):
    if n < max_count:
        return 2.5 ** (-n / rate)
    return 0.0


def oracle_update(parts, cloud, params, R, H, W):
    """parts: list of dicts(pos, weight, track, forget, row, col).
    cloud: dict of numpy arrays pos[H,W,3], sigma[H,W], track[H,W], valid[H,W].
    Returns (ck_kappa, new_weights, new_forgets)."""
    by_pixel = {}
    for k, p in enumerate(parts):
        by_pixel.setdefault((p["row"], p["col"]), []).append(k)

    ck_kappa = np.full((H, W), params.noise_number, np.float64)
    for i in range(H):
        for j in range(W):
            if not cloud["valid"][i, j]:
                continue
            sigma = cloud["sigma"][i, j]
            ck = 0.0
            for m in range(-R, R + 1):
                for n in range(-R, R + 1):
                    ni, nj = i + m, j + n
                    if not (0 <= ni < H and 0 <= nj < W):
                        continue
                    for k in by_pixel.get((ni, nj), []):
                        p = parts[k]
                        if params.if_use_independent_filter:
                            if p["track"] != cloud["track"][i, j]:
                                continue
                        gk = pdf3(p["pos"], cloud["pos"][i, j], sigma)
                        if not params.if_use_independent_filter:
                            gk *= forget_factor(
                                p["forget"], params.forgetting_rate, params.max_forget_count
                            )
                            if p["track"] != cloud["track"][i, j]:
                                gk *= params.id_transition_probability
                        ck += p["weight"] * gk
            ck_kappa[i, j] = ck * params.detection_probability + params.noise_number

    new_w, new_f = [], []
    for p in parts:
        i, j = p["row"], p["col"]
        sigma = cloud["sigma"][i, j]
        acc = 0.0
        right = False
        for m in range(-R, R + 1):
            for n in range(-R, R + 1):
                ni, nj = i + m, j + n
                if not (0 <= ni < H and 0 <= nj < W):
                    continue
                if not cloud["valid"][ni, nj]:
                    continue
                if params.if_use_independent_filter and cloud["track"][ni, nj] != p["track"]:
                    continue
                gk = pdf3(p["pos"], cloud["pos"][ni, nj], sigma)
                if not params.if_use_independent_filter:
                    if p["track"] != cloud["track"][ni, nj]:
                        gk *= params.id_transition_probability
                    elif gk > 0.1:
                        right = True
                    gk *= forget_factor(
                        p["forget"], params.forgetting_rate, params.max_forget_count
                    )
                acc += gk / ck_kappa[ni, nj]
        new_w.append(
            p["weight"]
            * (acc * params.detection_probability + 1 - params.detection_probability)
        )
        if params.if_use_independent_filter:
            new_f.append(p["forget"])
        else:
            new_f.append(0 if right else min(p["forget"] + 1, 5))
    return ck_kappa, np.array(new_w), np.array(new_f)


def build_case(seed, params, independent=False):
    cfg = tiny_test_config(phd_neighbor_half=2)
    rng = np.random.RandomState(seed)
    H, W = cfg.height, cfg.width

    valid = rng.rand(H, W) > 0.3
    cloud_np = {
        "pos": rng.randn(H, W, 3).astype(np.float32) * 0.5,
        "sigma": (0.05 + rng.rand(H, W) * 0.2).astype(np.float32),
        "track": rng.randint(0, 3, (H, W)).astype(np.int32),
        "valid": valid,
    }

    n_parts = 40
    parts = []
    for k in range(n_parts):
        r, c = rng.randint(0, H), rng.randint(0, W)
        parts.append(
            dict(
                pos=cloud_np["pos"][r, c] + rng.randn(3).astype(np.float32) * 0.1,
                weight=float(rng.rand() * 0.5 + 0.01),
                track=int(rng.randint(0, 3)),
                forget=int(rng.randint(0, 6)),
                row=r,
                col=c,
            )
        )

    P = 64
    vis = VisibleSet(
        vox=jnp.asarray(
            np.concatenate([np.arange(n_parts), -np.ones(P - n_parts)]).astype(np.int32)
        ),
        slot=jnp.zeros(P, jnp.int32),
        row=jnp.asarray(np.array([p["row"] for p in parts] + [0] * (P - n_parts), np.int32)),
        col=jnp.asarray(np.array([p["col"] for p in parts] + [0] * (P - n_parts), np.int32)),
        pos=jnp.asarray(
            np.stack([p["pos"] for p in parts] + [np.zeros(3)] * (P - n_parts)).astype(np.float32)
        ),
        weight=jnp.asarray(np.array([p["weight"] for p in parts] + [0] * (P - n_parts), np.float32)),
        track=jnp.asarray(np.array([p["track"] for p in parts] + [-1] * (P - n_parts), np.int32)),
        forget=jnp.asarray(np.array([p["forget"] for p in parts] + [0] * (P - n_parts), np.int32)),
        visible=jnp.asarray(np.arange(P) < n_parts),
        count=jnp.int32(n_parts),
    )
    cloud = LabeledCloud(
        pos=jnp.asarray(cloud_np["pos"]),
        sigma=jnp.asarray(cloud_np["sigma"]),
        label=jnp.zeros((H, W), jnp.int32),
        track=jnp.asarray(cloud_np["track"]),
        valid=jnp.asarray(cloud_np["valid"]),
    )
    return cfg, parts, cloud_np, vis, cloud


def _run(seed, params):
    cfg, parts, cloud_np, vis, cloud = build_case(seed, params)
    R = cfg.neighbor_half

    ck = np.asarray(compute_ck_kappa(cfg, params, vis, cloud))
    ck_oracle, w_oracle, f_oracle = oracle_update(
        parts, cloud_np, params, R, cfg.height, cfg.width
    )

    m = np.asarray(cloud.valid)
    np.testing.assert_allclose(ck[m], ck_oracle[m], rtol=2e-4, atol=1e-6)

    particles = init_particles(cfg)
    new_p = phd_weight_update(cfg, params, vis, cloud, particles, jnp.int32(7))
    # Synthetic particle i lives at (voxel i, slot 0).
    n = len(parts)
    K = cfg.slots_per_voxel
    got_w = np.asarray(new_p.weight).reshape(-1, K)[:n, 0]
    got_f = np.asarray(new_p.forget).reshape(-1, K)[:n, 0]
    got_s = np.asarray(new_p.status).reshape(-1, K)[:n, 0]
    np.testing.assert_allclose(got_w, w_oracle, rtol=3e-4, atol=1e-6)
    np.testing.assert_array_equal(got_f, f_oracle)
    assert (got_s == STATUS_UPDATED).all()


def test_phd_joint_filter():
    _run(0, FilterParams(detection_probability=0.9, noise_number=0.05,
                         forgetting_rate=1.0, max_forget_count=3,
                         id_transition_probability=0.2))


def test_phd_independent_filter():
    _run(1, FilterParams(detection_probability=0.95, noise_number=0.1,
                         if_use_independent_filter=True))
