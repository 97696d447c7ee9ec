"""Multi-host runtime: jax.distributed bring-up + weak-scaling measurement.

The reference is a single ROS process (SURVEY section 2.3); multi-host
operation is a new capability of this framework.  The design follows the
grid-sharding layout of sharding.py: the voxel grid's leading (z-major) axis
is split over the global mesh so each host holds a contiguous slab of
z-columns in its local HBM; the per-frame inputs (depth image, masks, pose)
are tiny and replicated from every host's feeder; XLA SPMD inserts the
cross-slab collectives (the pixel-table reduction and the render gather ride
ICI within a host and DCN across hosts).

Entry points:
  - :func:`initialize` — one call per process before any jax use.
  - :func:`global_mesh` — a 1-D mesh over every device of every host.
  - :func:`weak_scaling_report` — particle-updates/sec at n devices vs 1
    device with per-device problem size held constant (the BASELINE.json
    >=80 % two-host target's measurement harness; runnable today on the
    8-virtual-device CPU platform or a single real chip, and unchanged on a
    multi-host pod).

Run as a module for the report:
    python -m semantic_dsp_map_tpu.parallel.distributed [--devices 8]
"""

from __future__ import annotations

import argparse
import time
from typing import Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize wrapper.

    With no arguments JAX autodetects the cluster (TPU pod metadata / env
    vars); on a single host this is a no-op that leaves jax.devices() as-is.
    """
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process fallback (no cluster env)


def global_mesh(axis: str = "grid"):
    """A 1-D mesh spanning every device of every participating host."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def _bench_one(cfg, params, n_devices: int, frames: int) -> float:
    """Particle updates/sec of the frame step sharded over n devices."""
    import jax

    from ..frontend import MaskKpts, build_frame_input
    from ..labels import LabelRegistry
    from ..map import build_frame_step
    from ..state import init_map_state
    from .sharding import build_sharded_step, make_mesh, shard_state

    registry = LabelRegistry.default()
    H, W = cfg.height, cfg.width
    depth = (1.0 + np.arange(H, dtype=np.float32)[:, None] / H) * np.ones(
        (1, W), np.float32
    )
    f = build_frame_input(
        cfg, registry, depth,
        [MaskKpts(track_id=65535, label="static", mask=np.full((H, W), 5, np.uint8))],
        np.zeros(3, np.float32), np.array([1, 0, 0, 0], np.float32), 0.0,
    )

    if n_devices == 1:
        step = build_frame_step(cfg, params, registry)
        state = init_map_state(cfg, seed=0)
    else:
        mesh = make_mesh(n_devices)
        state = shard_state(cfg, mesh, init_map_state(cfg, seed=0))
        step = build_sharded_step(cfg, params, registry, mesh, state)

    state, result, diag = step(state, f)  # warm + fill
    _ = float(np.asarray(result.occ[:1])[0])

    updates = 0
    t0 = time.perf_counter()
    for _i in range(frames):
        state, result, diag = step(state, f)
        updates += diag.visible_count
    total = int(np.asarray(updates))
    _ = float(np.asarray(result.occ[:1])[0])
    dt = time.perf_counter() - t0
    return total / dt if dt > 0 else 0.0


def weak_scaling_report(n_devices: int, frames: int = 10) -> dict:
    """Scale the grid with the device count (weak scaling): per-device voxel
    slab held at the tiny-config size, z-axis grown n-fold."""
    from ..config import FilterParams, tiny_test_config

    params = FilterParams(if_consider_depth_noise=True, nb_ptc_num_per_point=1,
                          depth_noise_model_zero_order=0.2)
    base_cfg = tiny_test_config()
    ups1 = _bench_one(base_cfg, params, 1, frames)

    grown = tiny_test_config(
        voxel_num_axis_z_n=base_cfg.voxel_num_axis_z_n
        + int(np.log2(n_devices)),
        max_active_blocks=base_cfg.max_active_blocks * n_devices,
        max_birth_blocks=base_cfg.max_birth_blocks * n_devices,
        max_table_entries=base_cfg.max_table_entries * n_devices,
        corner_gather_blocks=base_cfg.corner_gather_blocks * n_devices,
    )
    upsN = _bench_one(grown, params, n_devices, frames)

    eff = upsN / (ups1 * n_devices) if ups1 > 0 else 0.0
    return {
        "devices": n_devices,
        "updates_per_sec_1dev": int(ups1),
        "updates_per_sec_ndev": int(upsN),
        "weak_scaling_efficiency": round(eff, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument(
        "--cpu", action="store_true",
        help="emulate the mesh on virtual CPU devices (single-chip hosts)",
    )
    ap.add_argument("--out", help="also write the report JSON to this path")
    args = ap.parse_args()

    import json
    import os
    import sys

    if args.cpu:
        # Importing this module already imported the package (and jax), so
        # env/config tweaks are too late here — re-exec with the environment
        # set before the interpreter starts.
        n = args.devices or 8
        if os.environ.get("_DSP_CPU_REEXEC") != "1":
            env = dict(os.environ)
            flags = env.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                env["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={n}"
                ).strip()
            env["JAX_PLATFORMS"] = "cpu"
            env["_DSP_CPU_REEXEC"] = "1"
            # Bootstrap via -c so jax.config forces the CPU platform BEFORE
            # the package import (some plugins ignore the env var, and any
            # device use at import time would pin the wrong backend).
            code = (
                "import jax; jax.config.update('jax_platforms', 'cpu'); "
                "import runpy; runpy.run_module("
                f"'{__spec__.name}', run_name='__main__')"
            )
            os.execve(
                sys.executable,
                [sys.executable, "-c", code] + sys.argv[1:],
                env,
            )
        import jax

        # belt and braces: some plugins ignore JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        initialize()

    n = args.devices or len(jax.devices())
    report = weak_scaling_report(n, args.frames)
    line = json.dumps(report)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
