"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
logic is testable without TPU hardware (SURVEY.md section 4), and enable the
persistent compilation cache (compiles are expensive on this small host)."""

import os

# Force the CPU backend.  NOTE: on this host the axon TPU plugin ignores the
# JAX_PLATFORMS env var; JAX_PLATFORM_NAME (and jax.config) do work.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
