"""Multi-device scaling: voxel-grid sharding over a jax.sharding.Mesh."""

from .sharding import make_mesh, state_shardings, build_sharded_step

__all__ = ["make_mesh", "state_shardings", "build_sharded_step"]
