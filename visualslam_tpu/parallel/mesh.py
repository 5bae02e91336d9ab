"""Device-mesh helpers.

The engine's parallel axes (SURVEY.md §2.4):
  'data'  — frames / images (DP): frontends are embarrassingly parallel
  'shard' — observation/landmark blocks inside BA (the trajectory-axis
            analogue of sequence parallelism, SURVEY.md §5 long-context)

All communication is XLA collectives over the mesh (psum / all_gather /
reduce_scatter / ppermute) — there is no hand-written transport layer.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} devices are visible "
                f"({devs[0].platform}); for CI meshes set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"and jax_platforms=cpu before backend init")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(n_data: int, n_shard: int) -> Mesh:
    devs = np.asarray(jax.devices()[: n_data * n_shard])
    return Mesh(devs.reshape(n_data, n_shard), ("data", "shard"))
