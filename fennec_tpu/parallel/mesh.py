"""Device mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[int],
              axis_names: Sequence[str],
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh of the given logical shape over available devices."""
    devs = list(devices) if devices is not None else jax.devices()
    n = int(np.prod(axis_sizes))
    if n > len(devs):
        raise ValueError(
            f"fennec: mesh needs {n} devices, have {len(devs)}")
    grid = np.asarray(devs[:n]).reshape(tuple(axis_sizes))
    return Mesh(grid, tuple(axis_names))


def data_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1D data-parallel mesh over n devices (default: all)."""
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    return make_mesh((n,), ("data",), devs)


def data_spatial_mesh(n_devices: int, spatial: int = 2) -> Mesh:
    """2D mesh: batch over 'data', image rows over 'spatial' — the
    structural twin of context parallelism for oversized images."""
    if spatial < 1 or n_devices % spatial != 0:
        # Silently degrading to spatial=1 would skip the row sharding the
        # caller asked for (and OOM on the oversized images it was for).
        raise ValueError(
            f"fennec: spatial={spatial} must divide n_devices={n_devices}")
    return make_mesh((n_devices // spatial, spatial),
                     ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for (B, H, W, C) image batches: batch over 'data', and
    optionally rows over 'spatial'."""
    if spatial and "spatial" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "spatial", None, None))
    return NamedSharding(mesh, P("data"))


def scalar_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-image (B,) vectors."""
    return NamedSharding(mesh, P("data"))
