"""Multi-host initialization helpers.

The reference has no distributed dimension (single-process Go); fennec-tpu
scales across hosts/slices the standard JAX way: jax.distributed +
pjit/shard_map over a global Mesh — collectives ride ICI within a slice
and DCN between slices, inserted by XLA (no custom transport).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (no-op on single-host setups).

    On cloud TPU pods the arguments are auto-detected from the
    environment; pass them explicitly elsewhere.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # Single-host (or already initialized) — proceed with local devices.
        pass


def global_data_mesh():
    """1D 'data' mesh over every addressable device across all hosts."""
    from .mesh import make_mesh

    devs = jax.devices()
    return make_mesh((len(devs),), ("data",), devs)
