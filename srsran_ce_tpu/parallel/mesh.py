"""Device-mesh helpers for single-host and multi-host TPU deployments.

The reference has no distribution at all (SURVEY.md §2: no torch.distributed, no
collectives); the mesh axes here implement the north-star scale-out design:

  dp — data parallel over (cell, UE, antenna-port, slot) estimation problems
  sp — sequence(subcarrier) parallel over the frequency axis of one wideband problem,
       with overlap-save halo exchange of RC-filter edge taps over ICI

On a pod slice, `dp` should map to the DCN/outer axis and `sp` to an ICI-contiguous
axis so halo ppermutes ride the torus links.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("dp", "sp"),
    devices=None,
) -> Mesh:
    """Create a mesh over the available devices.

    Default: all devices on axis 'dp' (sp=1). Pass shape=(n_dp, n_sp) to split.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    # Auto axis types: classic sharding propagation (zeros/intermediates created
    # inside jit pick up shardings from consumers instead of demanding explicit
    # out_sharding annotations on every scatter/creation op).
    axis_types = (jax.sharding.AxisType.Auto,) * len(axis_names)
    return jax.make_mesh(shape, tuple(axis_names), devices=devices, axis_types=axis_types)


def multihost_initialize():
    """Initialize jax.distributed for multi-host pods (no-op if single process).

    The reference framework has no multi-host story; this is the JAX-native
    equivalent of what would otherwise be an MPI/NCCL bootstrap.
    """
    try:
        if jax.process_count() > 1:
            return  # already initialized
        jax.distributed.initialize()
    except Exception:
        # Single-process (CPU tests, one-chip bench) — nothing to do.
        pass


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding for (B, ...) problem batches: leading axis split over `axis`."""
    return NamedSharding(mesh, P(axis))
