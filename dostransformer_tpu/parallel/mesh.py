"""jax.sharding.Mesh construction + NamedShardings.

The reference has NO distributed support (SURVEY.md §2.5: single device,
single process, main_eDOS.py:27-28). The TPU-native plan is first-class data
parallelism: a 1-D 'data' mesh over ICI; GraphBatch leaves are batch-leading
and sharded over 'data'; parameters are replicated; XLA inserts the gradient
all-reduce (psum over ICI) from the shardings — no NCCL/MPI analogue needed.

Tensor/pipeline/sequence/expert parallelism are N/A-by-scale for this model
family (h=256, ~6.7M params; sequences <= 201 tokens — SURVEY.md §2.5), but the
mesh accepts extra axes so a 2-D ('data', 'model') layout can shard the 4x FFN
if the model is ever scaled up.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axes: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a Mesh. Default: all visible devices on one 'data' axis."""
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.array(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) init. On a single host this is a no-op; on a multi-host
    TPU pod slice jax.distributed.initialize auto-detects the topology."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except (ValueError, RuntimeError):
        pass  # single-process environment
