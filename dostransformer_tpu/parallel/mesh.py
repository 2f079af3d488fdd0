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

import os
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


# Env markers of a managed multi-process launch that jax.distributed can
# auto-detect (Slurm / Open MPI / TPU pod metadata / GKE jobset). A marker
# that implies ANOTHER process exists means "the user *is* running
# multi-process" — a failed init must then raise, never silently degrade to
# single-process training on 1/N of the data. Markers that merely say "this
# is a managed TPU VM" with a SINGLE worker (e.g. TPU_WORKER_HOSTNAMES with
# one hostname — set by single-host TPU VM images and by this env's tunnel
# runtime) are NOT a cluster: there is no other process to lose data to, so
# they must not force an init that would raise once the backend is up.
_CLUSTER_ENV_VARS = (
    "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE", "PMI_SIZE",
    "TPU_WORKER_HOSTNAMES", "TPU_SKYLARK_WORKER_ID", "MEGASCALE_COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID",
)


def _cluster_is_multiprocess() -> bool:
    """True iff the environment indicates a launch with MORE THAN ONE
    process (the case where silent single-process fallback would train on
    1/N of the data)."""
    env = os.environ
    # explicit coordinator: someone is pointing at a rendezvous — always
    # treat as multi-process (a dead coordinator must fail loudly)
    for v in ("MEGASCALE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
              "COORDINATOR_ADDRESS"):
        if env.get(v):
            return True
    # size-carrying markers: multi-process only when size > 1
    for v in ("OMPI_COMM_WORLD_SIZE", "PMI_SIZE", "SLURM_NTASKS",
              "SLURM_NPROCS"):
        val = env.get(v)
        if val:
            try:
                if int(val) > 1:
                    return True
            except ValueError:
                return True  # unparseable size: prefer the loud path
    # bare SLURM_JOB_ID without a task count is a 1-task allocation wrapper:
    # intentionally NOT a multi-process marker on its own
    hostnames = env.get("TPU_WORKER_HOSTNAMES")
    if hostnames:
        return "," in hostnames  # one hostname == single-worker TPU VM
    # worker/task ids without a hostnames list: ambiguous — prefer loud
    return bool(env.get("TPU_SKYLARK_WORKER_ID")
                or env.get("CLOUD_TPU_TASK_ID"))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         initialization_timeout: Optional[int] = None) -> bool:
    """Multi-host (DCN) init via ``jax.distributed.initialize``.

    Returns True if distributed runtime is (now) initialized, False for the
    documented single-process case. Semantics:

    * already initialized (``jax.process_count() > 1``) -> no-op, True;
    * explicit args given, or a cluster launcher detected in the environment
      (Slurm / MPI / TPU pod metadata) -> initialize; any failure RAISES —
      a botched DCN init on a pod must not silently continue as a single
      process training on 1/N of the data;
    * plain single-process environment -> no-op, False.

    Exercised by tests/test_multihost.py with two local CPU processes over a
    real coordinator socket (the env has no multi-host TPU).
    """
    # NB: must not touch the XLA backend before jax.distributed.initialize
    # (jax.process_count() would initialize it and the init then raises) —
    # is_initialized() only inspects the distributed client state.
    if jax.distributed.is_initialized():
        return True  # already initialized
    env = os.environ
    # manual pod bring-up (no Slurm/MPI/TPU-metadata launcher): the explicit
    # triple can come from the environment — jax 0.9 has no generic env-var
    # cluster detector, so without this a hand-launched pod could not reach
    # jax.distributed.initialize through the CLIs at all
    if coordinator_address is None:
        coordinator_address = env.get("JAX_COORDINATOR_ADDRESS") or None
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    explicit = any(v is not None
                   for v in (coordinator_address, num_processes, process_id))
    if not explicit and not _cluster_is_multiprocess():
        return False  # documented single-process case (incl. single-worker
                      # managed TPU VMs — see _cluster_is_multiprocess)
    kwargs = {}
    if initialization_timeout is not None:
        kwargs["initialization_timeout"] = initialization_timeout
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id, **kwargs)
    return True


def fetch_global(tree):
    """Fetch a pytree of device arrays to host NumPy, correct on pods.

    Gates on the arrays' actual addressability, not jax.process_count():
    a fully-addressable tree (single process, or replicated/meshless outputs
    in a multi-process job) fetches with plain np.asarray — calling the
    allgather collective there would CONCATENATE the per-process copies and
    deadlock single-caller paths. Only arrays whose shards span processes
    take the process_allgather path (which every process must enter)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if any(isinstance(l, jax.Array) and not l.is_fully_addressable
           for l in leaves):
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(tree, tiled=True)
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
