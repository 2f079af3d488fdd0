"""Host-side multiprocessing for the offline featurizers.

Featurization is embarrassingly parallel across crystals (SURVEY.md §3.2:
it is the offline hot spot — the C++ periodic neighbor search is 31x NumPy,
and a worker pool multiplies that across cores). The pool uses the SPAWN
start method: the parent process usually has jax/XLA loaded (runtime
threads make fork unsafe), while spawned children re-import only the
numpy+ctypes featurizer stack.

The context manager also scrubs backend-grabbing env vars for the children:
this environment's sitecustomize hook (gated on PALLAS_AXON_POOL_IPS)
pre-imports jax and locks a tunneled TPU backend in EVERY new interpreter —
N featurizer workers must not open N TPU tunnels. Children run with
JAX_PLATFORMS=cpu should anything import jax incidentally.
"""

from __future__ import annotations

import contextlib
import multiprocessing
import os


@contextlib.contextmanager
def host_pool(workers: int, initializer=None, initargs=()):
    """Yield a spawn-context Pool with CPU-pinned child env."""
    saved = {k: os.environ.get(k)
             for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")}
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        ctx = multiprocessing.get_context("spawn")
        with ctx.Pool(workers, initializer=initializer,
                      initargs=initargs) as pool:
            yield pool
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
