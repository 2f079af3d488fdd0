"""Metrics logging: structured JSONL + the reference's append-only
experiments_{embedder}.txt format (main_eDOS.py:91,167-186) for drop-in
compatibility, plus optional jax.profiler tracing.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax


class JSONLLogger:
    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a", buffering=1)
        else:
            self._f = None

    def log(self, record: dict):
        if self._f is None:
            return
        record = {"time": time.time(), **record}
        self._f.write(json.dumps(record, default=float) + "\n")

    def close(self):
        if self._f is not None:
            self._f.close()


def write_experiment_result(
    path: str,
    configuration: str,
    best_epoch: int,
    test_rmse: float,
    test_mse: float,
    test_mae: float,
    test_r2: float,
    early_stopped: bool = False,
):
    """Append a result block in the reference's exact format
    (main_eDOS.py:167-186)."""
    with open(path, "a") as f:
        f.write("\n")
        if early_stopped:
            f.write("Early stop!!\n")
        f.write(configuration)
        f.write("\nbest epoch : {} \n".format(best_epoch))
        f.write("best RMSE : {:.4f} \n".format(test_rmse))
        f.write("best MSE : {:.4f} \n".format(test_mse))
        f.write("best MAE : {:.4f} \n".format(test_mae))
        f.write("best R2 : {:.4f} \n".format(test_r2))


class StepTimer:
    """Per-step timing -> samples/sec (the BASELINE.json metric); optional
    jax.profiler trace dump for Perfetto."""

    def __init__(self, trace_dir: Optional[str] = None):
        self.trace_dir = trace_dir
        self._t0 = None
        self.steps = 0
        self.samples = 0
        self.elapsed = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_samples: int):
        self.elapsed += time.perf_counter() - self._t0
        self.steps += 1
        self.samples += n_samples

    @property
    def samples_per_sec(self) -> float:
        return self.samples / self.elapsed if self.elapsed > 0 else 0.0

    def trace(self):
        if self.trace_dir:
            return jax.profiler.trace(self.trace_dir)
        import contextlib
        return contextlib.nullcontext()
