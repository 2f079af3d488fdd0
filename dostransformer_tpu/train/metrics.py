"""Evaluation metrics with reference semantics (utils.py:61-143).

Per evaluation *batch* (batch_size 1 in the reference eval loops):
  * eDOS (`test`, utils.py:61-112): clamp y AND preds_system at 0, per-sample
    RMSE/MSE over bins -> mean, MAE via L1 over the full tensor, r2
    variance_weighted over the FLATTENED tensors (utils.py:20-23), all
    accumulated as running means over batches. Metrics evaluate the system
    head only; dos_global is trained but never evaluated.
  * phDOS (`test_phonon`, utils.py:117-143): same minus clamping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def r2_variance_weighted(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """sklearn r2_score(y.flatten(), p.flatten(), 'variance_weighted')
    (utils.py:20-23). Flattened single-output arrays make variance weighting a
    no-op: r2 = 1 - SS_res/SS_tot."""
    y_true = np.asarray(y_true, np.float64).ravel()
    y_pred = np.asarray(y_pred, np.float64).ravel()
    ss_res = ((y_true - y_pred) ** 2).sum()
    ss_tot = ((y_true - y_true.mean()) ** 2).sum()
    if ss_tot == 0.0:
        return 1.0 if ss_res == 0.0 else 0.0
    return float(1.0 - ss_res / ss_tot)


def eval_metrics(
    preds_system: jax.Array,
    y: jax.Array,
    clamp: bool = True,
) -> dict:
    """One eval batch's metric contributions (device part; r2 finishes on host).

    clamp=True  -> eDOS `test` semantics (clamp y and preds, utils.py:74-76)
    clamp=False -> phDOS `test_phonon` semantics (no clamping)
    """
    if clamp:
        y = jnp.where(y < 0, 0.0, y)
        preds_system = jnp.where(preds_system < 0, 0.0, preds_system)
    mse = jnp.mean((y - preds_system) ** 2, axis=-1)  # per-sample
    rmse = jnp.sqrt(mse)
    mae = jnp.mean(jnp.abs(preds_system - y))         # L1Loss over full tensor
    return {
        "mse": mse.mean(),
        "rmse": rmse.mean(),
        "mae": mae,
        "preds": preds_system,
        "y": y,
    }


class MetricAccumulator:
    """Running means over eval batches (utils.py:68-112: loss_x / (bc+1))."""

    def __init__(self):
        self.n = 0
        self.sums = {"rmse": 0.0, "mse": 0.0, "mae": 0.0, "r2": 0.0}

    def update(self, m: dict):
        self.n += 1
        self.sums["rmse"] += float(m["rmse"])
        self.sums["mse"] += float(m["mse"])
        self.sums["mae"] += float(m["mae"])
        self.sums["r2"] += r2_variance_weighted(np.asarray(m["y"]),
                                                np.asarray(m["preds"]))

    def result(self) -> dict:
        n = max(self.n, 1)
        return {k: v / n for k, v in self.sums.items()}
