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

from dostransformer_tpu.train.loss import clamp_negative


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
    graph_mask: jax.Array | None = None,
) -> dict:
    """One eval batch's PER-SAMPLE metric contributions (device part; r2 and
    the masked averaging finish on the host in MetricAccumulator).

    The reference evaluates at batch_size=1 and averages per sample
    (utils.py:61-143); returning per-sample values keeps those exact
    semantics at any eval batch size (needed for sharded eval under data
    parallelism, where batches must be divisible by the mesh).

    clamp=True  -> eDOS `test` semantics (clamp y and preds, utils.py:74-76)
    clamp=False -> phDOS `test_phonon` semantics (no clamping)
    """
    if clamp:
        y = clamp_negative(y)
        preds_system = clamp_negative(preds_system)
    mse = jnp.mean((y - preds_system) ** 2, axis=-1)   # [B]
    rmse = jnp.sqrt(mse)
    mae = jnp.mean(jnp.abs(preds_system - y), axis=-1)  # L1 over bins, [B]
    if graph_mask is None:
        graph_mask = jnp.ones(y.shape[0], y.dtype)
    return {
        "mse": mse,
        "rmse": rmse,
        "mae": mae,
        "mask": graph_mask,
        "preds": preds_system,
        "y": y,
    }


class MetricAccumulator:
    """Per-sample running means over eval batches — identical to the
    reference's batch-1 running means (utils.py:68-112: loss_x / (bc+1)),
    generalized to any batch size via the graph mask."""

    def __init__(self):
        self.n = 0
        self.sums = {"rmse": 0.0, "mse": 0.0, "mae": 0.0, "r2": 0.0}

    def update(self, m: dict):
        mask = np.asarray(m["mask"]) > 0.5
        n_real = int(mask.sum())
        if n_real == 0:
            return
        self.n += n_real
        for k in ("rmse", "mse", "mae"):
            self.sums[k] += float(np.asarray(m[k])[mask].sum())
        ys = np.asarray(m["y"])[mask]
        ps = np.asarray(m["preds"])[mask]
        # reference computes r2 per sample (flattened [1, bins]) and averages
        self.sums["r2"] += sum(r2_variance_weighted(yy, pp)
                               for yy, pp in zip(ys, ps))

    def result(self) -> dict:
        if self.n == 0:
            # zero accumulated samples must not read as a PERFECT eval
            # (rmse 0.0 would beat any real checkpoint in BestTracker)
            raise ValueError(
                "MetricAccumulator.result() with no real samples "
                "accumulated — the eval split is empty or all-dummy")
        return {k: v / self.n for k, v in self.sums.items()}
