"""Training loss.

Reference semantics (main_eDOS.py:111-123; main_phDOS.py:109-114):
  * eDOS ONLY: targets are clamped at 0 from below during training
    (y = where(y<0, 0, y), main_eDOS.py:111-112); predictions are NOT
    clamped at train time (they are at eval — utils.py:74-76 — the
    train/eval clamp asymmetry is normative). The phDOS loop applies its
    criterion directly with NO target clamp (main_phDOS.py:109-114) — the
    CLI passes clamp_targets=False for phDOS; the clamp would be a no-op
    there only because phonon DOS targets are nonnegative;
  * per-sample MSE over the energy bins -> sqrt -> mean over the batch, for
    both heads: loss = rmse_global + beta * rmse_system.

phDOS (batch_size 1) computes MSELoss over the whole [1, bins] tensor then
sqrt — identical to the per-sample formula at batch 1.

Padded dummy graphs (graph_mask == 0) are excluded from the batch mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clamp_negative(y: jax.Array) -> jax.Array:
    """torch.where(y < 0, 0, y) (main_eDOS.py:111-112)."""
    return jnp.where(y < 0, 0.0, y)


def per_sample_rmse(pred: jax.Array, y: jax.Array) -> jax.Array:
    """sqrt(mean_bins((y - pred)^2)) per sample -> [B].

    Safe-sqrt form: sqrt'(0) is infinite, and a row whose MSE is float-exact
    0 (e.g. a padded dummy graph whose output happens to hit the zero
    target) would turn the masked loss's `0 * inf` into NaN and poison every
    parameter gradient. The where-pair keeps VALUES bit-identical
    (sqrt(mse) when mse > 0, 0 at 0) while the gradient at 0 becomes 0."""
    mse = jnp.mean((y - pred) ** 2, axis=-1)
    safe = jnp.where(mse > 0, mse, 1.0)
    return jnp.where(mse > 0, jnp.sqrt(safe), 0.0)


def dos_loss_parts(
    preds_global: jax.Array,
    preds_system: jax.Array | None,
    y: jax.Array,
    graph_mask: jax.Array,
    clamp_targets: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Unnormalized masked sums (sum_rmse_global, sum_rmse_system, count).

    The building block for data-parallel loss under shard_map: each device
    computes local sums, psums them, and divides by the global count — exact
    batch-mean semantics at any sharding. preds_system=None (single-head
    baselines) returns sum_g for both heads.
    """
    if clamp_targets:
        y = clamp_negative(y)
    m = graph_mask.astype(y.dtype)
    count = m.sum()
    sum_g = (per_sample_rmse(preds_global, y) * m).sum()
    if preds_system is None:
        return sum_g, sum_g, count
    sum_s = (per_sample_rmse(preds_system, y) * m).sum()
    return sum_g, sum_s, count


def dos_loss(
    preds_global: jax.Array,
    preds_system: jax.Array | None,
    y: jax.Array,
    graph_mask: jax.Array,
    beta: float = 1.0,
    clamp_targets: bool = True,
) -> tuple[jax.Array, dict]:
    """loss = mean_b rmse_global + beta * mean_b rmse_system over real graphs.

    preds_system=None covers the single-head baseline models (graphnetwork/mlp
    families return one DOS tensor): loss = mean_b rmse only.
    """
    sum_g, sum_s, count = dos_loss_parts(preds_global, preds_system, y,
                                         graph_mask, clamp_targets)
    denom = jnp.maximum(count, 1.0)
    rmse_g = sum_g / denom
    rmse_s = sum_s / denom
    if preds_system is None:
        return rmse_g, {"rmse_global": rmse_g, "rmse_system": rmse_s}
    loss = rmse_g + beta * rmse_s
    return loss, {"rmse_global": rmse_g, "rmse_system": rmse_s}
