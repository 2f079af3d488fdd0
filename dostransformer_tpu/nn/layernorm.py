"""LayerNorm with low-precision saved residuals (the bf16 LN-bwd lever).

The round-4 bf16 B=64 device profile (BASELINE.md) names LN-backward
reductions at 670 us/step (~9% of the step) plus 347 us of convert+reduce:
flax's LayerNorm promotes the operand to float32 at entry, so its backward
reads float32 [2B, 201, 256] residuals and materializes convert ops at the
bf16 boundary — pure HBM traffic at bandwidth-bound shapes.

``layer_norm_lp`` computes the IDENTICAL forward (float32 statistics via the
same fast-variance formula flax uses, scale/bias applied in float32, output
cast to the operand dtype) but its custom VJP:

  * saves xhat in the OPERAND dtype (bf16 under bf16 compute — halves the
    backward's residual-read bytes; f32/f64 operands keep full precision),
  * takes the upstream cotangent in the operand dtype (the output cast lives
    INSIDE the op, so no f32 cotangent tensor materializes),
  * runs every reduction with a float32 accumulator directly on the bf16
    operands (XLA fuses the widening into the reduce — no convert pass).

Gradient math (standard xhat-form LN backward):
  dx     = rstd * (g - mean_d(g) - xhat * mean_d(g * xhat)),  g = dy * scale
  dscale = sum_leading(dy * xhat)
  dbias  = sum_leading(dy)

Enabled via DOSTPU_LN_LP=1 (measured lever, BASELINE.md round-5); the
default path stays bit-identical to flax. Reference semantics being
mirrored: torch nn.LayerNorm inside layers/transformer.py:42-76 (the
reference runs LN in the module dtype; our f32-stats policy is the standard
TPU mixed-precision choice, golden-pinned at >= f32 in the x64 tests).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from flax import linen as fnn

LN_EPS = 1e-5  # torch nn.LayerNorm default


def lp_enabled() -> bool:
    return os.environ.get("DOSTPU_LN_LP") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_lp(x, scale, bias, eps: float = LN_EPS):
    y, _ = _ln_fwd(x, scale, bias, eps)
    return y


def _ln_fwd(x, scale, bias, eps):
    f = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(f)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    # flax's use_fast_variance formula (E[x^2] - E[x]^2, clamped) so the
    # forward matches fnn.LayerNorm(dtype=None) op-for-op
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mean2 - mu * mu)
    rstd = jax.lax.rsqrt(var + jnp.asarray(eps, f))
    # flax's _normalize op ORDER (mul = rstd * scale first) so the forward
    # is bit-identical to fnn.LayerNorm(dtype=None) at every operand dtype
    y = ((xf - mu) * (rstd * scale.astype(f)) + bias.astype(f)).astype(x.dtype)
    xhat = (xf - mu) * rstd
    # residuals in the OPERAND dtype: bf16 under bf16 compute
    return y, (xhat.astype(x.dtype), rstd, scale)


def _ln_bwd(eps, res, dy):
    xhat, rstd, scale = res
    f = jnp.promote_types(dy.dtype, jnp.float32)
    d = xhat.shape[-1]
    g = dy * scale.astype(dy.dtype)
    # row statistics: f32 accumulators directly over the low-precision
    # operands (reduce-with-widening fuses; no materialized convert)
    s1 = jnp.sum(g, axis=-1, keepdims=True, dtype=f) / d
    s2 = jnp.sum(g * xhat, axis=-1, keepdims=True, dtype=f) / d
    dx = (rstd * (g.astype(f) - s1 - xhat.astype(f) * s2)).astype(dy.dtype)
    lead = tuple(range(dy.ndim - 1))
    dscale = jnp.sum(dy * xhat, axis=lead, dtype=f).astype(scale.dtype)
    dbias = jnp.sum(dy, axis=lead, dtype=f).astype(scale.dtype)
    return dx, dscale, dbias


layer_norm_lp.defvjp(_ln_fwd, _ln_bwd)


class LayerNormLP(fnn.Module):
    """Drop-in for ``fnn.LayerNorm(dtype=None)(x).astype(x.dtype)`` with the
    low-precision-residual VJP. Same param names/shapes/initializers, so the
    tree (and every checkpoint) is unchanged."""

    epsilon: float = LN_EPS

    @fnn.compact
    def __call__(self, x):
        scale = self.param("scale", fnn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (x.shape[-1],),
                          jnp.float32)
        return layer_norm_lp(x, scale, bias, self.epsilon)


def layer_norm(x, name: str, epsilon: float = LN_EPS):
    """The transformer LN dispatch: flax LayerNorm (promote-to-f32, cast
    back — the golden-pinned default) or the LP-residual variant under
    DOSTPU_LN_LP=1. Both produce the identical param subtree ``{name}/
    {scale,bias}``."""
    if lp_enabled():
        return LayerNormLP(epsilon=epsilon, name=name)(x)
    return fnn.LayerNorm(epsilon=epsilon, dtype=None,
                         name=name)(x).astype(x.dtype)
