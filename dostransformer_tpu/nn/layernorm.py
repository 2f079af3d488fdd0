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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5  # torch nn.LayerNorm default


def lp_enabled() -> bool:
    return os.environ.get("DOSTPU_LN_LP") == "1"


def pallas_bwd_enabled() -> bool:
    """DOSTPU_LN_PALLAS=1: run the LN backward as ONE Pallas pass (dx +
    dscale/dbias partials in a single VMEM-resident read of dy/xhat)
    instead of XLA's reduce chain. Implies the LP residual format (the
    kernel reads xhat in the operand dtype). Opt-in lever targeting the
    670 us LN-bwd + 347 us convert+reduce categories of the bf16 B=64
    profile (BASELINE.md round-5)."""
    return os.environ.get("DOSTPU_LN_PALLAS") == "1"


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


def _ln_bwd_jnp(res, dy):
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


def _ln_bwd_kernel(xhat_ref, rstd_ref, dy_ref, scale_ref,
                   dx_ref, dsc_ref, dbi_ref):
    """One grid step = nb batch elements: dx plus this block's dscale/dbias
    partial sums, all from a single VMEM-resident read of xhat/dy. Math is
    the xhat-form backward of _ln_bwd_jnp, f32 throughout. The partials are
    written sublane-broadcast into [1, 8, D] blocks (Mosaic requires the
    trailing block dims be 8/128-divisible or full-extent; the caller takes
    row 0)."""
    f = jnp.float32
    xh = xhat_ref[...].astype(f)                     # [nb, L, D]
    dyf = dy_ref[...].astype(f)
    rstd = rstd_ref[...]                             # [nb, L, 1] f32
    scale = scale_ref[...].astype(f)                 # [1, D]
    d = xh.shape[-1]
    g = dyf * scale[None]                            # broadcast over nb, L
    s1 = jnp.mean(g, axis=-1, keepdims=True)
    s2 = jnp.mean(g * xh, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (g - s1 - xh * s2)).astype(dy_ref.dtype)
    dsc_ref[...] = jnp.broadcast_to(
        jnp.sum(dyf * xh, axis=(0, 1))[None, None], (1, 8, d))
    dbi_ref[...] = jnp.broadcast_to(
        jnp.sum(dyf, axis=(0, 1))[None, None], (1, 8, d))


def _pick_nb_ln(b: int, per_elem_bytes: int) -> int:
    """Elements per grid step under a VMEM budget: LN blocks are small
    (~0.3 MB per element at [201, 256] bf16) so larger groups than the
    attention kernels' cap amortize grid overhead."""
    budget = 8 * 1024 * 1024
    for n in (32, 16, 8, 4, 2, 1):
        if b % n == 0 and n * per_elem_bytes <= budget:
            return n
    return 1


def _ln_bwd_pallas(res, dy):
    xhat, rstd, scale = res
    b, l, d = xhat.shape
    itemsize = xhat.dtype.itemsize
    # xhat + dy + dx blocks, plus ~3 f32 temps of the same extent
    per_elem = l * d * (3 * itemsize + 3 * 4)
    nb = _pick_nb_ln(b, per_elem)
    blk = lambda: pl.BlockSpec((nb, l, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    part = lambda: pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    grid = b // nb
    dx, dsc, dbi = pl.pallas_call(
        _ln_bwd_kernel,
        grid=(grid,),
        in_specs=[
            blk(),
            pl.BlockSpec((nb, l, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            blk(),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[blk(), part(), part()],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, d), dy.dtype),
            jax.ShapeDtypeStruct((grid, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((grid, 8, d), jnp.float32),
        ],
        interpret=os.environ.get("DOSTPU_PALLAS_INTERPRET", "0") == "1",
    )(xhat, rstd.astype(jnp.float32), dy, scale[None])
    # cross-block partials are tiny ([grid, 8, D] f32, sublane-broadcast —
    # row 0 is the value) — XLA sums them
    return (dx, dsc[:, 0, :].sum(axis=0).astype(scale.dtype),
            dbi[:, 0, :].sum(axis=0).astype(scale.dtype))


def _ln_bwd(eps, res, dy):
    if pallas_bwd_enabled() and dy.ndim == 3:
        return _ln_bwd_pallas(res, dy)
    return _ln_bwd_jnp(res, dy)


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
    DOSTPU_LN_LP=1 / DOSTPU_LN_PALLAS=1 (the latter additionally runs the
    backward as one Pallas pass on 3D streams). All paths produce the
    identical param subtree ``{name}/{scale,bias}``."""
    if lp_enabled() or pallas_bwd_enabled():
        return LayerNormLP(epsilon=epsilon, name=name)(x)
    return fnn.LayerNorm(epsilon=epsilon, dtype=None,
                         name=name)(x).astype(x.dtype)
