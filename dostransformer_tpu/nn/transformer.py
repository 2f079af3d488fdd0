"""Pre-LN transformer encoder stack.

Re-implements the behavior of the reference's layers/transformer.py and
layers/multihead_attention.py with TPU-friendly batch-first layout
([B, L, D]; the reference uses (seq, batch, dim) — semantics identical):

  * Each layer (transformer.py:120-150): LN0 applied to q, k and v SEPARATELY
    -> projection-free attention -> res-dropout -> residual;
    LN1 -> FFN (4x widening, ReLU, xavier-uniform weights + zero bias,
    transformer.py:116-117,160-165) -> residual.
  * The key/value streams passed into the stack are FIXED across layers: each
    layer re-norms the *original* k/v inputs with its own LN0; only the query
    stream evolves (transformer.py:63-73). This holds for "self"-attention too
    (the caller passes the same tensor three times, DOSTransformer.py:71).
  * A final LayerNorm closes the stack (transformer.py:42-44,76-77).
  * Attention is projection-free softmax(QK^T * D^-0.5)V, softmax in float32
    (multihead_attention.py:68-76); num_heads is accepted for API parity but
    unused, exactly as in the reference forward. The dead in_proj/out_proj
    parameters are intentionally not created (SURVEY.md §2.3-6).
  * Divergence from a latent defect (intent fix, SURVEY.md §2.2): passing
    k/v = None performs self-attention instead of raising NameError.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from dostransformer_tpu.nn.init import xavier_uniform_init
from dostransformer_tpu.nn.layernorm import layer_norm
from dostransformer_tpu.nn.modules import LN_EPS
from dostransformer_tpu.parallel.megatron import (axis_is_bound, tp_enter,
                                                  tp_exit)
from dostransformer_tpu.ops.attention import (
    dot_product_attention,
    fused_attention,
    fused_attention_ln,
)


def _zeros_bias(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class XavierLinear(fnn.Module):
    """transformer.py:160-165 Linear: xavier_uniform weight, zero bias.

    Tensor parallelism (both inert outside a shard_map binding the axis —
    init and single-device apply see full shapes):
      * ``col_axis`` marks a COLUMN-parallel layer: the rank's kernel/bias
        hold features/tp of the outputs, so the expected param shapes are
        the local shards (flax validates shapes at apply).
      * ``psum_axis`` marks a ROW-parallel layer: the kernel seen at apply
        is this rank's [shard, out] block (the input is already local, so
        shapes line up), the matmul produces a partial sum, and the
        Megatron `g` all-reduce completes it BEFORE the (replicated) bias
        is added — adding bias per-rank would count it tp times."""

    features: int
    col_axis: Optional[str] = None
    psum_axis: Optional[str] = None

    @fnn.compact
    def __call__(self, x):
        feats = self.features
        if self.col_axis is not None and axis_is_bound(self.col_axis):
            tp = jax.lax.axis_size(self.col_axis)
            assert feats % tp == 0, (feats, tp)
            feats = feats // tp
        kernel = self.param("kernel", xavier_uniform_init, (x.shape[-1], feats))
        bias = self.param("bias", _zeros_bias, (feats,))
        y = x @ kernel.astype(x.dtype)
        if self.psum_axis is not None and axis_is_bound(self.psum_axis):
            y = tp_exit(y, self.psum_axis)
        return y + bias.astype(x.dtype)


class TransformerEncoderLayer(fnn.Module):
    embed_dim: int
    num_heads: int = 1  # accepted for parity; unused by the projection-free attention
    attn_dropout: float = 0.0
    relu_dropout: float = 0.0
    res_dropout: float = 0.0
    use_pallas: Optional[bool] = None
    tp_axis: Optional[str] = None  # Megatron-shard the FFN over this mesh
                                   # axis (active only inside a shard_map
                                   # binding it; identity otherwise)

    @fnn.compact
    def __call__(self, x, x_k, x_v, key_mask=None, deterministic: bool = True):
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"

        residual = x
        # LN0 is ONE module applied to q, k, v separately (transformer.py:132-134)
        ln0 = _SharedLN(epsilon=LN_EPS, name="ln0")

        dropout_rng = None
        if self.attn_dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")
        attn_fn = fused_attention if use_pallas else dot_product_attention
        rate = self.attn_dropout if not deterministic else 0.0
        fuse_ln = os.environ.get("DOSTPU_FUSE_LN_ATTN", "0") == "1"
        if use_pallas and fuse_ln and rate == 0.0 and self.num_heads == 1:
            # LN+attention fused in one Pallas kernel: the three LN outputs
            # never round-trip HBM. Same param tree — ln0 is materialized
            # with a dummy call (DCE'd by XLA) and its params fed in.
            # MEASURED SLOWER at the flagship shapes on v5e (BASELINE.md:
            # in-kernel LN serializes with the matmuls and the backward
            # recomputes the LNs; 5.8k vs 6.1k samples/s) — hence opt-in;
            # revisit at larger hidden/batch where the saved HBM traffic
            # outweighs the VPU time.
            _ = ln0(jnp.zeros((1, x.shape[-1]), x.dtype))
            lnp = ln0.variables["params"]["ln"]
            a = fused_attention_ln(x, x_k, x_v, lnp["scale"], lnp["bias"],
                                   key_mask)
            a = fnn.Dropout(self.res_dropout, name="res_drop0")(
                a, deterministic=deterministic)
            x = residual + a
            return self._ffn(x, deterministic)
        q = ln0(x)
        k = ln0(x_k)
        v = ln0(x_v)
        if self.num_heads > 1:
            # opt-in extension: true head-split attention. The reference's
            # forward ignores num_heads (multihead_attention.py:49-76 — its
            # projection-free math is single-head); num_heads=1 (default)
            # reproduces that exactly.
            h = self.num_heads
            b, lq, d = q.shape
            assert d % h == 0, (d, h)

            def split(t):
                bb, ll, _ = t.shape
                return (t.reshape(bb, ll, h, d // h)
                        .transpose(0, 2, 1, 3).reshape(bb * h, ll, d // h))

            mask_h = (jnp.repeat(key_mask, h, axis=0)
                      if key_mask is not None else None)
            a = attn_fn(split(q), split(k), split(v), mask_h,
                        dropout_rate=rate, dropout_rng=dropout_rng)
            a = (a.reshape(b, h, lq, d // h)
                 .transpose(0, 2, 1, 3).reshape(b, lq, d))
        else:
            a = attn_fn(q, k, v, key_mask,
                        dropout_rate=rate, dropout_rng=dropout_rng)
        a = fnn.Dropout(self.res_dropout, name="res_drop0")(a, deterministic=deterministic)
        x = residual + a
        return self._ffn(x, deterministic)

    def _ffn(self, x, deterministic):
        residual = x
        # dtype=None promotes the operand with the f32 params: bf16/f32
        # inputs compute in f32 (the TPU mixed-precision policy), f64 inputs
        # (x64 CPU parity runs) stay f64
        h = layer_norm(x, "ln1")
        # Megatron FFN sharding (SURVEY §2.5 TP row): fc1 column-parallel,
        # fc2 row-parallel. tp_enter/tp_exit are the f/g conjugate
        # all-reduces; both are identity when tp_axis is unset or unbound
        # (init, single-device apply), so this is ONE code path.
        tp = (self.tp_axis
              if self.tp_axis is not None and axis_is_bound(self.tp_axis)
              else None)
        if tp is not None:
            h = tp_enter(h, tp)
        h = jax.nn.relu(
            XavierLinear(4 * self.embed_dim, col_axis=tp, name="fc1")(h))
        h = fnn.Dropout(self.relu_dropout, name="relu_drop")(h, deterministic=deterministic)
        h = XavierLinear(self.embed_dim, psum_axis=tp, name="fc2")(h)
        h = fnn.Dropout(self.res_dropout, name="res_drop1")(h, deterministic=deterministic)
        return residual + h


class _SharedLN(fnn.Module):
    """One LayerNorm parameter set applied to several inputs."""

    epsilon: float = LN_EPS

    @fnn.compact
    def __call__(self, x):
        return layer_norm(x, "ln", epsilon=self.epsilon)


class TransformerEncoder(fnn.Module):
    """Stack of TransformerEncoderLayers + final LayerNorm
    (transformer.py:8-79). k/v inputs are fixed across layers."""

    embed_dim: int
    num_heads: int = 1
    layers: int = 2
    attn_dropout: float = 0.0
    relu_dropout: float = 0.0
    res_dropout: float = 0.0
    embed_dropout: float = 0.0
    use_pallas: Optional[bool] = None
    tp_axis: Optional[str] = None
    remat: bool = False  # rematerialize each layer in the backward pass
                         # (jax.checkpoint: trade FLOPs for activation memory)

    @fnn.compact
    def __call__(self, x_in, x_in_k=None, x_in_v=None, key_mask=None,
                 deterministic: bool = True):
        x = fnn.Dropout(self.embed_dropout, name="embed_drop")(
            x_in, deterministic=deterministic)
        if (x_in_k is None) != (x_in_v is None):
            # one-sided k/v would silently degrade to full self-attention,
            # discarding the stream the caller DID supply
            raise ValueError("pass both x_in_k and x_in_v (cross-attention) "
                             "or neither (self-attention)")
        if x_in_k is None:
            x_k = x_v = x
        else:
            x_k = fnn.Dropout(self.embed_dropout, name="embed_drop_k")(
                x_in_k, deterministic=deterministic)
            x_v = fnn.Dropout(self.embed_dropout, name="embed_drop_v")(
                x_in_v, deterministic=deterministic)

        layer_cls = TransformerEncoderLayer
        if self.remat:
            # statics: key_mask slot only when it is None, plus deterministic
            statics = (4, 5) if key_mask is None else (5,)
            layer_cls = fnn.remat(TransformerEncoderLayer,
                                  static_argnums=statics)

        for i in range(self.layers):
            x = layer_cls(
                self.embed_dim, self.num_heads, self.attn_dropout,
                self.relu_dropout, self.res_dropout, self.use_pallas,
                self.tp_axis, name=f"layer{i}",
            )(x, x_k, x_v, key_mask, deterministic)

        return layer_norm(x, "final_ln")
