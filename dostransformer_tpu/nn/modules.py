"""GNN building blocks.

Faithful functional re-implementations of the reference's shared block
structure (SURVEY.md §2.2; reference embedder_eDOS/DOSTransformer.py:100-189,
embedder_phDOS/DOSTransformer_phonon.py:126-211), re-designed for batch-leading
fixed-shape graph batches ([B, A, .] nodes / [B, Eg, .] edges with local
indices):

  * Encoder: node/edge(/global) MLPs  Linear->PReLU->Linear
  * Processor = EdgeModel (gather by edge endpoints + MLP) then NodeModel
    (masked per-graph segment aggregation + MLP); the residual is applied by
    the caller (DOSTransformer.py:56-59).
  * EdgeModel mlp: Linear(3h->2h) -> LayerNorm -> PReLU -> Linear(2h->h)
  * NodeModel: scatter edge features onto the *receiver* node
    (col = edge_index[1], DOSTransformer.py:187) via segment-sum (eDOS) or
    segment-mean (phDOS, DOSTransformer_phonon.py:209), concat with x, then the
    same MLP shape. (The reference's node_mlp_1 is dead weight — created but
    never called — and is intentionally not reproduced.)
  * Decoder: graph readout — with batch-leading layout, scatter_sum(x, batch)
    is a masked sum over the node axis; no scatter op at all.

All aggregations are graph-local: batch-axis sharding needs no collectives.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as fnn

from dostransformer_tpu.nn.init import (
    torch_linear_bias_init,
    torch_linear_kernel_init,
)
from dostransformer_tpu.ops.segment import batched_segment_mean, batched_segment_sum

LN_EPS = 1e-5  # torch nn.LayerNorm default


class TorchLinear(fnn.Module):
    """nn.Linear with torch default initialization.

    Mixed precision: params are stored float32 and cast to the operand dtype —
    feeding bfloat16 activations runs the matmul natively on the MXU.

    Split/gather form: ``x`` may be a sequence of ``(tensor, gather_idx)``
    pairs whose (gathered) concatenation along the last axis is the logical
    input. Each part is projected through its slice of the kernel FIRST and
    gathered (``take_along_axis`` on axis 1) AFTER — mathematically identical
    to concat-then-matmul, but node-level parts are projected at node count
    instead of edge count (~12x fewer rows for the crystal graphs here), the
    dominant-FLOP optimization for message passing. The parameter tree is
    identical in both forms."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = torch_linear_kernel_init

    @fnn.compact
    def __call__(self, x):
        parts = x if isinstance(x, (list, tuple)) else ((x, None),)
        fan_in = sum(t.shape[-1] for t, _ in parts)
        kernel = self.param("kernel", self.kernel_init, (fan_in, self.features))
        off, y = 0, None
        for t, idx in parts:
            k = kernel[off:off + t.shape[-1]].astype(t.dtype)
            part = t @ k
            if idx is not None:
                part = jnp.take_along_axis(part, idx[..., None], axis=1)
            y = part if y is None else y + part
            off += t.shape[-1]
        if self.use_bias:
            bias = self.param("bias", torch_linear_bias_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class PReLU(fnn.Module):
    """torch nn.PReLU default: ONE shared learnable slope, init 0.25."""

    init_value: float = 0.25

    @fnn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda k, s: jnp.full(s, self.init_value, jnp.float32), (1,))
        return jnp.maximum(x, 0.0) + a.astype(x.dtype) * jnp.minimum(x, 0.0)


class MLP2(fnn.Module):
    """Linear(in->h) -> PReLU -> Linear(h->h): the encoder MLP shape
    (DOSTransformer.py:103-105)."""

    hidden: int

    @fnn.compact
    def __call__(self, x):
        x = TorchLinear(self.hidden, name="lin0")(x)
        x = PReLU(name="prelu")(x)
        x = TorchLinear(self.hidden, name="lin1")(x)
        return x


class MLPBlock(fnn.Module):
    """Linear(in->mid) -> LayerNorm -> PReLU -> Linear(mid->out): the
    EdgeModel/NodeModel MLP shape (DOSTransformer.py:171,182).
    LayerNorm statistics run in float32 regardless of operand dtype (standard
    TPU mixed-precision policy: matmuls bf16, norms f32)."""

    mid: int
    out: int

    @fnn.compact
    def __call__(self, x, fused_mp=None):
        lin0 = TorchLinear(self.mid, name="lin0")
        # dtype=None promotes with the f32 params: f32 stats for bf16/f32
        # operands (standard policy), f64 for x64 CPU parity runs
        ln = fnn.LayerNorm(epsilon=LN_EPS, dtype=None, name="ln")
        prelu = PReLU(name="prelu")
        lin1 = TorchLinear(self.out, name="lin1")

        if fused_mp is not None:
            # fused message-passing path (ops/fused_mp.py): same math and the
            # SAME param tree — children are materialized with dummy calls
            # (DCE'd by XLA) and their params fed to the Pallas kernel
            from dostransformer_tpu.ops.fused_mp import fused_mp_edge

            xn, senders, receivers, e_feat, edge_mask = fused_mp
            h_in = xn.shape[-1]
            fan_in = 2 * h_in + e_feat.shape[-1]
            _ = lin0(jnp.zeros((1, fan_in), xn.dtype))
            _ = ln(jnp.zeros((1, self.mid)))
            _ = prelu(jnp.zeros((1, 1)))
            _ = lin1(jnp.zeros((1, self.mid), xn.dtype))
            p0 = lin0.variables["params"]
            p1 = lin1.variables["params"]
            k0 = p0["kernel"].astype(xn.dtype)
            sp = xn @ k0[:h_in]
            dp = xn @ k0[h_in:2 * h_in]
            ep = e_feat @ k0[2 * h_in:] + p0["bias"].astype(xn.dtype)
            return fused_mp_edge(
                sp, dp, ep, senders, receivers, edge_mask,
                ln.variables["params"]["scale"],
                ln.variables["params"]["bias"],
                prelu.variables["params"]["alpha"],
                p1["kernel"], p1["bias"])

        h = lin0(x)
        h = ln(h).astype(h.dtype)
        h = prelu(h)
        return lin1(h)


class EdgeModel(fnn.Module):
    """e' = MLP([x_src, x_dst, e]) (DOSTransformer.py:168-175).
    x [B, A, h]; senders/receivers [B, Eg] local indices.

    The first Linear is applied in project-then-gather form (see TorchLinear):
    the src/dst kernel slices run at node count, not edge count — identical
    math, ~2.9x fewer FLOPs at 12 edges/atom."""

    hidden: int
    use_fused_mp: bool = False

    @fnn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask=None):
        mlp = MLPBlock(self.hidden * 2, self.hidden, name="edge_mlp")
        if self.use_fused_mp:
            # returns (edge_out, masked sum-aggregation onto receivers)
            return mlp(None, fused_mp=(x, senders, receivers, edge_attr,
                                       edge_mask))
        parts = ((x, senders), (x, receivers), (edge_attr, None))
        return mlp(parts), None


class NodeModel(fnn.Module):
    """x' = MLP([x, agg(e -> receiver)]) with agg = segment_sum (eDOS,
    DOSTransformer.py:184-189) or segment_mean (phDOS,
    DOSTransformer_phonon.py:206-211). Pad edges are masked out of the
    aggregation (and out of the mean's denominator)."""

    hidden: int
    aggregation: str = "sum"  # "sum" | "mean"

    @fnn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask,
                 agg_sum=None):
        """agg_sum: precomputed masked sum-aggregation (the fused kernel
        returns it); otherwise computed here via segment ops."""
        a = x.shape[1]
        if self.aggregation not in ("sum", "mean"):
            # validate on BOTH branches: the fused path used to fall
            # through to mean for any unknown value while the non-fused
            # path raised — a backend-dependent silent divergence
            raise ValueError(f"unknown aggregation {self.aggregation!r}")
        if agg_sum is not None:
            if self.aggregation == "sum":
                agg = agg_sum
            else:
                count = batched_segment_sum(
                    edge_mask[..., None].astype(agg_sum.dtype), receivers, a)
                agg = agg_sum / jnp.maximum(count, 1.0)
        else:
            masked = edge_attr * edge_mask[..., None].astype(edge_attr.dtype)
            if self.aggregation == "sum":
                agg = batched_segment_sum(masked, receivers, a)
            elif self.aggregation == "mean":
                agg = batched_segment_mean(masked, receivers, a, edge_mask)
            else:
                raise ValueError(self.aggregation)
        return MLPBlock(self.hidden * 2, self.hidden, name="node_mlp_2")(
            ((x, None), (agg, None)))


class Processor(fnn.Module):
    """One message-passing step; residual applied by the caller
    (DOSTransformer.py:56-59)."""

    hidden: int
    aggregation: str = "sum"
    use_fused_mp: bool = False

    @fnn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask):
        edge_attr, agg_sum = EdgeModel(
            self.hidden, use_fused_mp=self.use_fused_mp, name="edge_model")(
            x, senders, receivers, edge_attr, edge_mask)
        x = NodeModel(self.hidden, self.aggregation, name="node_model")(
            x, senders, receivers, edge_attr, edge_mask, agg_sum=agg_sum)
        return x, edge_attr


def run_message_passing(g, x, edge_attr, *, layers, hidden, aggregation,
                        use_fused_mp=False, remat=False):
    """The reference's processor loop with CALLER-side residuals
    (DOSTransformer.py:56-59) — shared by the flagship models and the GNN
    baselines so the residual/masking semantics cannot drift between them."""
    proc_cls = fnn.remat(Processor) if remat else Processor
    for i in range(layers):
        out_x, out_e = proc_cls(hidden, aggregation, use_fused_mp,
                                name=f"processor{i}")(
            x, g.senders, g.receivers, edge_attr, g.edge_mask)
        x = x + out_x
        edge_attr = edge_attr + out_e
    return x, edge_attr


class GraphEncoderEDOS(fnn.Module):
    """eDOS Encoder (DOSTransformer.py:100-122): node/edge/global MLPs."""

    hidden: int

    @fnn.compact
    def __call__(self, x, edge_attr, glob):
        x = MLP2(self.hidden, name="node_encoder")(x)
        edge_attr = MLP2(self.hidden, name="edge_encoder")(edge_attr)
        u = MLP2(self.hidden, name="global_encoder")(glob)
        return x, edge_attr, u


class GraphEncoderPhDOS(fnn.Module):
    """phDOS Encoder (DOSTransformer_phonon.py:126-145): node/edge MLPs."""

    hidden: int

    @fnn.compact
    def __call__(self, x, edge_attr):
        x = MLP2(self.hidden, name="node_encoder")(x)
        edge_attr = MLP2(self.hidden, name="edge_encoder")(edge_attr)
        return x, edge_attr


def masked_node_pool(x: jax.Array, node_mask: jax.Array) -> jax.Array:
    """scatter_sum(x, batch, dim=0) in batch-leading layout: masked sum over
    the node axis. x [B, A, h] -> [B, h]."""
    return (x * node_mask[..., None].astype(x.dtype)).sum(axis=1)


class GraphDecoderEDOS(fnn.Module):
    """Linear(2h->h)([glob_emb, pooled nodes]) (DOSTransformer.py:151-161)."""

    hidden: int

    @fnn.compact
    def __call__(self, x, u, node_mask):
        pooled = masked_node_pool(x, node_mask)
        out = jnp.concatenate([u, pooled], axis=-1)
        return TorchLinear(self.hidden, name="mlp")(out)


class GraphDecoderPhDOS(fnn.Module):
    """Linear(h->h)(pooled nodes) (DOSTransformer_phonon.py:174-183)."""

    hidden: int

    @fnn.compact
    def __call__(self, x, node_mask):
        pooled = masked_node_pool(x, node_mask)
        return TorchLinear(self.hidden, name="mlp")(pooled)
