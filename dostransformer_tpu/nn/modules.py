"""GNN building blocks.

Faithful functional re-implementations of the reference's shared block
structure (SURVEY.md §2.2; reference embedder_eDOS/DOSTransformer.py:100-189,
embedder_phDOS/DOSTransformer_phonon.py:126-211), re-designed for fixed-shape
padded graph batches:

  * Encoder: node/edge(/global) MLPs  Linear->PReLU->Linear
  * Processor = EdgeModel (gather by edge endpoints + MLP) then NodeModel
    (masked segment aggregation + MLP); the residual is applied by the caller
    (DOSTransformer.py:56-59).
  * EdgeModel mlp: Linear(3h->2h) -> LayerNorm -> PReLU -> Linear(2h->h)
  * NodeModel: scatter edge features onto the *receiver* node
    (col = edge_index[1], DOSTransformer.py:187) via segment-sum (eDOS) or
    segment-mean (phDOS, DOSTransformer_phonon.py:209), concat with x, then the
    same MLP shape. (The reference's node_mlp_1 is dead weight — created but
    never called — and is intentionally not reproduced.)
  * Decoder: graph readout by masked segment-sum over nodes.

All aggregations run over padded arrays: pad edges/nodes are excluded via
masks, matching the reference's exact ragged semantics.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from dostransformer_tpu.nn.init import (
    torch_linear_bias_init,
    torch_linear_kernel_init,
)
from dostransformer_tpu.ops.segment import segment_mean, segment_sum

LN_EPS = 1e-5  # torch nn.LayerNorm default


class TorchLinear(fnn.Module):
    """nn.Linear with torch default initialization."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = torch_linear_kernel_init

    @fnn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", torch_linear_bias_init(fan_in), (self.features,))
            y = y + bias
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
    EdgeModel/NodeModel MLP shape (DOSTransformer.py:171,182)."""

    mid: int
    out: int

    @fnn.compact
    def __call__(self, x):
        x = TorchLinear(self.mid, name="lin0")(x)
        x = fnn.LayerNorm(epsilon=LN_EPS, name="ln")(x)
        x = PReLU(name="prelu")(x)
        x = TorchLinear(self.out, name="lin1")(x)
        return x


class EdgeModel(fnn.Module):
    """e' = MLP([x_src, x_dst, e]) (DOSTransformer.py:168-175)."""

    hidden: int

    @fnn.compact
    def __call__(self, x, senders, receivers, edge_attr):
        src = x[senders]
        dst = x[receivers]
        out = jnp.concatenate([src, dst, edge_attr], axis=-1)
        return MLPBlock(self.hidden * 2, self.hidden, name="edge_mlp")(out)


class NodeModel(fnn.Module):
    """x' = MLP([x, agg(e -> receiver)]) with agg = segment_sum (eDOS,
    DOSTransformer.py:184-189) or segment_mean (phDOS,
    DOSTransformer_phonon.py:206-211). Pad edges are masked out of the
    aggregation (and out of the mean's denominator)."""

    hidden: int
    aggregation: str = "sum"  # "sum" | "mean"

    @fnn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask):
        n = x.shape[0]
        masked = edge_attr * edge_mask[:, None].astype(edge_attr.dtype)
        if self.aggregation == "sum":
            agg = segment_sum(masked, receivers, n)
        elif self.aggregation == "mean":
            agg = segment_mean(masked, receivers, n, weights=edge_mask)
        else:
            raise ValueError(self.aggregation)
        out = jnp.concatenate([x, agg], axis=-1)
        return MLPBlock(self.hidden * 2, self.hidden, name="node_mlp_2")(out)


class Processor(fnn.Module):
    """One message-passing step; residual applied by the caller
    (DOSTransformer.py:56-59)."""

    hidden: int
    aggregation: str = "sum"

    @fnn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask):
        edge_attr = EdgeModel(self.hidden, name="edge_model")(x, senders, receivers, edge_attr)
        x = NodeModel(self.hidden, self.aggregation, name="node_model")(
            x, senders, receivers, edge_attr, edge_mask)
        return x, edge_attr


class GraphEncoderEDOS(fnn.Module):
    """eDOS Encoder (DOSTransformer.py:100-122): node/edge/global MLPs."""

    hidden: int

    @fnn.compact
    def __call__(self, x, edge_attr, glob):
        x = MLP2(self.hidden, name="node_encoder")(x)
        edge_attr = MLP2(self.hidden, name="edge_encoder")(edge_attr)
        u = MLP2(self.hidden, name="global_encoder")(glob.reshape(-1, glob.shape[-1]))
        return x, edge_attr, u


class GraphEncoderPhDOS(fnn.Module):
    """phDOS Encoder (DOSTransformer_phonon.py:126-145): node/edge MLPs."""

    hidden: int

    @fnn.compact
    def __call__(self, x, edge_attr):
        x = MLP2(self.hidden, name="node_encoder")(x)
        edge_attr = MLP2(self.hidden, name="edge_encoder")(edge_attr)
        return x, edge_attr


class GraphDecoderEDOS(fnn.Module):
    """Linear(2h->h)([glob_emb, masked segment_sum(x, graph)])
    (DOSTransformer.py:151-161)."""

    hidden: int

    @fnn.compact
    def __call__(self, x, u, node_gid, node_mask, num_graphs):
        pooled = segment_sum(x * node_mask[:, None].astype(x.dtype), node_gid, num_graphs)
        out = jnp.concatenate([u, pooled], axis=-1)
        return TorchLinear(self.hidden, name="mlp")(out)


class GraphDecoderPhDOS(fnn.Module):
    """Linear(h->h)(masked segment_sum(x, graph))
    (DOSTransformer_phonon.py:174-183)."""

    hidden: int

    @fnn.compact
    def __call__(self, x, node_gid, node_mask, num_graphs):
        pooled = segment_sum(x * node_mask[:, None].astype(x.dtype), node_gid, num_graphs)
        return TorchLinear(self.hidden, name="mlp")(pooled)
