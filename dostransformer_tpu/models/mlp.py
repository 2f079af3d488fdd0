"""eDOS MLP ablation baselines (reference embedder_eDOS/mlp.py): no message
passing — node encoder + graph readout only.

mlp  (:11-35): energy embeddings, per-energy readout. Returns dos [B, 201].
mlp2 (:41-56): no energy embeddings, single 201-dim readout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn

from dostransformer_tpu.data.graph import GraphBatch
from dostransformer_tpu.nn.init import embedding_init
from dostransformer_tpu.nn.modules import (
    GraphDecoderEDOS,
    GraphEncoderEDOS,
    TorchLinear,
    masked_node_pool,
)


class MLPEDOS(fnn.Module):
    hidden: int = 256
    n_bins: int = 201

    @fnn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True):
        b = g.num_graphs
        table = self.param("embeddings", embedding_init, (self.n_bins, self.hidden))
        energies = jnp.broadcast_to(table[None], (b, self.n_bins, self.hidden))

        x, _, u = GraphEncoderEDOS(self.hidden, name="GN_encoder")(
            g.nodes, g.edges, g.glob)
        graph = GraphDecoderEDOS(self.hidden, name="GN_decoder")(x, u, g.node_mask)
        graph = jnp.broadcast_to(graph[:, None, :], (b, self.n_bins, self.hidden))

        h = jnp.concatenate([energies, graph], axis=-1)
        h = jax.nn.leaky_relu(TorchLinear(self.hidden, name="out0")(h))
        dos = TorchLinear(1, name="out1")(h)[..., 0]
        return dos


class MLP2EDOS(fnn.Module):
    hidden: int = 256
    n_bins: int = 201

    @fnn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True):
        x, _, u = GraphEncoderEDOS(self.hidden, name="GN_encoder")(
            g.nodes, g.edges, g.glob)
        pooled = masked_node_pool(x, g.node_mask)
        h = jnp.concatenate([pooled, u], axis=-1)  # (mlp.py:52-53)
        h = jax.nn.leaky_relu(TorchLinear(self.hidden, name="out0")(h))
        return TorchLinear(self.n_bins, name="out1")(h)
