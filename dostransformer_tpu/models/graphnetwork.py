"""eDOS GNN ablation baselines (reference embedder_eDOS/graphnetwork.py).

Graphnetwork: GNN + per-energy readout with energy embeddings (:10-43).
Graphnetwork2: GNN + single 201-dim readout, no energy embeddings (:48-74).
The reference Graphnetwork2 forward calls its Encoder with a mismatched arity
(graphnetwork.py:64 vs :94) — we implement the clear intent (encode node/edge/
global without energy expansion). The reference Encoder's node_encoder_prompt
branch (:83,:96-99) is dead with matscholar features (x width 200) and is not
reproduced (SURVEY.md §2.3-6).
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
    Processor,
    TorchLinear,
    masked_node_pool,
)


class _GNBase(fnn.Module):
    layers: int = 3
    hidden: int = 256
    n_bins: int = 201
    aggregation: str = "sum"

    def _message_passing(self, g: GraphBatch, x, edge_attr):
        for i in range(self.layers):
            out_x, out_e = Processor(self.hidden, self.aggregation, name=f"processor{i}")(
                x, g.senders, g.receivers, edge_attr, g.edge_mask)
            x = x + out_x
            edge_attr = edge_attr + out_e
        return x, edge_attr

    def _pool(self, g: GraphBatch, x):
        return masked_node_pool(x, g.node_mask)


class GraphnetworkEDOS(_GNBase):
    """Energy-embedding GNN baseline (graphnetwork.py:10-43).
    out_layer: Linear(2h->h) -> LeakyReLU -> Linear(h->1) applied per energy
    token. Returns (dos [B, 201], node_embeddings)."""

    @fnn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True):
        b = g.num_graphs
        table = self.param("embeddings", embedding_init, (self.n_bins, self.hidden))
        energies = jnp.broadcast_to(table[None], (b, self.n_bins, self.hidden))

        x, edge_attr, u = GraphEncoderEDOS(self.hidden, name="GN_encoder")(
            g.nodes, g.edges, g.glob)
        x, edge_attr = self._message_passing(g, x, edge_attr)

        graph = GraphDecoderEDOS(self.hidden, name="GN_decoder")(x, u, g.node_mask)
        graph = jnp.broadcast_to(graph[:, None, :], (b, self.n_bins, self.hidden))

        h = jnp.concatenate([energies, graph], axis=-1)
        h = jax.nn.leaky_relu(TorchLinear(self.hidden, name="out0")(h))
        dos = TorchLinear(1, name="out1")(h)[..., 0]
        return dos, x


class Graphnetwork2EDOS(_GNBase):
    """No-energy-embedding GNN baseline (graphnetwork.py:48-74): pooled nodes
    concat global -> Linear(2h->h) -> LeakyReLU -> Linear(h->201)."""

    @fnn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True):
        x, edge_attr, u = GraphEncoderEDOS(self.hidden, name="GN_encoder")(
            g.nodes, g.edges, g.glob)
        x, edge_attr = self._message_passing(g, x, edge_attr)

        pooled = self._pool(g, x)
        h = jnp.concatenate([pooled, u], axis=-1)  # (graphnetwork.py:70-71)
        h = jax.nn.leaky_relu(TorchLinear(self.hidden, name="out0")(h))
        dos = TorchLinear(self.n_bins, name="out1")(h)
        return dos, x
