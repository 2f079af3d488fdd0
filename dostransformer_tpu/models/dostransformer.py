"""DOSTransformer: prompt-guided multimodal transformer for DOS prediction.

TPU-native re-design of the reference flagship models
(embedder_eDOS/DOSTransformer.py:12-93 and
embedder_phDOS/DOSTransformer_phonon.py:14-119):

  * learned per-energy-bin embedding table provides "energy tokens";
  * a crystal-graph message-passing GNN encodes atoms over fixed-shape padded
    batches;
  * energy tokens cross-attend against atom representations
    (projection-free attention, fused Pallas kernel on TPU);
  * a graph readout is fused into every energy token; a global head and a
    crystal-system "prompt token" (7 classes) conditioned system head emit one
    DOS value per bin. The self/source transformer stacks and the output
    linear are SHARED between the two heads (DOSTransformer.py:71-89) —
    expressed here by calling the same module instances twice.

Returns (dos_global [B, bins], node_embeddings [B, A, h], dos_system [B, bins])
matching the reference contract (DOSTransformer.py:93); node embeddings are
consumed by the eval-artifact export (reference utils.py:91).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from dostransformer_tpu.data.graph import GraphBatch
from dostransformer_tpu.nn.init import embedding_init
from dostransformer_tpu.nn.modules import (
    GraphDecoderEDOS,
    GraphDecoderPhDOS,
    GraphEncoderEDOS,
    GraphEncoderPhDOS,
    TorchLinear,
    run_message_passing,
)
from dostransformer_tpu.nn.transformer import TransformerEncoder
from dostransformer_tpu.ops.geometry import edge_geometry_phdos


class _DOSTransformerBase(fnn.Module):
    layers: int = 3
    t_layers: int = 2
    hidden: int = 256
    n_bins: int = 201
    attn_drop: float = 0.0
    padding: str = "mask"            # "mask" | "ref" (see GraphBatch docstring)
    use_pallas: Optional[bool] = None
    aggregation: str = "sum"         # eDOS scatter_sum; phDOS scatter_mean
    dtype: str = "float32"           # compute dtype: float32 | bfloat16 |
                                     # float64 (params stay f32; norms/softmax
                                     # run >= f32; float64 is the x64 CPU
                                     # parity mode, reference main_phDOS.py:14-16)
    remat: bool = False              # rematerialize transformer layers +
                                     # processors in the backward pass
    use_fused_mp: Optional[bool] = None  # fused message-passing Pallas kernel
                                     # (ops/fused_mp.py, 28% faster train
                                     # step); None = auto: on for TPU when
                                     # hidden is a multiple of 128
    tp_axis: Optional[str] = None    # Megatron-shard the transformer FFNs
                                     # over this mesh axis (dp x tp; active
                                     # only inside a shard_map binding it)
    bins_pad: Optional[int] = None   # run the energy-token axis at this
                                     # LANE-ALIGNED width (e.g. 256 for the
                                     # 201 eDOS bins): every attention call
                                     # sees tile-aligned shapes (the Pallas
                                     # pad/unpad copies at Lq=201/Lk=201
                                     # vanish and XLA score layouts lose
                                     # their 27% lane waste) at the cost of
                                     # extra pad rows through the per-token
                                     # matmuls. Pad bins are masked out of
                                     # the self-attention keys and sliced
                                     # off the outputs — numerics are
                                     # IDENTICAL to the unpadded run
                                     # (tests/test_model_parity.py). None =
                                     # no padding.

    @property
    def _cdtype(self):
        table = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                 "float64": jnp.float64}
        if self.dtype not in table:
            # loud: "bf16" silently trained in f32 via a .get default
            raise ValueError(f"unknown dtype {self.dtype!r}; expected one "
                             f"of {sorted(table)}")
        if self.padding not in ("mask", "ref"):
            # equally silent before: any typo ('masked', 'Mask') fell
            # through to ref semantics — zero-key pad atoms in attention
            raise ValueError(f"unknown padding {self.padding!r}; expected "
                             f"'mask' or 'ref'")
        return table[self.dtype]

    def _cast(self, *xs):
        out = tuple(x.astype(self._cdtype) if x is not None else None
                    for x in xs)
        return out if len(out) > 1 else out[0]

    def _build_transformers(self):
        mk = lambda name: TransformerEncoder(
            embed_dim=self.hidden, num_heads=1, layers=self.t_layers,
            attn_dropout=self.attn_drop, use_pallas=self.use_pallas,
            tp_axis=self.tp_axis, remat=self.remat, name=name)
        return mk("transformer"), mk("transformer_self"), mk("transformer_source")

    @property
    def _n_run(self) -> int:
        """Energy-token count the model RUNS at (>= n_bins; extra rows are
        masked/sliced — see bins_pad)."""
        n = self.bins_pad or self.n_bins
        assert n >= self.n_bins, (n, self.n_bins)
        return n

    def _energy_tokens(self, b: int):
        table = self.param("embeddings", embedding_init, (self.n_bins, self.hidden))
        table = table.astype(self._cdtype)
        if self._n_run != self.n_bins:
            # zero rows for the pad bins; the param tree keeps [n_bins, h]
            table = jnp.zeros((self._n_run, self.hidden),
                              table.dtype).at[: self.n_bins].set(table)
        return jnp.broadcast_to(table[None], (b, self._n_run, self.hidden))

    def _prompt_tokens(self, system: jax.Array):
        table = self.param("prompt_token", embedding_init, (7, self.hidden // 2))
        return table.astype(self._cdtype)[system]  # [B, h/2]

    def _message_passing(self, g: GraphBatch, x, edge_attr, deterministic):
        fused = self.use_fused_mp
        if fused is None:
            fused = (jax.default_backend() == "tpu"
                     and self.hidden % 128 == 0)
        return run_message_passing(
            g, x, edge_attr, layers=self.layers, hidden=self.hidden,
            aggregation=self.aggregation, use_fused_mp=fused,
            remat=self.remat)

    def _heads(self, tr_self, tr_source, g: GraphBatch, energies, graph,
               x_dense, key_mask, deterministic):
        """The shared global/system head stack (DOSTransformer.py:67-91)."""
        fc = TorchLinear(self.hidden, name="fc")
        fc_prompt = TorchLinear(self.hidden, name="fc_prompt")
        out_layer = TorchLinear(1, name="out_layer")

        b = energies.shape[0]
        n_run = self._n_run
        dos_in_g = jax.nn.leaky_relu(
            fc(jnp.concatenate([energies, graph], axis=-1)))

        prompt = self._prompt_tokens(g.system)
        prompt = jnp.broadcast_to(prompt[:, None, :],
                                  (prompt.shape[0], n_run, prompt.shape[-1]))
        dos_in_s = jax.nn.leaky_relu(
            fc_prompt(jnp.concatenate([energies, graph, prompt], axis=-1)))

        # the SAME transformer_self / transformer_source / out_layer modules
        # serve both heads — weights shared (DOSTransformer.py:85-89). Since
        # attention/LN/FFN are per-batch-element, the two heads are fused into
        # ONE 2B-batch pass: identical math, half the kernel launches, larger
        # MXU tiles.
        both = jnp.concatenate([dos_in_g, dos_in_s], axis=0)      # [2B, bins, h]
        kv = jnp.concatenate([x_dense, x_dense], axis=0)
        km = (jnp.concatenate([key_mask, key_mask], axis=0)
              if key_mask is not None else None)
        # pad bins must not act as self-attention KEYS for real bins (they
        # are our own alignment artifact, masked in BOTH padding modes);
        # queries over pad bins produce throwaway rows sliced off below
        bin_km = None
        if n_run != self.n_bins:
            bin_km = jnp.broadcast_to(jnp.arange(n_run) < self.n_bins,
                                      (2 * b, n_run))
        both = tr_self(both, both, both, bin_km, deterministic)
        both = tr_source(both, kv, kv, km, deterministic)
        # outputs widen bf16 back to f32; f64 compute stays f64
        out_dt = jnp.promote_types(both.dtype, jnp.float32)
        both = out_layer(both)[..., 0].astype(out_dt)             # [2B, n_run]
        both = both[:, : self.n_bins]
        return both[:b], both[b:]

    def _key_mask(self, g: GraphBatch):
        if self.padding == "mask":
            return g.node_mask > 0.5
        return None  # "ref": zero pad rows act as keys like torch to_dense_batch

    @staticmethod
    def _dense(g: GraphBatch, x):
        """to_dense_batch is the identity in batch-leading layout; zero the
        pad rows like torch to_dense_batch does (DOSTransformer.py:61-62)."""
        return x * g.node_mask[..., None].astype(x.dtype)


class DOSTransformerEDOS(_DOSTransformerBase):
    """eDOS flagship (201 bins), reference embedder_eDOS/DOSTransformer.py."""

    n_bins: int = 201
    aggregation: str = "sum"

    @fnn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True):
        b = g.num_graphs
        tr_cross, tr_self, tr_source = self._build_transformers()

        energies = self._energy_tokens(b)
        nodes, edges_in, glob = self._cast(g.nodes, g.edges, g.glob)
        x, edge_attr, u = GraphEncoderEDOS(self.hidden, name="GN_encoder")(
            nodes, edges_in, glob)
        x, edge_attr = self._message_passing(g, x, edge_attr, deterministic)

        x_dense = self._dense(g, x)          # [B, A, h]; replaces to_dense_batch
        key_mask = self._key_mask(g)
        energies = tr_cross(energies, x_dense, x_dense, key_mask, deterministic)

        graph = GraphDecoderEDOS(self.hidden, name="GN_decoder")(
            x, u, g.node_mask)
        graph = jnp.broadcast_to(graph[:, None, :], (b, self._n_run, self.hidden))

        dos_global, dos_system = self._heads(
            tr_self, tr_source, g, energies, graph, x_dense, key_mask,
            deterministic)
        return (dos_global,
                x.astype(jnp.promote_types(x.dtype, jnp.float32)),
                dos_system)


class DOSTransformerPhDOS(_DOSTransformerBase):
    """phDOS flagship (51 bins), reference
    embedder_phDOS/DOSTransformer_phonon.py. Differences: edge features are
    computed in-model from edge vectors (SH l<=1 x smooth cutoff, :74-77); no
    global features; NodeModel uses scatter_mean (:209); decoder is
    Linear(h->h) over the pooled nodes (:174-183)."""

    n_bins: int = 51
    aggregation: str = "mean"
    r_max: float = 4.0

    @fnn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True):
        b = g.num_graphs
        tr_cross, tr_self, tr_source = self._build_transformers()

        energies = self._energy_tokens(b)
        # geometry in f32 (cutoff/SH are cheap VPU ops), then cast
        edge_attr = edge_geometry_phdos(g.edge_vec, self.r_max)
        nodes, edge_attr = self._cast(g.nodes, edge_attr)
        x, edge_attr = GraphEncoderPhDOS(self.hidden, name="GN_encoder")(
            nodes, edge_attr)
        x, edge_attr = self._message_passing(g, x, edge_attr, deterministic)

        x_dense = self._dense(g, x)
        key_mask = self._key_mask(g)
        energies = tr_cross(energies, x_dense, x_dense, key_mask, deterministic)

        graph = GraphDecoderPhDOS(self.hidden, name="GN_decoder")(
            x, g.node_mask)
        graph = jnp.broadcast_to(graph[:, None, :], (b, self._n_run, self.hidden))

        dos_global, dos_system = self._heads(
            tr_self, tr_source, g, energies, graph, x_dense, key_mask,
            deterministic)
        return (dos_global,
                x.astype(jnp.promote_types(x.dtype, jnp.float32)),
                dos_system)
