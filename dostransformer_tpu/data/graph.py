"""Fixed-shape padded graph batches.

TPU-native replacement for PyG's DataLoader/Batch collation + to_dense_batch
(reference main_eDOS.py:54-56, DOSTransformer.py:61-62). Instead of ragged
concatenation, a batch of B graphs is laid out with a FIXED number of node
slots per graph (`atoms_per_graph` = A): graph g owns node rows
[g*A, (g+1)*A). This makes the reference's to_dense_batch a zero-cost reshape
([B*A, F] -> [B, A, F]) and keeps every shape static for XLA.

Pad semantics (normative, see SURVEY.md §7.3-1):
  * pad node rows are zero features with node_mask 0; they receive no messages
    and are excluded from graph readouts;
  * pad edges have senders/receivers 0 and edge_mask 0; they are excluded from
    node aggregation;
  * in the dense view, pad rows are zeroed — under `padding="ref"` they then
    act as attention keys exactly like torch to_dense_batch zero-rows in the
    reference (which never builds a key-padding mask, DOSTransformer.py:61-63);
    under `padding="mask"` (default) they are masked out of attention, which
    coincides with reference behavior at batch_size=1 (no padding exists).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclasses.dataclass
class GraphSample:
    """One featurized crystal (host-side numpy). The analogue of a PyG Data
    object (reference mat2graph.py:143, utils.py:291-301)."""

    x: np.ndarray                     # [n, Fx] node features
    edge_index: np.ndarray            # [2, e] int (senders; receivers)
    y: np.ndarray                     # [bins] target (y_ft for eDOS, phdos for phDOS)
    system: int = 6                   # crystal-system id 0..6
    edge_attr: Optional[np.ndarray] = None    # [e, Fe] (eDOS Gaussian expansion)
    edge_vec: Optional[np.ndarray] = None     # [e, 3]  (phDOS geometry)
    edge_shift: Optional[np.ndarray] = None   # [e, 3]  (phDOS, used by mlp baseline)
    z: Optional[np.ndarray] = None            # [n, 118] one-hot type (phDOS, utils.py:294)
    glob: Optional[np.ndarray] = None         # [2]     (eDOS global features)
    sample_id: int = 0
    mp_id: str = ""
    # eDOS extras carried for the eval-artifact export (mat2graph.py:86-92)
    y_raw: Optional[np.ndarray] = None
    y_max: Optional[float] = None
    band_gap: Optional[float] = None
    efermi: Optional[float] = None

    @property
    def n_nodes(self) -> int:
        return int(self.x.shape[0])

    @property
    def n_edges(self) -> int:
        return int(self.edge_index.shape[1])


class GraphBatch(struct.PyTreeNode):
    """Fixed-shape batch of B graphs with A node slots per graph."""

    nodes: jax.Array        # [B*A, Fx]
    senders: jax.Array      # [E] int32, global node-slot index
    receivers: jax.Array    # [E] int32
    node_mask: jax.Array    # [B*A] float
    edge_mask: jax.Array    # [E] float
    y: jax.Array            # [B, bins]
    system: jax.Array       # [B] int32
    graph_mask: jax.Array   # [B] float (0 for dummy graphs in a short batch)
    sample_id: jax.Array    # [B] int32
    edges: Optional[jax.Array] = None       # [E, Fe] eDOS Gaussian features
    edge_vec: Optional[jax.Array] = None    # [E, 3] phDOS
    edge_shift: Optional[jax.Array] = None  # [E, 3] phDOS
    glob: Optional[jax.Array] = None        # [B, Fg] eDOS
    node_z: Optional[jax.Array] = None      # [B*A, 118] phDOS one-hot type

    @property
    def num_graphs(self) -> int:
        return self.y.shape[0]

    @property
    def atoms_per_graph(self) -> int:
        return self.nodes.shape[0] // self.num_graphs

    @property
    def node_gid(self) -> jax.Array:
        """The PyG `batch` vector: graph id per node slot."""
        a = self.atoms_per_graph
        return jnp.arange(self.nodes.shape[0], dtype=jnp.int32) // a

    def dense_nodes(self, x: jax.Array) -> jax.Array:
        """to_dense_batch(x, batch) as a masked reshape -> [B, A, F]
        (replaces reference DOSTransformer.py:61-62)."""
        b, a = self.num_graphs, self.atoms_per_graph
        x = x * self.node_mask[:, None].astype(x.dtype)
        return x.reshape(b, a, x.shape[-1])

    @property
    def dense_node_mask(self) -> jax.Array:
        return self.node_mask.reshape(self.num_graphs, self.atoms_per_graph)


def bucket_size(n: int, minimum: int = 8) -> int:
    """Round up to the next power of two (>= minimum): keeps the number of
    distinct compiled shapes O(log max_size)."""
    m = minimum
    while m < n:
        m *= 2
    return m


def collate(
    samples: Sequence[GraphSample],
    atoms_per_graph: Optional[int] = None,
    max_edges: Optional[int] = None,
    num_graphs: Optional[int] = None,
    use_buckets: bool = True,
) -> GraphBatch:
    """Collate host-side samples into one fixed-shape GraphBatch.

    atoms_per_graph / max_edges / num_graphs may be pinned (e.g. dataset-level
    maxima -> a single compiled shape) or derived per batch via power-of-two
    buckets.
    """
    b_real = len(samples)
    b = num_graphs or b_real
    assert b >= b_real

    max_n = max(s.n_nodes for s in samples)
    tot_e = sum(s.n_edges for s in samples)
    a = atoms_per_graph or (bucket_size(max_n) if use_buckets else max_n)
    e_pad = max_edges or (bucket_size(max(tot_e, 1)) if use_buckets else max(tot_e, 1))
    assert a >= max_n, (a, max_n)
    assert e_pad >= tot_e, (e_pad, tot_e)

    fx = samples[0].x.shape[1]
    bins = samples[0].y.shape[-1]

    nodes = np.zeros((b * a, fx), np.float32)
    node_mask = np.zeros((b * a,), np.float32)
    senders = np.zeros((e_pad,), np.int32)
    receivers = np.zeros((e_pad,), np.int32)
    edge_mask = np.zeros((e_pad,), np.float32)
    y = np.zeros((b, bins), np.float32)
    system = np.zeros((b,), np.int32)
    graph_mask = np.zeros((b,), np.float32)
    sample_id = np.full((b,), -1, np.int32)

    has_eattr = samples[0].edge_attr is not None
    has_evec = samples[0].edge_vec is not None
    has_eshift = samples[0].edge_shift is not None
    has_glob = samples[0].glob is not None
    has_z = samples[0].z is not None
    edges = np.zeros((e_pad, samples[0].edge_attr.shape[1]), np.float32) if has_eattr else None
    edge_vec = np.zeros((e_pad, 3), np.float32) if has_evec else None
    edge_shift = np.zeros((e_pad, 3), np.float32) if has_eshift else None
    glob = np.zeros((b, samples[0].glob.shape[-1]), np.float32) if has_glob else None
    node_z = np.zeros((b * a, samples[0].z.shape[1]), np.float32) if has_z else None

    eo = 0
    for g, s in enumerate(samples):
        n, e = s.n_nodes, s.n_edges
        nodes[g * a: g * a + n] = s.x
        node_mask[g * a: g * a + n] = 1.0
        senders[eo: eo + e] = s.edge_index[0] + g * a
        receivers[eo: eo + e] = s.edge_index[1] + g * a
        edge_mask[eo: eo + e] = 1.0
        if has_eattr:
            edges[eo: eo + e] = s.edge_attr
        if has_evec:
            edge_vec[eo: eo + e] = s.edge_vec
        if has_eshift:
            edge_shift[eo: eo + e] = s.edge_shift
        if has_glob:
            glob[g] = s.glob
        if has_z:
            node_z[g * a: g * a + n] = s.z
        y[g] = np.asarray(s.y, np.float32).reshape(-1)
        system[g] = s.system
        graph_mask[g] = 1.0
        sample_id[g] = s.sample_id
        eo += e

    return GraphBatch(
        nodes=jnp.asarray(nodes),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        y=jnp.asarray(y),
        system=jnp.asarray(system),
        graph_mask=jnp.asarray(graph_mask),
        sample_id=jnp.asarray(sample_id),
        edges=jnp.asarray(edges) if edges is not None else None,
        edge_vec=jnp.asarray(edge_vec) if edge_vec is not None else None,
        edge_shift=jnp.asarray(edge_shift) if edge_shift is not None else None,
        glob=jnp.asarray(glob) if glob is not None else None,
        node_z=jnp.asarray(node_z) if node_z is not None else None,
    )
