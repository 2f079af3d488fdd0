"""Fixed-shape padded graph batches.

TPU-native replacement for PyG's DataLoader/Batch collation + to_dense_batch
(reference main_eDOS.py:54-56, DOSTransformer.py:61-62). Instead of ragged
concatenation, every array is BATCH-LEADING with fixed per-graph slots:

    nodes      [B, A, Fx]   A node slots per graph
    senders    [B, Eg]      Eg edge slots per graph, LOCAL indices in [0, A)
    receivers  [B, Eg]
    node_mask  [B, A]       1 for real atoms
    edge_mask  [B, Eg]      1 for real edges

This layout is the TPU-idiomatic design (SURVEY.md §2.4): the reference's
to_dense_batch is the identity, every graph op (gather by edge endpoint,
edge->node scatter, readout pooling) is graph-local, and data parallelism is a
NamedSharding over axis 0 — no cross-device indexing, XLA inserts only the
gradient all-reduce.

Pad semantics (normative, SURVEY.md §7.3-1):
  * pad node rows are zero features with node_mask 0; they receive no messages
    and are excluded from graph readouts;
  * pad edges have senders/receivers 0 and edge_mask 0; they are excluded from
    node aggregation (and from segment-mean denominators);
  * under `padding="ref"` zeroed pad rows act as attention keys exactly like
    torch to_dense_batch zero-rows in the reference (which never builds a
    key-padding mask, DOSTransformer.py:61-63); bit-parity with the reference
    additionally requires exact shapes (atoms_per_graph == batch max,
    use_buckets=False), since bucket padding adds MORE zero keys than torch
    to_dense_batch would — verified in
    tests/test_model_parity.py::TestRefPaddingBatchedParity;
  * under `padding="mask"` (default) pad rows are masked out of attention,
    which coincides with reference behavior at batch_size=1 (no padding
    exists there) and is invariant to bucket size.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class RequestError(ValueError):
    """Invalid INPUT data: a serving request (or collate pin) that violates
    the batch contract — empty, over the shape envelope, or schema-mixed.
    Subclasses ValueError so library callers' handlers keep working; the
    HTTP server maps RequestError to 400 and every other exception
    (server faults: backend errors, artifact drift, OOM) to 5xx."""


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
    z: Optional[np.ndarray] = None            # one-hot atom type: [n, 118]
                                              # (phDOS, utils.py:294) or
                                              # [n_atoms, 100] (eDOS,
                                              # mat2graph.py:143 `z` — one row
                                              # FEWER than x: the prompt node
                                              # has no type)
    coords: Optional[np.ndarray] = None       # [n_atoms, 3] cartesian coords
                                              # (eDOS mat2graph.py:143; data
                                              # fidelity only — no model
                                              # consumes them)
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
    """Fixed-shape batch of B graphs; every leaf is batch-leading."""

    nodes: jax.Array        # [B, A, Fx]
    senders: jax.Array      # [B, Eg] int32, local node index
    receivers: jax.Array    # [B, Eg] int32
    node_mask: jax.Array    # [B, A] float
    edge_mask: jax.Array    # [B, Eg] float
    y: jax.Array            # [B, bins]
    system: jax.Array       # [B] int32
    graph_mask: jax.Array   # [B] float (0 for dummy graphs in a short batch)
    sample_id: jax.Array    # [B] int32
    edges: Optional[jax.Array] = None       # [B, Eg, Fe] eDOS Gaussian features
    edge_vec: Optional[jax.Array] = None    # [B, Eg, 3] phDOS
    edge_shift: Optional[jax.Array] = None  # [B, Eg, 3] phDOS
    glob: Optional[jax.Array] = None        # [B, Fg] eDOS
    node_z: Optional[jax.Array] = None      # [B, A, 118] phDOS one-hot type

    @property
    def num_graphs(self) -> int:
        return self.nodes.shape[0]

    @property
    def atoms_per_graph(self) -> int:
        return self.nodes.shape[1]

    @property
    def edges_per_graph(self) -> int:
        return self.senders.shape[1]


def bucket_size(n: int, minimum: int = 8) -> int:
    """Padding bucket: powers of two up to 128, then multiples of 128 (the
    TPU lane width). Keeps compiled-shape count small while capping pad waste
    above 128 at <1 lane-tile — pure power-of-two would waste up to 2x on the
    edge arrays that dominate the GNN FLOPs."""
    m = minimum
    while m < n and m < 128:
        m *= 2
    if n <= m:
        return m
    return -(-n // 128) * 128


def collate(
    samples: Sequence[GraphSample],
    atoms_per_graph: Optional[int] = None,
    edges_per_graph: Optional[int] = None,
    num_graphs: Optional[int] = None,
    use_buckets: bool = True,
    numpy: bool = False,
) -> GraphBatch:
    """Collate host-side samples into one fixed-shape GraphBatch.

    atoms_per_graph / edges_per_graph / num_graphs may be pinned (e.g.
    dataset-level maxima -> a single compiled shape) or derived per batch via
    power-of-two buckets. ``numpy=True`` keeps the leaves as host arrays —
    for callers that stack several batches before a single device upload
    (serve.Predictor's chunked scan) instead of uploading per batch.
    """
    b_real = len(samples)
    if b_real == 0:
        raise RequestError("empty request: no samples to collate")
    # explicit None checks: a pin of 0 is an invalid value to reject below,
    # not a falsy "derive it for me"
    b = b_real if num_graphs is None else num_graphs
    if b < b_real:
        # input validation like the a/eg checks below: a real message, never
        # stripped under python -O (serving chunk bugs land here)
        raise RequestError(
            f"{b_real} samples but the pinned num_graphs is {b} — the "
            f"request exceeds the shape envelope")

    max_n = max(s.n_nodes for s in samples)
    max_e = max(s.n_edges for s in samples)
    a = (atoms_per_graph if atoms_per_graph is not None
         else (bucket_size(max_n) if use_buckets else max_n))
    eg = (edges_per_graph if edges_per_graph is not None
          else (bucket_size(max(max_e, 1)) if use_buckets else max(max_e, 1)))
    # input validation, not an invariant (serving requests hit this with
    # crystals beyond a pinned shape envelope): raise with a real message,
    # and never strip under python -O
    if a < max_n:
        raise RequestError(
            f"sample has {max_n} atoms but the pinned atoms_per_graph "
            f"bucket is {a} — the request exceeds the shape envelope")
    if eg < max_e:
        raise RequestError(
            f"sample has {max_e} edges but the pinned edges_per_graph "
            f"bucket is {eg} — the request exceeds the shape envelope")

    fx = samples[0].x.shape[1]
    bins = samples[0].y.shape[-1]
    s0 = samples[0]
    # the batch schema (which optional features exist, feature widths) is
    # taken from samples[0]; a mixed request (serving accepts arbitrary
    # sample lists) must fail as a ValueError -> HTTP 400 here, not as an
    # opaque crash deep in packing or a silently dropped feature
    for i, s in enumerate(samples[1:], 1):
        for name in ("edge_attr", "edge_vec", "edge_shift", "z", "glob"):
            if (getattr(s, name) is None) != (getattr(s0, name) is None):
                have = "has" if getattr(s0, name) is not None else "lacks"
                raise RequestError(
                    f"inconsistent batch: sample 0 {have} {name} but "
                    f"sample {i} does not match — all samples in one "
                    f"request must share the same feature schema")
        if s.x.shape[1] != fx:
            raise RequestError(
                f"inconsistent batch: sample 0 has {fx}-d node features "
                f"but sample {i} has {s.x.shape[1]}-d")
        if s.y.shape[-1] != bins:
            raise RequestError(
                f"inconsistent batch: sample 0 has {bins} energy bins "
                f"but sample {i} has {s.y.shape[-1]}")

    # Ragged-array packing. The C++ packers (dostpu_native.cc — the
    # PyG-DataLoader-collation equivalent) are available behind
    # DOSTPU_NATIVE_COLLATE=1 and differential-tested, but the NumPy slicing
    # loop is the DEFAULT: collation is memory-bound on writing the padded
    # output buffers (e.g. 258 MB for 4096 eDOS samples' edges), which the
    # per-sample `out[g, :n] = x` memcpys already saturate — the measured
    # native-vs-numpy ratio is 0.74-0.89x because the extra concatenate pass
    # only adds traffic. Masks derive vectorized from the row counts.
    import os

    from dostransformer_tpu import native

    def _batch_z(s) -> bool:
        # pack z only when it row-aligns with x, i.e. it is a per-node model
        # input (phDOS one-hot type, consumed by MLPPhDOS). eDOS z has
        # n_atoms rows vs x's n_atoms+1 (the prompt node carries no type,
        # mat2graph.py:143), no eDOS model consumes it, and packing it would
        # add a [B, A, 100] tensor to every train batch/upload for nothing —
        # it stays a GraphSample/npz data-fidelity field, like coords.
        return s.z is not None and s.z.shape[0] == s.x.shape[0]

    n_rows = np.array([s.n_nodes for s in samples], np.int64)
    e_rows = np.array([s.n_edges for s in samples], np.int64)
    use_native = (b == b_real and native.available()
                  and os.environ.get("DOSTPU_NATIVE_COLLATE") == "1")
    nodes = node_mask = None
    senders = receivers = edges = edge_vec = edge_shift = node_z = None
    if use_native:
        nodes, node_mask = native.pack_f32([s.x for s in samples], a, fx)
        se = native.pack_edges([s.edge_index for s in samples], eg)
        if se is not None:
            senders, receivers = se
        if s0.edge_attr is not None:
            edges = native.pack_f32([s.edge_attr for s in samples], eg,
                                    s0.edge_attr.shape[1],
                                    with_mask=False)[0]
        if s0.edge_vec is not None:
            edge_vec = native.pack_f32([s.edge_vec for s in samples], eg, 3,
                                       with_mask=False)[0]
        if s0.edge_shift is not None:
            edge_shift = native.pack_f32([s.edge_shift for s in samples],
                                         eg, 3, with_mask=False)[0]
        if _batch_z(s0):
            node_z = native.pack_f32([s.z for s in samples], a,
                                     s0.z.shape[1], with_mask=False)[0]
    def _pack_loop(arrays, r):
        out = np.zeros((b, r) + arrays[0].shape[1:], np.float32)
        for g, arr in enumerate(arrays):
            out[g, : arr.shape[0]] = arr
        return out

    if nodes is None:
        nodes = _pack_loop([s.x for s in samples], a)
        node_mask = np.zeros((b, a), np.float32)
        node_mask[:b_real] = (np.arange(a)[None] < n_rows[:, None])
    if senders is None:
        senders = np.zeros((b, eg), np.int32)
        receivers = np.zeros((b, eg), np.int32)
        for g, s in enumerate(samples):
            senders[g, : s.n_edges] = s.edge_index[0]
            receivers[g, : s.n_edges] = s.edge_index[1]

    if edges is None and s0.edge_attr is not None:
        edges = _pack_loop([s.edge_attr for s in samples], eg)
    if edge_vec is None and s0.edge_vec is not None:
        edge_vec = _pack_loop([s.edge_vec for s in samples], eg)
    if edge_shift is None and s0.edge_shift is not None:
        edge_shift = _pack_loop([s.edge_shift for s in samples], eg)
    if node_z is None and _batch_z(s0):
        node_z = _pack_loop([s.z for s in samples], a)

    edge_mask = np.zeros((b, eg), np.float32)
    edge_mask[:b_real] = (np.arange(eg)[None] < e_rows[:, None])
    y = np.zeros((b, bins), np.float32)
    y[:b_real] = np.stack([np.asarray(s.y, np.float32).reshape(-1)
                           for s in samples])
    system = np.zeros((b,), np.int32)
    system[:b_real] = [s.system for s in samples]
    graph_mask = np.zeros((b,), np.float32)
    graph_mask[:b_real] = 1.0
    sample_id = np.full((b,), -1, np.int32)
    sample_id[:b_real] = [s.sample_id for s in samples]
    glob = None
    if s0.glob is not None:
        glob = np.zeros((b, s0.glob.shape[-1]), np.float32)
        glob[:b_real] = np.stack([np.asarray(s.glob, np.float32)
                                  for s in samples])

    j = (lambda x: x) if numpy else jnp.asarray
    return GraphBatch(
        nodes=j(nodes), senders=j(senders), receivers=j(receivers),
        node_mask=j(node_mask), edge_mask=j(edge_mask), y=j(y),
        system=j(system), graph_mask=j(graph_mask), sample_id=j(sample_id),
        edges=j(edges) if edges is not None else None,
        edge_vec=j(edge_vec) if edge_vec is not None else None,
        edge_shift=j(edge_shift) if edge_shift is not None else None,
        glob=j(glob) if glob is not None else None,
        node_z=j(node_z) if node_z is not None else None,
    )
