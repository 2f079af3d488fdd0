"""Device-resident dataset: upload once, shuffle and batch ON DEVICE.

The host-side GraphLoader re-collates and re-transfers every epoch. For
datasets that fit in HBM (this workload: a few GB at most), the TPU-native
pipeline is: pad every sample to the dataset-global shapes ONCE, transfer
ONCE, then each epoch draw a device-side permutation and gather
[N, ...] -> [S, B, ...] batches inside the scan body — zero per-epoch host
work and zero host->device traffic after warmup.

Usage:
    dds = DeviceDataset.from_samples(train_samples, batch_size=8)
    state, losses, rng = trainer.train_epoch_device(state, dds, rng)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dostransformer_tpu.data.graph import GraphBatch, GraphSample, collate


class DeviceDataset(struct.PyTreeNode):
    """All samples as one GraphBatch of N graphs resident on device."""

    data: GraphBatch          # [N, ...] every leaf sample-leading
    batch_size: int = struct.field(pytree_node=False)

    @classmethod
    def from_samples(cls, samples: Sequence[GraphSample], batch_size: int,
                     atoms_per_graph=None, edges_per_graph=None,
                     storage_dtype=None, sharding=None) -> "DeviceDataset":
        # pad N up to a multiple of batch_size with dummy graphs
        # (graph_mask 0): every sample is seen every epoch, and the masked
        # loss ignores the dummies wherever the permutation lands them
        n = len(samples)
        n_pad = -(-n // batch_size) * batch_size
        # collate + dtype-convert on the HOST, then ONE upload straight into
        # the target placement. Staging the full dataset on the default
        # device first (the old collate(numpy=False) path) would make peak
        # per-device HBM the WHOLE dataset even when `sharding` splits it
        # 1/N per device — the opposite of the pod memory layout.
        data = collate(list(samples), atoms_per_graph=atoms_per_graph,
                       edges_per_graph=edges_per_graph, num_graphs=n_pad,
                       numpy=True)
        if storage_dtype is not None:
            # bf16 FEATURE storage: nodes/edges/node_z are the dominant HBM
            # residents and per-step gather traffic; storing them bf16
            # halves both. Targets (y), masks, glob and edge_vec (phDOS
            # geometry inputs) stay f32 — they are small, and loss/geometry
            # precision is kept. The model's input cast upcasts back to the
            # compute dtype; convergence at bf16 storage is validated by
            # benchmarks/convergence_demo.py --data_dtype (BASELINE.md).
            data = data.replace(
                nodes=data.nodes.astype(storage_dtype),
                edges=(data.edges.astype(storage_dtype)
                       if data.edges is not None else None),
                node_z=(data.node_z.astype(storage_dtype)
                        if data.node_z is not None else None))
        if sharding is not None:
            data = jax.tree.map(lambda x: jax.device_put(x, sharding), data)
        else:
            data = jax.tree.map(jnp.asarray, data)
        return cls(data=data, batch_size=batch_size)

    @property
    def num_samples(self) -> int:
        return self.data.nodes.shape[0]

    @property
    def steps_per_epoch(self) -> int:
        return self.num_samples // self.batch_size

    def nbytes(self) -> int:
        return sum(x.nbytes for x in jax.tree.leaves(self.data))


class BucketedDeviceDataset:
    """Samples partitioned by ATOM bucket, one DeviceDataset per bucket.

    The flat DeviceDataset pads every sample to the DATASET-GLOBAL atom/edge
    buckets: a realistic mixed-size corpus (eDOS crystals span ~4-230 atoms,
    SURVEY.md §3.3) then runs every batch at A_pad=256 even though most
    crystals are small — 2-8x wasted FLOPs on the padded rows. This variant
    applies the serving path's bucketing insight (serve.py groups requests by
    atom bucket, measured 1.5x on mixed requests) to training: group samples
    by `bucket_size(n_atoms)`, pad each group only to ITS bucket's shapes,
    and run one scan dispatch per bucket per epoch (a handful of compiled
    shapes, amortized like any other jit cache entry).

    Epoch semantics: each bucket's samples are shuffled on device every epoch
    (same `(seed, epoch)` key discipline as the flat path, folded per
    bucket); batches are drawn WITHIN buckets, so batch composition differs
    from a uniform global shuffle — the standard length-bucketing tradeoff
    (reference N/A: its PyG loader shuffles uniformly but pays ragged-batch
    recompilation instead). Every sample is still seen exactly once per
    epoch; the masked loss ignores the per-bucket dummy pads.
    """

    def __init__(self, buckets):
        # list of (atom_bucket, DeviceDataset), ascending by bucket
        self.buckets = buckets

    @classmethod
    def from_samples(cls, samples: Sequence[GraphSample], batch_size: int,
                     storage_dtype=None, sharding=None,
                     ) -> "BucketedDeviceDataset":
        from dostransformer_tpu.data.graph import bucket_size

        groups: dict[int, list] = {}
        for s in samples:
            groups.setdefault(bucket_size(s.n_nodes), []).append(s)
        buckets = [
            (a, DeviceDataset.from_samples(
                group, batch_size,
                storage_dtype=storage_dtype, sharding=sharding))
            for a, group in sorted(groups.items())
        ]
        return cls(buckets)

    @property
    def batch_size(self) -> int:
        return self.buckets[0][1].batch_size

    @property
    def steps_per_epoch(self) -> int:
        return sum(d.steps_per_epoch for _, d in self.buckets)

    @property
    def num_samples(self) -> int:
        return sum(d.num_samples for _, d in self.buckets)

    def nbytes(self) -> int:
        return sum(d.nbytes() for _, d in self.buckets)
