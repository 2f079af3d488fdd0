"""Inference / serving path.

The reference has no serving story (the model is never serialized, SURVEY.md
§5). This module provides one: load an orbax checkpoint (or take in-memory
params), jit-compile the forward once per batch-shape bucket, and predict DOS
spectra for featurized crystals. Designed for production batch serving on
TPU: fixed-shape buckets keep the compile count bounded, donated inputs and
batch-axis sharding work the same as in training.

Example:
    predictor = Predictor.from_checkpoint("ckpt/", task="phdos")
    spectra = predictor.predict(samples)           # [N, bins]
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import numpy as np

from dostransformer_tpu.data.datasets import GraphLoader
from dostransformer_tpu.data.graph import GraphSample
from dostransformer_tpu.models.registry import build_model


class Predictor:
    """Batched DOS inference over fixed-shape buckets.

    Pass ``mesh`` (a 1-D ``jax.sharding.Mesh`` over a ``'data'`` axis, e.g.
    from :func:`dostransformer_tpu.parallel.mesh.make_mesh`) to shard each
    inference batch over the devices — the pod serving layout: params
    replicated, batch split over ICI, no collectives needed in the forward.
    ``batch_size`` must then divide by the mesh size."""

    def __init__(self, model, params, batch_size: int = 8,
                 clamp: bool = False, mesh=None):
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self.clamp = clamp  # eDOS eval clamps predictions at 0 (utils.py:76)
        self.mesh = mesh

        def forward(params, batch):
            out = model.apply({"params": params}, batch, deterministic=True)
            if isinstance(out, tuple):
                dos = out[2] if len(out) == 3 else out[0]
            else:
                dos = out
            if clamp:
                dos = jax.numpy.where(dos < 0, 0.0, dos)
            return dos

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert batch_size % mesh.devices.size == 0, (
                f"batch_size {batch_size} must divide over the "
                f"{mesh.devices.size}-device mesh")
            self._batch_sharding = NamedSharding(mesh, P("data"))
            self._param_sharding = NamedSharding(mesh, P())
            self.params = jax.tree.map(
                lambda x: jax.device_put(x, self._param_sharding), params)
            self._forward = jax.jit(
                forward, in_shardings=(self._param_sharding,
                                       self._batch_sharding),
                out_shardings=self._batch_sharding)
        else:
            self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_dir: str,
        task: str,
        example: GraphSample,
        embedder: str = "DOSTransformer",
        layers: int = 3,
        t_layers: int = 2,
        hidden: int = 256,
        batch_size: int = 8,
        mesh=None,
        **model_kwargs,
    ) -> "Predictor":
        """Restore params from the training CheckpointManager layout.

        Pass ``mesh`` to serve the restored checkpoint sharded over a 'data'
        mesh axis (the pod serving layout) — forwarded to the constructor,
        which replicates the params and shards each inference batch."""
        from dostransformer_tpu.data.graph import collate
        from dostransformer_tpu.train.checkpoint import CheckpointManager
        from dostransformer_tpu.train.trainer import Trainer

        model = build_model(task, embedder, layers=layers, t_layers=t_layers,
                            hidden=hidden, **model_kwargs)
        trainer = Trainer(model, clamp_targets=False, eval_clamp=False)
        template = trainer.init_state(collate([example]))
        mgr = CheckpointManager(checkpoint_dir)
        restored = mgr.restore(template)
        if restored is None:
            raise FileNotFoundError(
                f"no checkpoint found under {checkpoint_dir}")
        state, _, _ = restored
        return cls(model, state.params, batch_size=batch_size,
                   clamp=(task == "edos"), mesh=mesh)

    def predict(self, samples: Sequence[GraphSample]) -> np.ndarray:
        """DOS spectra for the given samples, [N, bins], input order.

        Pipelined: every batch is DISPATCHED before any result is fetched —
        JAX dispatch is async, so host collation of batch i+1 overlaps with
        device compute of batch i, and the host↔device round trip (which
        through the tunneled backend costs ~30-55 ms per fetch) is paid once
        per call, not once per batch."""
        loader = GraphLoader(list(samples), batch_size=self.batch_size)
        pending = [(self._forward(self.params, batch),
                    np.asarray(batch.graph_mask) > 0.5)
                   for batch in loader]
        outs: List[np.ndarray] = [np.asarray(dos)[keep]
                                  for dos, keep in pending]
        return np.concatenate(outs, axis=0)
