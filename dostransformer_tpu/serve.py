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

import json
import os
from typing import List, Sequence

import jax
import numpy as np

from dostransformer_tpu.data.datasets import GraphLoader
from dostransformer_tpu.data.graph import GraphSample, RequestError
from dostransformer_tpu.models.registry import build_model


def _stream_dispatch(loader, pick, dispatch_one, dispatch_chunk):
    """Stream collated batches into device dispatches (shared by the live
    and exported predictors so their serving semantics cannot drift).

    Batches dispatch AS THEY ARRIVE, so host collation of batch/chunk i+1
    overlaps device compute and upload of chunk i (collating the whole
    request first was measured 1,025 vs 661 ms/batch at B=256).
    ``pick(remaining, batch_bytes)`` chooses the group size: groups > 1
    stack into one scan dispatch, size-1 groups dispatch individually with
    eager per-leaf device_put (the transfers start async immediately;
    passing numpy leaves as jit args instead serializes one large upload
    per dispatch — measured 1,741 vs 661 ms/batch at B=256 through the
    tunnel). Returns (pending device outputs, keep masks)."""
    keeps: List[np.ndarray] = []
    pending: List = []
    buf: List = []
    target = batch_bytes = None
    for batch in loader:
        keeps.append(np.asarray(batch.graph_mask) > 0.5)
        if target is None:
            batch_bytes = sum(x.nbytes for x in jax.tree.leaves(batch))
            target = pick(len(loader), batch_bytes)
        buf.append(batch)
        if target == 1:
            pending.append(dispatch_one(buf.pop()))
        elif len(buf) == target:
            pending.append(dispatch_chunk(buf))
            buf.clear()
    i = 0
    while i < len(buf):  # remainder: greedy smaller groups
        s = pick(len(buf) - i, batch_bytes)
        if s == 1:
            pending.append(dispatch_one(buf[i]))
        else:
            pending.append(dispatch_chunk(buf[i: i + s]))
        i += s
    return pending, keeps


def _assemble(pending, keeps, batch_size: int) -> np.ndarray:
    """Concatenate dispatched outputs ON DEVICE, fetch once, and drop the
    dummy-graph rows of the short final batch — the fetch round trip is
    paid once per call, never per batch."""
    dev = (jax.numpy.concatenate(pending, axis=0) if len(pending) > 1
           else pending[0])
    # ONE host transfer; on a pod (output shards span processes — plain
    # np.asarray would raise) fetch_global allgathers instead. The gate is
    # the array's own addressability, so meshless/exported predictors in a
    # multi-process job keep the plain local fetch.
    from dostransformer_tpu.parallel.mesh import fetch_global

    flat = fetch_global(dev)
    outs = [flat[i * batch_size: i * batch_size + batch_size][keep]
            for i, keep in enumerate(keeps)]
    return np.concatenate(outs, axis=0)


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

        def forward_chunk(params, stacked):
            # scan the forward over a [S, B, ...] stack of batches: ONE
            # device dispatch (and one input upload) per chunk instead of
            # per batch — the serving analogue of the trainer's
            # scan-compiled epochs; returns [S*B, bins]
            def body(c, b):
                return c, forward(params, b)

            _, out = jax.lax.scan(body, jax.numpy.zeros((), jax.numpy.int32),
                                  stacked)
            return out.reshape((-1, out.shape[-1]))

        self._forward_fn = forward          # raw (unjitted) fns — export()
        self._forward_chunk_fn = forward_chunk  # retraces them single-device
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if batch_size % mesh.devices.size != 0:
                # startup validation must survive python -O (an assert
                # would strip and the first request would die in device_put
                # with an opaque XLA sharding error)
                raise ValueError(
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
            # stacked batches are [S, B, ...]: batch axis is axis 1
            self._chunk_sharding = NamedSharding(mesh, P(None, "data"))
            self._forward_chunk = jax.jit(
                forward_chunk, in_shardings=(self._param_sharding,
                                             self._chunk_sharding),
                out_shardings=self._batch_sharding)
        else:
            self._batch_sharding = self._chunk_sharding = None
            self._forward = jax.jit(forward)
            self._forward_chunk = jax.jit(forward_chunk)

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
        prefer: str = "best",
        **model_kwargs,
    ) -> "Predictor":
        """Restore params from the training CheckpointManager layout.

        ``prefer="best"`` (default) serves the best-validation model the
        training loop checkpointed under ``<dir>/best`` — the model the run's
        reported test metrics describe (after early stopping the LATEST
        cadence checkpoint is a later, worse state) — falling back to the
        latest cadence checkpoint when no best was saved.
        ``prefer="latest"`` serves the newest cadence checkpoint.

        Pass ``mesh`` to serve the restored checkpoint sharded over a 'data'
        mesh axis (the pod serving layout) — forwarded to the constructor,
        which replicates the params and shards each inference batch."""
        from dostransformer_tpu.data.graph import collate
        from dostransformer_tpu.train.checkpoint import (
            CheckpointManager,
            best_dir,
        )
        from dostransformer_tpu.train.trainer import Trainer

        if prefer not in ("best", "latest"):
            raise ValueError(f"prefer must be 'best' or 'latest', "
                             f"got {prefer!r}")
        model = build_model(task, embedder, layers=layers, t_layers=t_layers,
                            hidden=hidden, **model_kwargs)
        trainer = Trainer(model, clamp_targets=False, eval_clamp=False)
        template = trainer.init_state(collate([example]))
        restored = None
        if prefer == "best" and os.path.isdir(best_dir(checkpoint_dir)):
            restored = CheckpointManager(
                best_dir(checkpoint_dir)).restore(template)
        if restored is None:
            restored = CheckpointManager(checkpoint_dir).restore(template)
        if restored is None:
            raise FileNotFoundError(
                f"no checkpoint found under {checkpoint_dir}")
        state, _, _ = restored
        return cls(model, state.params, batch_size=batch_size,
                   clamp=(task == "edos"), mesh=mesh)

    @classmethod
    def from_torch(
        cls,
        state_dict_path: str,
        task: str,
        example: GraphSample,
        embedder: str = "DOSTransformer",
        layers: int = 3,
        t_layers: int = 2,
        hidden: int = 256,
        batch_size: int = 8,
        mesh=None,
        strict: bool = True,
        **model_kwargs,
    ) -> "Predictor":
        """Serve weights trained with the reference PyTorch repo.

        Loads a ``torch.save``'d state_dict in the reference's module naming
        (reference embedder_eDOS/DOSTransformer.py:17-43; mapping in
        models/import_torch.py) and places it onto a freshly built model —
        the weight half of the migration path for users bringing
        reference-trained models to TPU. The model-shape args must match the
        checkpoint (mismatches raise with the offending key)."""
        from dostransformer_tpu.data.graph import collate
        from dostransformer_tpu.models.import_torch import (
            import_reference_state_dict,
            load_torch_state_dict,
        )

        model = build_model(task, embedder, layers=layers, t_layers=t_layers,
                            hidden=hidden, **model_kwargs)
        template = model.init(jax.random.PRNGKey(0), collate([example]))
        params = import_reference_state_dict(
            load_torch_state_dict(state_dict_path), template, strict=strict)
        return cls(model, params["params"], batch_size=batch_size,
                   clamp=(task == "edos"), mesh=mesh)

    # batches per scan dispatch: greedy largest-first from power-of-two
    # sizes keeps the compiled executable count bounded (4 per bucket shape)
    # with <2x dispatch count over optimal for any request size
    _CHUNKS = (8, 4, 2, 1)
    # per-chunk input byte budget: chunks amortize per-dispatch overhead,
    # but an over-large stacked upload serializes against the device and
    # (through the tunneled backend) transfers far slower than pipelined
    # per-batch uploads — measured B=64: 465 ms/batch chunked vs 179
    # unchunked. Under the budget only small batches chunk; a batch that
    # alone exceeds it dispatches individually with no stacking copy.
    _CHUNK_BYTES = 8 * 1024 * 1024

    def _pick_chunk(self, remaining: int, batch_bytes: int) -> int:
        for c in self._CHUNKS:
            if c <= remaining and c * batch_bytes <= self._CHUNK_BYTES:
                return c
        return 1

    def predict(self, samples: Sequence[GraphSample],
                bucketed: bool = True) -> np.ndarray:
        """DOS spectra for the given samples, [N, bins], input order.

        ``bucketed`` (default): samples are grouped by their ATOM padding
        bucket (power-of-two — data/graph.py bucket_size; the edge bucket
        then derives from each group's own maximum) and each group predicts
        at ITS bucket shape instead of the request-wide maxima — a mixed
        request of small and large crystals otherwise pads every small
        crystal to the largest one's shape (up to ~25x wasted pad FLOPs at
        the SURVEY §3.3 size envelope). Atom-bucket-only grouping keeps the
        group count small (~6 across the whole size envelope): keying on
        the edge bucket too was measured SLOWER end-to-end (0.45x on a
        mixed request) because every 128-edge increment became its own
        group with its own dispatch/fetch round trips and short-batch
        dummy padding. Results reassemble in input order.

        Each group's batches collate on the host (NumPy leaves) and
        dispatch in byte-budgeted chunks — a [S, B, ...] stack scanned in
        ONE jitted dispatch when several batches fit the budget (amortizing
        dispatch overhead for small batches), individual batches otherwise
        (keeping upload/compute pipelining for large ones). All chunks are
        dispatched before any result is fetched, the outputs concatenate on
        device, and a single fetch returns the whole group — the fetch
        round trip is paid once per group, never per batch."""
        samples = list(samples)
        if not samples:
            raise RequestError("empty request: no samples to predict")
        if bucketed:
            from dostransformer_tpu.data.graph import bucket_size

            groups: dict = {}
            for i, s in enumerate(samples):
                groups.setdefault(bucket_size(s.n_nodes), []).append(i)
            if len(groups) > 1:
                out = None
                for idxs in groups.values():
                    sub = self.predict([samples[i] for i in idxs],
                                       bucketed=False)
                    if out is None:
                        out = np.empty((len(samples), sub.shape[1]),
                                       sub.dtype)
                    out[np.asarray(idxs)] = sub
                return out
        loader = GraphLoader(samples, batch_size=self.batch_size,
                             numpy=True)

        # on a multi-process pod, jit refuses numpy args against shardings
        # that span processes — pre-place them as global arrays (device_put
        # accepts same-on-every-process host values). Single-process keeps
        # the measured-fast paths: eager per-leaf asarray for singles, numpy
        # jit args for chunks.
        pod = jax.process_count() > 1 and self._batch_sharding is not None

        def one(batch):
            if pod:
                dev_b = jax.tree.map(
                    lambda x: jax.device_put(x, self._batch_sharding), batch)
            else:
                dev_b = jax.tree.map(jax.numpy.asarray, batch)
            return self._forward(self.params, dev_b)

        def many(batches):
            stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
            if pod:
                stacked = jax.tree.map(
                    lambda x: jax.device_put(x, self._chunk_sharding),
                    stacked)
            return self._forward_chunk(self.params, stacked)

        pending, keeps = _stream_dispatch(loader, self._pick_chunk,
                                          one, many)
        return _assemble(pending, keeps, self.batch_size)

    def export(self, path: str, example: Sequence[GraphSample],
               platforms: Sequence[str] | None = None) -> None:
        """Serialize an ahead-of-time serving artifact to ``path``.

        The jitted forward — with the current params BAKED IN as constants —
        is exported to portable StableHLO bytes (``jax.export``) plus a JSON
        sidecar with the collation geometry. The artifact is loadable by
        :class:`ExportedPredictor` WITHOUT the model definition, flax, or
        the training stack: the deployment story for serving fleets (the
        reference never serializes its model at all — SURVEY.md §5).

        ``example`` fixes the padding buckets (and must cover the serving
        shape envelope — collation of larger crystals raises ValueError).

        Known size trade-off: forward.stablehlo and forward_chunk.stablehlo
        each bake the full parameter set as constants (~2x the weights per
        artifact) — jax.export serializes one function per module and the
        chunk function is what makes small-batch serving 5x (BASELINE.md).
        Accepted: artifacts are tens of MB and written once per deploy.
        Exporting a mesh-sharded predictor works: the artifact is retraced
        single-device from host copies of the params.
        ``platforms`` optionally cross-exports (e.g. ``("cpu", "tpu")``);
        the default exports for the current backend. Validated on the real
        TPU with the Pallas fused-attention forward (the Mosaic
        ``tpu_custom_call`` is on jax.export's stable-custom-call list):
        flagship eDOS artifact 26.7 MB, predictions bit-match the live
        predictor.
        """
        from jax import export as jexport

        loader = GraphLoader(list(example), batch_size=self.batch_size,
                             numpy=True)
        batch = next(iter(loader))
        leaves, treedef = jax.tree.flatten(batch)
        # a mesh-sharded predictor's params are committed to mesh devices
        # and its jitted forwards carry in_shardings — export retraces the
        # RAW forward on host copies so the artifact is a plain
        # single-device function regardless of the serving mesh
        # (fetch via np, re-commit via jnp: leaving raw numpy leaves in the
        # closure breaks tracing — numpy fancy-indexing by a tracer)
        params = (jax.tree.map(lambda x: jax.numpy.asarray(np.asarray(x)),
                               self.params)
                  if self.mesh is not None else self.params)
        fwd = self._forward_fn

        # flat-leaf calling convention: custom-pytree serialization is not
        # needed at load time, only the leaf order (re-derived by flattening
        # a batch collated with the same geometry)
        def flat_fn(*ls):
            return fwd(params, jax.tree.unflatten(treedef, ls))

        specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]
        exp = jexport.export(jax.jit(flat_fn), platforms=platforms)(*specs)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "forward.stablehlo"), "wb") as f:
            f.write(exp.serialize())

        # also export the scan-of-CHUNK forward so exported serving gets the
        # same dispatch amortization as the live predictor (one dispatch per
        # 8 batches for small-batch fleets)
        fwd_chunk = self._forward_chunk_fn

        def flat_chunk_fn(*ls):
            return fwd_chunk(params, jax.tree.unflatten(treedef, ls))

        s = max(self._CHUNKS)
        chunk_specs = [jax.ShapeDtypeStruct((s,) + l.shape, l.dtype)
                       for l in leaves]
        expc = jexport.export(jax.jit(flat_chunk_fn),
                              platforms=platforms)(*chunk_specs)
        with open(os.path.join(path, "forward_chunk.stablehlo"), "wb") as f:
            f.write(expc.serialize())

        meta = {
            "batch_size": self.batch_size,
            "atoms_per_graph": loader.atoms_per_graph,
            "edges_per_graph": loader.edges_per_graph,
            "bins": int(exp.out_avals[0].shape[-1]),
            "n_leaves": len(leaves),
            "clamp": self.clamp,
            "chunk": s,
        }
        with open(os.path.join(path, "serving_meta.json"), "w") as f:
            json.dump(meta, f, indent=1)


class ExportedPredictor:
    """Serve from a :meth:`Predictor.export` artifact — no model code.

    Loads the StableHLO function (weights baked in) and the collation
    geometry; ``predict`` matches :meth:`Predictor.predict` output exactly.
    Runs on any platform the artifact was exported for."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(os.path.join(path, "serving_meta.json")) as f:
            self.meta = json.load(f)
        with open(os.path.join(path, "forward.stablehlo"), "rb") as f:
            self._exp = jexport.deserialize(f.read())
        self._call = jax.jit(self._exp.call)
        self.batch_size = self.meta["batch_size"]
        # scan-of-CHUNK variant (absent in pre-chunk artifacts)
        self._call_chunk = None
        self.chunk = int(self.meta.get("chunk", 0))
        chunk_path = os.path.join(path, "forward_chunk.stablehlo")
        if self.chunk > 1 and os.path.exists(chunk_path):
            with open(chunk_path, "rb") as f:
                self._call_chunk = jax.jit(jexport.deserialize(f.read()).call)

    def _leaves(self, batch):
        leaves = jax.tree.leaves(batch)
        if len(leaves) != self.meta["n_leaves"]:
            raise ValueError(
                f"collated batch has {len(leaves)} leaves, artifact expects "
                f"{self.meta['n_leaves']} — task/featurization mismatch")
        return leaves

    def _pick_chunk(self, remaining: int, batch_bytes: int) -> int:
        """Only two exported functions exist: the scan-of-``chunk`` and the
        single batch — so groups are ``chunk`` or 1 (the live Predictor's
        intermediate power-of-two sizes have no exported counterpart)."""
        if (self._call_chunk is not None and remaining >= self.chunk
                and self.chunk * batch_bytes <= Predictor._CHUNK_BYTES):
            return self.chunk
        return 1

    def predict(self, samples: Sequence[GraphSample]) -> np.ndarray:
        """DOS spectra [N, bins]; same streamed dispatch + fetch-once
        semantics as Predictor.predict (shared _stream_dispatch/_assemble).
        Full under-byte-budget groups of ``chunk`` batches run through the
        exported scan function; everything else dispatches per batch."""
        samples = list(samples)
        if not samples:
            raise RequestError("empty request: no samples to predict")
        loader = GraphLoader(samples, batch_size=self.batch_size,
                             atoms_per_graph=self.meta["atoms_per_graph"],
                             edges_per_graph=self.meta["edges_per_graph"],
                             numpy=True)

        def one(batch):
            return self._call(*[jax.numpy.asarray(l)
                                for l in self._leaves(batch)])

        def many(batches):
            cols = zip(*[self._leaves(b) for b in batches])
            return self._call_chunk(*[np.stack(c) for c in cols])

        pending, keeps = _stream_dispatch(loader, self._pick_chunk,
                                          one, many)
        return _assemble(pending, keeps, self.batch_size)
