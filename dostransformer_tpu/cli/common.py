"""Shared CLI plumbing: argparse surface + the epoch/eval/early-stop driver.

Behavioral spec (reference main_eDOS.py:95-188, main_phDOS.py:95-179):
  * epoch loop over shuffled train batches; jit train step;
  * every `--eval` epochs run the valid set (batch 1 in the reference; here the
    same fixed padded shape), apply the three-branch best tracking
    (re-running the test set on improvement), then the plateau early-stop;
  * on finish (early or exhausted) append a result line to
    experiments_{embedder}.txt — same fields, same best-metric semantics —
    plus structured JSONL.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dostransformer_tpu.config import TrainConfig, exp_get_name
from dostransformer_tpu.data.datasets import GraphLoader
from dostransformer_tpu.data.graph import GraphSample
from dostransformer_tpu.models.registry import build_model
from dostransformer_tpu.parallel.mesh import initialize_multihost, make_mesh
from dostransformer_tpu.train.early_stop import BestTracker
from dostransformer_tpu.train.logging import JSONLLogger, write_experiment_result
from dostransformer_tpu.train.metrics import MetricAccumulator
from dostransformer_tpu.train.trainer import Trainer, make_adamw


def build_arg_parser(task: str) -> argparse.ArgumentParser:
    """The reference's 13 flags (utils.py:25-43) + TPU-native extensions."""
    p = argparse.ArgumentParser(f"dostpu-{task}")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8 if task == "edos" else 1)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--transformer", type=int, default=2)
    p.add_argument("--eval", type=int, default=5)
    p.add_argument("--es", type=int, default=50)
    p.add_argument("--embedder", type=str, default="DOSTransformer")
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--random_state", type=int, default=0)
    p.add_argument("--dataset", type=str, default="whole",
                   choices=["whole", "ood_crystal", "ood_element"])
    p.add_argument("--attn_drop", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--beta", type=float, default=1.0)
    # TPU-native extensions
    p.add_argument("--data_dir", type=str, default="./data/processed")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="train on N synthetic samples (no dataset files needed)")
    p.add_argument("--synthetic_learnable", action="store_true",
                   help="with --synthetic: targets are a deterministic "
                        "function of the structure (a learnable task) "
                        "instead of random noise — the corpus the "
                        "convergence and time-to-accuracy benchmarks train "
                        "to a real held-out RMSE on")
    p.add_argument("--padding", type=str, default="mask", choices=["mask", "ref"])
    p.add_argument("--use_pallas", action="store_true", default=None)
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch over all visible devices")
    p.add_argument("--tensor_parallel", type=int, default=1, metavar="N",
                   help="shard the transformer FFN over an N-device 'model' "
                        "mesh axis (Megatron fc1 column-/fc2 row-parallel; "
                        "XLA inserts the psum). The remaining devices form "
                        "the 'data' axis, so this composes with "
                        "--data_parallel. N/A-by-scale at hidden=256 "
                        "(SURVEY.md §2.5 TP row) — provided for scaled-up "
                        "--hidden runs. Pallas kernels are not partitionable "
                        "over 'model' and are disabled under TP")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--checkpoint_every", type=int, default=0)
    p.add_argument("--log_jsonl", type=str, default=None)
    p.add_argument("--results_dir", type=str, default=".")
    p.add_argument("--exp_name", type=str, default="")
    p.add_argument("--export_preds", type=str, default=None, metavar="NPZ",
                   help="write test-set predictions/targets/embeddings "
                        "(the reference's preds_y structure, utils.py:93-109)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="jax.profiler trace output directory")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax debug_nans (the runtime-sanitizer mode; "
                        "SPMD is race-free by construction, SURVEY.md §5)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype (params stay float32; norms/softmax f32)")
    p.add_argument("--host_loader", action="store_true",
                   help="collate+transfer batches from the host each epoch "
                        "instead of the device-resident dataset pipeline "
                        "(which uploads once and shuffles on device)")
    p.add_argument("--bf16_data", action="store_true",
                   help="store DeviceDataset features (nodes/edges) in "
                        "bfloat16: halves the one-time upload and the "
                        "per-step gather traffic; targets/masks stay f32 "
                        "(convergence validated, BASELINE.md)")
    p.add_argument("--bucketed", action="store_true",
                   help="partition the training set by atom bucket and pad "
                        "each group only to ITS bucket's shapes (vs the "
                        "dataset-global maxima): on mixed-size corpora most "
                        "batches run at a fraction of the global pad FLOPs. "
                        "One scan dispatch per bucket per epoch; batches "
                        "draw within buckets (length-bucketing semantics)")
    p.add_argument("--pad_bins", type=int, default=0, metavar="N",
                   help="run the energy-token axis lane-aligned at N (e.g. "
                        "256 for the 201 eDOS bins): attention shapes become "
                        "tile-aligned at the cost of pad rows through the "
                        "per-token matmuls; outputs are bit-identical "
                        "(pad bins masked + sliced). 0 = off")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize transformer/processor layers in the "
                        "backward pass (jax.checkpoint: memory for FLOPs)")
    p.add_argument("--x64", action="store_true",
                   help="enable float64 (CPU parity debugging only — the "
                        "reference trains phDOS in f64, main_phDOS.py:14-16; "
                        "TPUs have no native f64, SURVEY.md §7.3-2)")
    p.add_argument("--compile_cache", type=str, default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory: the "
                        "first full-model TPU compile takes minutes; caching "
                        "the executables makes repeat runs start in seconds")
    p.add_argument("--tensorboard", type=str, default=None, metavar="DIR",
                   help="also write TensorBoard scalar curves (loss, valid/"
                        "test metrics) to DIR — dependency-free event writer "
                        "(train/tensorboard.py)")
    p.add_argument("--init_torch", type=str, default=None, metavar="PT",
                   help="initialize params from a torch.save'd state_dict in "
                        "the reference repo's naming (fine-tune/migration "
                        "warm start; models/import_torch.py). A checkpoint "
                        "resume takes precedence when one exists")
    p.add_argument("--grad_clip", type=float, default=0.0, metavar="NORM",
                   help="clip gradients to this global norm (0 = off, the "
                        "reference behavior)")
    p.add_argument("--warmup_epochs", type=int, default=0, metavar="N",
                   help="linear lr warmup 0 -> lr over the first N epochs "
                        "(0 = off, the reference behavior)")
    p.add_argument("--cosine_lr", action="store_true",
                   help="cosine-decay the lr to 0 over the epochs after "
                        "warmup (off = the reference's fixed lr)")
    return p


def config_from_args(args: argparse.Namespace) -> TrainConfig:
    return TrainConfig(
        lr=args.lr, epochs=args.epochs, batch_size=args.batch_size,
        layers=args.layers, transformer=args.transformer,
        eval_every=args.eval, es=args.es, embedder=args.embedder,
        hidden=args.hidden, random_state=args.random_state,
        dataset=args.dataset, attn_drop=args.attn_drop, seed=args.seed,
        beta=args.beta, padding=args.padding, dtype=args.dtype,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, log_jsonl=args.log_jsonl,
    )


def run_training(
    task: str,
    cfg: TrainConfig,
    train: Sequence[GraphSample],
    valid: Sequence[GraphSample],
    test: Sequence[GraphSample],
    use_pallas: Optional[bool] = None,
    data_parallel: bool = False,
    tensor_parallel: int = 1,
    results_dir: str = ".",
    export_preds: Optional[str] = None,
    profile_dir: Optional[str] = None,
    debug_nans: bool = False,
    x64: bool = False,
    remat: bool = False,
    host_loader: bool = False,
    compile_cache: Optional[str] = None,
    tensorboard: Optional[str] = None,
    pad_bins: int = 0,
    bf16_data: bool = False,
    bucketed: bool = False,
    init_torch: Optional[str] = None,
    grad_clip: float = 0.0,
    warmup_epochs: int = 0,
    cosine_lr: bool = False,
) -> dict:
    """Train + eval + early stop; returns the final best metrics.

    SIGTERM (scheduler preemption) is latched from setup onward — a signal
    during the minutes-long first compile must not kill the run
    uncheckpointed; the loop saves at the next epoch boundary and exits
    cleanly (train/preemption.py). The previous handler is restored even
    when the run raises."""
    from dostransformer_tpu.train.preemption import GracefulShutdown

    stop = GracefulShutdown().install()
    try:
        return _run_training(stop, task, cfg, train, valid, test,
                             use_pallas, data_parallel, tensor_parallel,
                             results_dir,
                             export_preds, profile_dir, debug_nans, x64,
                             remat, host_loader, compile_cache, tensorboard,
                             pad_bins, bf16_data, bucketed, init_torch,
                             grad_clip, warmup_epochs, cosine_lr)
    finally:
        stop.restore()


def _run_training(
    stop,
    task: str,
    cfg: TrainConfig,
    train: Sequence[GraphSample],
    valid: Sequence[GraphSample],
    test: Sequence[GraphSample],
    use_pallas: Optional[bool],
    data_parallel: bool,
    tensor_parallel: int,
    results_dir: str,
    export_preds: Optional[str],
    profile_dir: Optional[str],
    debug_nans: bool,
    x64: bool,
    remat: bool,
    host_loader: bool,
    compile_cache: Optional[str],
    tensorboard: Optional[str],
    pad_bins: int,
    bf16_data: bool,
    bucketed: bool = False,
    init_torch: Optional[str] = None,
    grad_clip: float = 0.0,
    warmup_epochs: int = 0,
    cosine_lr: bool = False,
) -> dict:
    if bucketed and host_loader:
        raise ValueError("--bucketed requires the device-resident dataset "
                         "pipeline; drop --host_loader")
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
    if x64:
        jax.config.update("jax_enable_x64", True)
    if compile_cache:
        # persistent executable cache: repeat runs of the same config skip
        # the minutes-long first compile (cache keys include topology and
        # compiler version, so stale entries are misses, never corruption)
        jax.config.update("jax_compilation_cache_dir", compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Pallas kernels run under data parallelism too: the DP train step is a
    # shard_map over 'data', so each device's pallas_call sees its local
    # batch shard (validated: tests/test_train.py
    # test_dp_with_pallas_matches_single_device)
    # dp x tp runs the SAME shard_map path as pure DP (the whole train step
    # is mapped over the mesh; the model's tp_enter/tp_exit custom-VJP
    # collectives carry the Megatron FFN math — parallel/megatron.py), so
    # Pallas attention + fused_mp stay ON under --tensor_parallel: each
    # device's kernels see its local batch shard (VERDICT r3 weak #5).
    model = build_model(task, cfg.embedder, layers=cfg.layers,
                        t_layers=cfg.transformer, hidden=cfg.hidden,
                        attn_drop=cfg.attn_drop, padding=cfg.padding,
                        use_pallas=use_pallas, dtype=cfg.dtype, remat=remat,
                        use_fused_mp=None, bins_pad=pad_bins or None,
                        tp_axis="model" if tensor_parallel > 1 else None)
    if tensor_parallel > 1:
        n_dev = len(jax.devices())
        if n_dev % tensor_parallel != 0:
            raise SystemExit(
                f"--tensor_parallel {tensor_parallel} does not divide the "
                f"{n_dev} visible devices")
        # all devices participate: leftover devices form the 'data' axis
        # (data=1 when tp uses the whole slice) — composes with/without
        # --data_parallel
        mesh = make_mesh(shape=(n_dev // tensor_parallel, tensor_parallel),
                         axes=("data", "model"))
    elif data_parallel:
        mesh = make_mesh(axes=("data",))
    else:
        mesh = None
    n_data = mesh.shape["data"] if mesh is not None else 1
    if mesh is not None and cfg.batch_size % n_data != 0:
        raise SystemExit(
            f"--batch_size {cfg.batch_size} is not divisible by the "
            f"{n_data}-device 'data' mesh axis; each device takes "
            f"batch/{n_data} samples — pick a multiple of {n_data}")
    is_edos = task == "edos"
    loader = GraphLoader(train, batch_size=cfg.batch_size, shuffle=True,
                         seed=cfg.seed)
    # fine-tuning extensions (all default-off = reference-exact optimizer):
    # schedule horizons are in optimizer steps, derived from the loader
    steps_per_epoch = len(loader)
    tx = make_adamw(
        cfg.lr, cfg.weight_decay, grad_clip=grad_clip,
        warmup_steps=warmup_epochs * steps_per_epoch,
        cosine_decay_steps=(max(0, cfg.epochs - warmup_epochs)
                            * steps_per_epoch if cosine_lr else 0))
    trainer = Trainer(model, tx=tx, beta=cfg.beta, clamp_targets=is_edos,
                      eval_clamp=is_edos, mesh=mesh)
    # the reference evaluates at batch 1 (main_eDOS.py:55-56); our metrics are
    # per-sample masked, so ANY eval batch size gives bit-identical results —
    # use the training batch size (or the mesh size under DP) to cut the
    # number of eval dispatches
    # largest multiple of the 'data' axis that fits the training batch (so
    # TP meshes with a small data axis don't collapse eval to batch n_data
    # and inflate the scan length)
    eval_bs = (max(n_data, cfg.batch_size - cfg.batch_size % n_data)
               if mesh is not None else max(1, cfg.batch_size))
    # pin eval shapes to the training buckets: one compiled shape per split
    eval_samples = list(valid) + list(test)
    a_pin = max([loader.atoms_per_graph] + [s.n_nodes for s in eval_samples])
    e_pin = max([loader.edges_per_graph]
                + [max(s.n_edges, 1) for s in eval_samples])
    # numpy=True: the per-batch lists are only ever read on the HOST (metric
    # accumulation / artifact export below); collating them as device arrays
    # would pin a second full device copy of each eval split for the whole
    # run on top of the stacked one
    mk_eval = lambda ss: GraphLoader(ss, batch_size=eval_bs,
                                     atoms_per_graph=a_pin,
                                     edges_per_graph=e_pin, numpy=True)
    valid_loader, test_loader = mk_eval(valid), mk_eval(test)

    state = trainer.init_state(next(iter(loader)), seed=cfg.seed)
    tracker = BestTracker(es=cfg.es, eval_every=cfg.eval_every)
    # On a multi-host pod every process runs the identical host-side loop
    # (device collectives require it), but file writers must emit ONE copy:
    # results/JSONL/TensorBoard/artifacts write from process 0 only.
    # Checkpoint saves are NOT gated — orbax is itself multihost-aware
    # (all processes must call save; it coordinates who writes).
    is_main = jax.process_index() == 0
    logger = JSONLLogger(cfg.log_jsonl if is_main else None)
    tb = None
    if tensorboard and is_main:
        from dostransformer_tpu.train.tensorboard import SummaryWriter

        tb = SummaryWriter(tensorboard)
    ckpt = best_ckpt = None
    if cfg.checkpoint_dir and cfg.checkpoint_every:
        from dostransformer_tpu.train.checkpoint import (
            CheckpointManager,
            best_dir,
        )

        ckpt = CheckpointManager(cfg.checkpoint_dir)
        # the best-validation model is checkpointed SEPARATELY (one kept):
        # after early stopping, the latest cadence checkpoint is not the
        # model the reported test metrics describe — serving loads best/.
        # Saves use a MONOTONIC ordinal, not the epoch: a resumed run can
        # find a new best at an epoch <= the one already in best/ (the
        # restored cadence state predates the old best), and orbax silently
        # refuses saves at non-increasing steps — the true epoch rides in
        # the checkpoint meta instead.
        best_ckpt = CheckpointManager(best_dir(cfg.checkpoint_dir),
                                      max_to_keep=1)
        best_ordinal = best_ckpt.latest_epoch()
        best_ordinal = -1 if best_ordinal is None else best_ordinal
        restored = ckpt.restore(state)
    start_epoch = 0
    if ckpt is not None and restored is not None:
        state, start_epoch, rtracker = restored
        tracker = rtracker or tracker
        print(f"resumed from epoch {start_epoch}")
    if init_torch:
        if start_epoch:
            print(f"checkpoint resume at epoch {start_epoch} takes "
                  f"precedence; ignoring --init_torch {init_torch}")
        else:
            # migration warm start: reference-format torch weights onto the
            # freshly initialized params, preserving each leaf's sharding
            # (under DP/TP the init placed params on the mesh)
            from dostransformer_tpu.models.import_torch import (
                import_reference_state_dict,
                load_torch_state_dict,
            )

            imported = import_reference_state_dict(
                load_torch_state_dict(init_torch), state.params)
            state = state.replace(params=jax.tree.map(
                lambda new, old: jax.device_put(new, old.sharding),
                imported, state.params))
            print(f"initialized params from torch state_dict {init_torch}")

    # Collate + stack + upload each eval split ONCE; every eval interval
    # reuses the device-resident stack (re-listing the loader per eval would
    # repeat the host collation work the training path eliminated with
    # DeviceDataset).
    valid_batches, test_batches = list(valid_loader), list(test_loader)

    def _place_eval(batches):
        # stack on the HOST, then ONE upload straight into the target
        # placement (no staging copy on device 0)
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            sh = NamedSharding(mesh, PartitionSpec(None, "data"))
            return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)
        return jax.tree.map(jnp.asarray, stacked)

    valid_stacked = _place_eval(valid_batches)
    test_stacked = _place_eval(test_batches)

    def run_eval(batches, stacked, artifacts=None):
        # whole eval set in ONE dispatch (scan-compiled; Trainer.eval_epoch),
        # then accumulate per batch on host. The eval outputs are sharded
        # over 'data' (out_specs P(None, 'data')); on a multi-host pod the
        # shards span processes, so fetch_global allgathers them — identical
        # host-side metric math on every process.
        from dostransformer_tpu.parallel.mesh import fetch_global

        ms = trainer.eval_epoch(state.params, stacked)
        ms = fetch_global(ms)
        acc = MetricAccumulator()
        for i, batch in enumerate(batches):
            m = jax.tree.map(lambda x: x[i], ms)
            acc.update(m)
            if artifacts is not None:
                artifacts.update(m, batch)
        return acc.result()

    device_data = None
    # per-epoch shuffle keys derive from (seed, epoch): checkpoint resume
    # replays the exact same data order as an uninterrupted run
    shuffle_base = jax.random.PRNGKey(cfg.seed ^ 0x5EED)
    if not host_loader:
        # device-resident pipeline: upload once, shuffle+batch on device
        from dostransformer_tpu.train.device_dataset import (
            BucketedDeviceDataset, DeviceDataset)

        if bucketed:
            device_data = BucketedDeviceDataset.from_samples(
                train, cfg.batch_size,
                storage_dtype=jnp.bfloat16 if bf16_data else None,
                sharding=trainer.dataset_sharding())
            kb = ", ".join(f"A={a}:{d.num_samples}"
                           for a, d in device_data.buckets)
            print(f"bucketed training: {kb}")
        else:
            device_data = DeviceDataset.from_samples(
                train, cfg.batch_size,
                atoms_per_graph=loader.atoms_per_graph,
                edges_per_graph=loader.edges_per_graph,
                storage_dtype=jnp.bfloat16 if bf16_data else None,
                sharding=trainer.dataset_sharding())

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t_start = time.perf_counter()
    n_steps = 0
    stopped_early = False
    preempted = False
    epoch = start_epoch
    while epoch < cfg.epochs:
        # scan-compiled epochs: with the device-resident dataset a whole
        # eval interval (reference `eval`=5 epochs, main_eDOS.py:133) runs as
        # ONE dispatch — per-epoch shuffle keys still derive from
        # (seed, epoch), so resume and data order are unchanged. Off-boundary
        # remainders (resume mid-interval, misaligned checkpoint cadence) use
        # single-epoch dispatches to keep the number of compiled sizes at two.
        if device_data is not None:
            bound = min(cfg.epochs,
                        (epoch // cfg.eval_every + 1) * cfg.eval_every)
            if ckpt is not None and cfg.checkpoint_every:
                bound = min(bound, (epoch // cfg.checkpoint_every + 1)
                            * cfg.checkpoint_every)
            chunk = bound - epoch
            if chunk != cfg.eval_every:
                chunk = 1
            epoch_fn = (trainer.train_epoch_buckets if bucketed
                        else trainer.train_epoch_device)
            epochs_fn = (trainer.train_epochs_buckets if bucketed
                         else trainer.train_epochs_device)
            if chunk == 1:
                state, losses, _ = epoch_fn(
                    state, device_data,
                    jax.random.fold_in(shuffle_base, epoch))
                losses = losses[None]
            else:
                keys = jnp.stack([jax.random.fold_in(shuffle_base, e)
                                  for e in range(epoch, epoch + chunk)])
                state, losses = epochs_fn(state, device_data, keys)
            n_steps += int(losses.size)
        else:
            batches = list(loader)
            state, losses = trainer.train_epoch(state, batches)
            n_steps += len(batches)
            losses, chunk = losses[None], 1
        # ONE fetch for the whole chunk (a float() per epoch would pay the
        # host round trip chunk times, defeating the single-dispatch cadence)
        epoch_losses = np.asarray(losses.mean(axis=1))
        for i in range(chunk):
            mean_loss = float(epoch_losses[i])
            sys.stdout.write(
                f"\r[ epoch {epoch + i + 1}/{cfg.epochs} ] "
                f"loss {mean_loss:.4f} ")
            sys.stdout.flush()
            logger.log({"epoch": epoch + i + 1, "loss": mean_loss})
            if tb is not None:
                tb.add_scalars(epoch + i + 1, {"train/loss": mean_loss})
        epoch += chunk

        stop_now = stop.requested
        if jax.process_count() > 1:
            # a pod must AGREE on preemption: the scheduler may SIGTERM only
            # the reclaimed host (or signals land straddling a boundary
            # check), and a lone process entering the collective
            # checkpoint save while its peers dispatch the next train chunk
            # deadlocks the pod inside the grace window. One tiny
            # allgather per chunk boundary makes the decision global:
            # any process signaled -> every process checkpoints and exits.
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.array([stop_now], dtype=np.bool_))
            stop_now = bool(np.asarray(flags).any())
        if stop_now:
            # preemption grace windows are short: skip the pending eval
            # (resume re-runs it), save NOW, exit cleanly. The per-epoch
            # shuffle keys derive from (seed, epoch), so the follow-up run
            # reproduces an uninterrupted run exactly.
            preempted = True
            if ckpt is not None:
                ckpt.save(epoch, state, tracker)
                print(f"\n[preemption] checkpoint saved at epoch {epoch}")
            break

        if epoch % cfg.eval_every == 0:
            vm = run_eval(valid_batches, valid_stacked)
            logger.log({"epoch": epoch, "valid": vm})
            if tb is not None:
                tb.add_scalars(epoch, {f"valid/{k}": v
                                       for k, v in vm.items()})
            if tracker.update(epoch, vm["rmse"], vm["mae"]):
                tm = run_eval(test_batches, test_stacked)
                tracker.record_test(tm)
                logger.log({"epoch": epoch, "test": tm})
                if tb is not None:
                    tb.add_scalars(epoch, {f"test/{k}": v
                                           for k, v in tm.items()})
                print(f"\n[eval {epoch}] valid rmse {vm['rmse']:.4f} "
                      f"mae {vm['mae']:.4f} | test rmse {tm['rmse']:.4f} "
                      f"r2 {tm['r2']:.4f}")
                if best_ckpt is not None:
                    best_ordinal += 1
                    best_ckpt.save(best_ordinal, state, tracker,  # async
                                   epoch_meta=epoch)
            if tracker.step_and_should_stop():
                stopped_early = True
                break
        if ckpt is not None and cfg.checkpoint_every and \
                epoch % cfg.checkpoint_every == 0:
            ckpt.save(epoch, state, tracker)

    if ckpt is not None:
        ckpt.wait_until_finished()  # async saves must be durable before exit
    if best_ckpt is not None:
        best_ckpt.wait_until_finished()
    elapsed = time.perf_counter() - t_start
    if profile_dir:
        jax.profiler.stop_trace()
    if export_preds and not preempted:  # preemption grace windows are short
        from dostransformer_tpu.train.artifacts import EvalArtifacts

        art = EvalArtifacts()
        # the eval dispatch (and its pod allgather) is collective — every
        # process must run it; only process 0 writes the file
        run_eval(test_batches, test_stacked, artifacts=art)
        if is_main:
            mp_by_id = {}
            for s in list(train) + list(valid) + list(test):
                mp_by_id[int(s.sample_id)] = s.mp_id
            mp_ids = [mp_by_id.get(i, str(i))
                      for i in range(max(mp_by_id, default=-1) + 1)]
            art.save(export_preds, mp_ids=mp_ids)
            print(f"\nwrote eval artifacts -> {export_preds}")
    sps = n_steps * cfg.batch_size / max(elapsed, 1e-9)
    result = {
        "best_epoch": tracker.best_epoch,
        "best_valid_rmse": tracker.best_rmse,
        "best_valid_mae": tracker.best_mae,
        "test": tracker.test_metrics,
        "samples_per_sec": sps,
        "stopped_early": stopped_early,
        "preempted": preempted,
    }
    logger.log({"final": result})
    logger.close()
    if tb is not None:
        tb.close()
    if is_main:
        _write_results_line(task, cfg, result, results_dir)
    return result


def _write_results_line(task: str, cfg: TrainConfig, result: dict,
                        results_dir: str):
    """Append-only experiments_{embedder}.txt — the reference's EXACT block
    format (main_eDOS.py:91,167-186), drop-in identical including the
    "Early stop!!" line. samples/sec and the rest of the run record go to
    the JSONL log instead."""
    os.makedirs(results_dir, exist_ok=True)
    path = os.path.join(results_dir, f"experiments_{cfg.embedder}.txt")
    tm = result.get("test") or {}
    nan = float("nan")
    write_experiment_result(
        path,
        configuration=exp_get_name(cfg),
        best_epoch=result["best_epoch"],
        test_rmse=tm.get("rmse", nan),
        test_mse=tm.get("mse", nan),
        test_mae=tm.get("mae", nan),
        test_r2=tm.get("r2", nan),
        early_stopped=result["stopped_early"],
    )


def resolve_device_info() -> str:
    d = jax.devices()[0]
    return f"{jax.default_backend()}:{d.device_kind} x{len(jax.devices())}"


def maybe_init_multihost(data_parallel: bool) -> None:
    """CLI entry hook: DCN init for --data_parallel runs. MUST run before any
    other JAX call (jax.distributed.initialize refuses once the backend is
    up). No-op (and backend-untouched) in a plain single-process environment;
    raises loudly on a botched cluster init (tests/test_multihost.py)."""
    if data_parallel and initialize_multihost():
        print(f"multi-host: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} global devices")
