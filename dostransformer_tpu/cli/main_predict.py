"""Batch-inference driver: featurized samples (.npz) + checkpoint -> DOS
spectra (.npz).

The reference has no inference entry point at all (SURVEY.md §5: the model is
never serialized); this is the serving counterpart of main_edos/main_phdos.

    python -m dostransformer_tpu.cli.main_predict \
        --task phdos --checkpoint_dir ckpt/ --input data.npz --output preds.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("dostpu-predict")
    p.add_argument("--task", choices=["edos", "phdos"],
                   help="required unless --from_exported")
    p.add_argument("--checkpoint_dir",
                   help="training checkpoint to serve (or --from_exported)")
    p.add_argument("--input", required=True, help="featurized samples .npz")
    p.add_argument("--output", required=True, help="predictions .npz")
    p.add_argument("--embedder", default="DOSTransformer")
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--transformer", type=int, default=2)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each inference batch over all visible devices "
                        "(params replicated — the pod serving layout); "
                        "--batch_size must divide by the device count")
    p.add_argument("--checkpoint_state", choices=["best", "latest"],
                   default=None,
                   help="'best' (default) serves the best-validation model "
                        "(<dir>/best, falling back to latest when absent); "
                        "'latest' serves the newest cadence checkpoint")
    p.add_argument("--export", metavar="DIR",
                   help="after loading the checkpoint, write an "
                        "ahead-of-time serving artifact (StableHLO with "
                        "baked weights, loadable via --from_exported "
                        "without the model stack) and exit")
    p.add_argument("--from_exported", metavar="DIR",
                   help="serve a Predictor.export artifact instead of a "
                        "checkpoint (ignores the model-shape flags)")
    p.add_argument("--torch_state_dict", metavar="PATH",
                   help="serve a torch.save'd state_dict from the reference "
                        "PyTorch repo instead of a checkpoint (migration "
                        "path; model-shape flags must match the weights)")
    p.add_argument("--metrics", action="store_true",
                   help="also evaluate the predictions against the samples' "
                        "carried targets with the reference's eval semantics "
                        "(per-sample RMSE/MSE/MAE + variance-weighted r2, "
                        "system head; eDOS clamps targets at 0) — printed as "
                        "one JSON line and stored in the output npz")
    args = p.parse_args(argv)

    # multi-host pods must initialize DCN before the backend comes up, or
    # each process silently serves over 1/N of the devices (same policy as
    # the training CLIs — parallel/mesh.py fails loudly on a botched init)
    from dostransformer_tpu.cli.common import maybe_init_multihost

    maybe_init_multihost(args.data_parallel)

    from dostransformer_tpu.data.io import load_samples
    from dostransformer_tpu.serve import ExportedPredictor, Predictor

    if args.from_exported and args.export:
        p.error("--export requires a checkpoint (--checkpoint_dir); "
                "it cannot re-export a --from_exported artifact")
    if args.from_exported and args.data_parallel:
        p.error("--data_parallel serves from a checkpoint; exported "
                "artifacts are single-device functions")
    if args.from_exported and args.checkpoint_state:
        p.error("--checkpoint_state picks which checkpoint to load; an "
                "exported artifact has its params baked in")
    if args.torch_state_dict and (args.from_exported or args.checkpoint_dir
                                  or args.checkpoint_state):
        p.error("--torch_state_dict replaces the checkpoint source; give "
                "exactly one of --checkpoint_dir / --from_exported / "
                "--torch_state_dict (and no --checkpoint_state)")
    samples = load_samples(args.input)
    if args.from_exported:
        predictor = ExportedPredictor(args.from_exported)
    else:
        if not (args.task and (args.checkpoint_dir or args.torch_state_dict)):
            p.error("--task and --checkpoint_dir (or --torch_state_dict) are "
                    "required unless --from_exported is given")
        mesh = None
        if args.data_parallel:
            from dostransformer_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(axes=("data",))
        if args.torch_state_dict:
            predictor = Predictor.from_torch(
                args.torch_state_dict, task=args.task, example=samples[0],
                embedder=args.embedder, layers=args.layers,
                t_layers=args.transformer, hidden=args.hidden,
                batch_size=args.batch_size, mesh=mesh)
        else:
            predictor = Predictor.from_checkpoint(
                args.checkpoint_dir, task=args.task, example=samples[0],
                embedder=args.embedder, layers=args.layers,
                t_layers=args.transformer, hidden=args.hidden,
                batch_size=args.batch_size, mesh=mesh,
                prefer=args.checkpoint_state or "best")
        import jax

        # pod runs execute this CLI on EVERY process (the predict dispatch
        # and its fetch allgather are collectives) but exactly one copy of
        # each output file may be written — concurrent writers to the
        # shared filesystem interleave and corrupt the npz/artifact
        is_main = jax.process_index() == 0
        if args.export:
            if is_main:
                predictor.export(args.export, samples)
                print(f"exported serving artifact -> {args.export}")
            return None
    if args.metrics and not args.task:
        p.error("--metrics needs --task (it picks the reference eval "
                "semantics: eDOS clamps targets at 0, phDOS does not)")
    dos = predictor.predict(samples)
    metrics = None
    if args.metrics:
        from dostransformer_tpu.train.metrics import r2_variance_weighted

        ys = np.stack([np.asarray(s.y, np.float64) for s in samples])
        preds = np.asarray(dos, np.float64)
        if args.task == "edos":
            # reference `test` clamps y (utils.py:74-76); the eDOS predictor
            # already clamps its predictions
            ys = np.clip(ys, 0.0, None)
        mse = ((ys - preds) ** 2).mean(axis=-1)
        metrics = {
            "rmse": float(np.sqrt(mse).mean()),
            "mse": float(mse.mean()),
            "mae": float(np.abs(ys - preds).mean(axis=-1).mean()),
            "r2": float(np.mean([r2_variance_weighted(y, pp)
                                 for y, pp in zip(ys, preds)])),
            "n": int(len(samples)),
        }
    import jax

    if jax.process_index() == 0:
        extra = {}
        if metrics is not None:
            import json

            print(json.dumps({"metrics": metrics}))
            extra = {k: np.float64(v) for k, v in metrics.items()}
        np.savez_compressed(
            args.output, dos=dos,
            sample_id=np.asarray([s.sample_id for s in samples]),
            mp_id=np.asarray([s.mp_id for s in samples]), **extra)
        print(f"predicted {dos.shape[0]} spectra ({dos.shape[1]} bins) "
              f"-> {args.output}")
    return dos


if __name__ == "__main__":
    main()
