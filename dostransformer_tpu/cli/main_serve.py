"""HTTP model-server driver: checkpoint or exported artifact -> endpoint.

The reference has no serving entry point (SURVEY.md §5); this is the
network-facing counterpart of main_predict.

    # from a training checkpoint (needs one featurized sample for the
    # param template + padding buckets):
    python -m dostransformer_tpu.cli.main_serve \
        --task phdos --checkpoint_dir ckpt/ --example data.npz --port 8000

    # from an ahead-of-time artifact (no model flags needed):
    python -m dostransformer_tpu.cli.main_serve \
        --from_exported artifact/ --port 8000

Protocol: POST /predict with a data/io.py samples npz body returns an npz
{dos, sample_id, mp_id}; GET /healthz returns JSON. See serve_http.py.
"""

from __future__ import annotations

import argparse


def build_server(argv=None):
    """Parse args and return the configured (unstarted) HTTP server."""
    p = argparse.ArgumentParser("dostpu-serve")
    p.add_argument("--task", choices=["edos", "phdos"],
                   help="required unless --from_exported")
    p.add_argument("--checkpoint_dir",
                   help="training checkpoint to serve (or --from_exported)")
    p.add_argument("--example",
                   help="featurized samples .npz fixing the param template "
                        "and padding buckets (required with "
                        "--checkpoint_dir)")
    p.add_argument("--from_exported", metavar="DIR",
                   help="serve a Predictor.export artifact (ignores the "
                        "model-shape flags)")
    p.add_argument("--torch_state_dict", metavar="PATH",
                   help="serve a torch.save'd state_dict from the reference "
                        "PyTorch repo (migration path; model-shape flags "
                        "must match the weights; needs --example)")
    p.add_argument("--embedder", default="DOSTransformer")
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--transformer", type=int, default=2)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each inference batch over all visible "
                        "devices (params replicated — the pod serving "
                        "layout); --batch_size must divide by the device "
                        "count; checkpoint serving only")
    p.add_argument("--checkpoint_state", choices=["best", "latest"],
                   default=None,
                   help="'best' (default) serves the best-validation model "
                        "(<dir>/best, falling back to latest when absent); "
                        "'latest' serves the newest cadence checkpoint")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--coalesce_ms", type=float, default=0.0,
                   help="micro-batch concurrent requests into one device "
                        "dispatch, waiting up to this many ms for "
                        "stragglers (0 = off)")
    args = p.parse_args(argv)

    # same pod policy as main_predict/main_edos: DCN init before the
    # backend, loud failure instead of silently serving 1/N of the devices
    from dostransformer_tpu.cli.common import maybe_init_multihost

    maybe_init_multihost(args.data_parallel)

    import jax

    from dostransformer_tpu.serve import ExportedPredictor, Predictor
    from dostransformer_tpu.serve_http import make_server

    if jax.process_count() > 1:
        # HTTP serving is request-driven: a request landing on one process
        # would enter the collective predict/fetch alone while its peers
        # idle in serve_forever — a distributed deadlock, not an error.
        # Pod-sharded MODEL hosting needs a request broadcaster in front;
        # refuse loudly rather than hang on the first request.
        p.error("multi-process HTTP serving is not supported: requests "
                "would deadlock the pod's collectives. Serve single-process "
                "(one server per host, a load balancer in front), or use "
                "mesh sharding within one process (--data_parallel on a "
                "single-host slice)")
    if args.torch_state_dict and (args.from_exported or args.checkpoint_dir
                                  or args.checkpoint_state):
        p.error("--torch_state_dict replaces the checkpoint source; give "
                "exactly one of --checkpoint_dir / --from_exported / "
                "--torch_state_dict (and no --checkpoint_state)")
    if args.from_exported:
        if args.data_parallel:
            p.error("--data_parallel serves from a checkpoint; exported "
                    "artifacts are single-device functions")
        if args.checkpoint_state:
            p.error("--checkpoint_state picks which checkpoint to load; an "
                    "exported artifact has its params baked in")
        predictor = ExportedPredictor(args.from_exported)
    else:
        source = args.checkpoint_dir or args.torch_state_dict
        if not (args.task and source and args.example):
            p.error("--task, --example and --checkpoint_dir (or "
                    "--torch_state_dict) are required unless "
                    "--from_exported is given")
        from dostransformer_tpu.data.io import load_samples

        mesh = None
        if args.data_parallel:
            from dostransformer_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(axes=("data",))
        example = load_samples(args.example)[0]
        if args.torch_state_dict:
            predictor = Predictor.from_torch(
                args.torch_state_dict, task=args.task, example=example,
                embedder=args.embedder, layers=args.layers,
                t_layers=args.transformer, hidden=args.hidden,
                batch_size=args.batch_size, mesh=mesh)
        else:
            predictor = Predictor.from_checkpoint(
                args.checkpoint_dir, task=args.task, example=example,
                embedder=args.embedder, layers=args.layers,
                t_layers=args.transformer, hidden=args.hidden,
                batch_size=args.batch_size, mesh=mesh,
                prefer=args.checkpoint_state or "best")
    return make_server(predictor, host=args.host, port=args.port,
                       coalesce_ms=args.coalesce_ms)


def main(argv=None):
    server = build_server(argv)
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port}  "
          f"(POST /predict, GET /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    finally:
        # drains the CoalescingBatcher (queued requests resolve before the
        # process exits) and closes the listening socket
        server.server_close()


if __name__ == "__main__":
    main()
