"""Wall-clock time-to-accuracy through the PRODUCTION CLI (VERDICT r4 #1).

Every earlier convergence row (convergence_demo.py, convergence_phdos_batch
.py) drove a bespoke benchmark loop; this harness wall-clocks the path users
actually run — ``python -m dostransformer_tpu.cli.main_phdos`` /
``main_edos`` with the JSONL writer, checkpointing, eval cadence and
early-stop machinery all ON — to a fixed held-out RMSE, in two recipes on
the SAME learnable synthetic corpus (--synthetic_learnable):

  ref:  the reference training cadence — f32, the reference's batch size
        (phDOS 1, eDOS 8; utils.py:25-43 defaults), lr 1e-4;
  prod: the recommended production recipe — bfloat16 compute, B=64,
        linearly scaled lr, --bucketed, --data_parallel (the shard_map
        path, pod-identical), epoch budget scaled to match the reference's
        wall clock (BASELINE.md round-4 phDOS convergence table).

Reports, per recipe: wall seconds from process start (incl. the first
compile) and from the first training dispatch (steady state) to the first
eval whose VALID rmse <= target, plus the final metrics.

Usage:
    python benchmarks/time_to_accuracy.py --task phdos
    python benchmarks/time_to_accuracy.py --task edos --target 0.2
    python benchmarks/time_to_accuracy.py --task phdos --only prod --json o.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


RECIPES = {
    # (task, recipe) -> extra CLI flags. Epochs are scaled so the two
    # recipes get comparable wall-clock budgets at the measured per-step
    # throughputs (BASELINE.md); lr scales linearly with the batch ratio.
    ("phdos", "ref"): ["--batch_size", "1", "--lr", "1e-4",
                       "--dtype", "float32", "--epochs", "80", "--eval", "5"],
    ("phdos", "prod"): ["--batch_size", "64", "--lr", "1.6e-3",
                        "--dtype", "bfloat16", "--bucketed",
                        "--data_parallel", "--epochs", "320",
                        "--eval", "20"],
    ("edos", "ref"): ["--batch_size", "8", "--lr", "1e-4",
                      "--dtype", "float32", "--epochs", "400", "--eval", "5"],
    ("edos", "prod"): ["--batch_size", "64", "--lr", "8e-4",
                       "--dtype", "bfloat16", "--bucketed",
                       "--data_parallel", "--epochs", "1600",
                       "--eval", "40"],
}


def run_recipe(task: str, recipe: str, samples: int, target: float,
               workdir: str, overrides: dict | None = None,
               timeout_s: int = 3600) -> dict:
    """One CLI training run; returns the parsed time-to-accuracy record."""
    outdir = os.path.join(workdir, f"{task}_{recipe}")
    os.makedirs(outdir, exist_ok=True)
    log = os.path.join(outdir, "log.jsonl")
    flags = list(RECIPES[(task, recipe)])
    if overrides:
        for k, v in overrides.items():
            if k in flags:
                flags[flags.index(k) + 1] = str(v)
            else:
                flags += [k, str(v)]
    cmd = [sys.executable, "-m", f"dostransformer_tpu.cli.main_{task}",
           "--synthetic", str(samples), "--synthetic_learnable",
           "--results_dir", outdir, "--log_jsonl", log,
           "--checkpoint_dir", os.path.join(outdir, "ckpt"),
           "--checkpoint_every", "1000000",  # boundary saves only: the ckpt
           # SUBSYSTEM is on (manager, SIGTERM hook, final save) without
           # periodic save wall time distorting the cadence comparison
           "--es", "1000000",  # plateau stop off: run the full epoch budget
           *flags]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout_s)
    wall = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"{task}/{recipe} failed:\n{proc.stderr[-2000:]}")
    records = [json.loads(line) for line in open(log)]
    first = records[0]["time"] if records else t0
    hit = next((r for r in records
                if "valid" in r and r["valid"]["rmse"] <= target), None)
    final = next((r["final"] for r in reversed(records) if "final" in r), {})
    best_valid = min((r["valid"]["rmse"] for r in records if "valid" in r),
                     default=float("nan"))
    return {
        "task": task, "recipe": recipe, "target_valid_rmse": target,
        "reached": hit is not None,
        "wall_total_s": round((hit["time"] - t0), 1) if hit else None,
        "wall_steady_s": round((hit["time"] - first), 1) if hit else None,
        "epochs_to_target": hit["epoch"] if hit else None,
        "best_valid_rmse": round(best_valid, 4),
        "run_wall_s": round(wall, 1),
        "final": {k: round(v, 4) for k, v in
                  (final.get("test") or {}).items()},
        "flags": flags,
    }


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--task", choices=["phdos", "edos"], default="phdos")
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--target", type=float, default=None,
                   help="valid-RMSE target (default: per-task constant)")
    p.add_argument("--only", choices=["ref", "prod"], default=None)
    p.add_argument("--json", type=str, default=None)
    p.add_argument("--epochs_ref", type=int, default=None)
    p.add_argument("--epochs_prod", type=int, default=None)
    p.add_argument("--lr_prod", type=str, default=None,
                   help="override the prod recipe's lr (the linear-scaled "
                        "default can overshoot at large batch ratios)")
    p.add_argument("--extra_prod", nargs="*", default=None,
                   help="extra CLI flag/value pairs for the prod recipe, "
                        "flag names WITHOUT the leading dashes (argparse "
                        "would otherwise claim them), e.g. "
                        "--extra_prod warmup_epochs 40")
    p.add_argument("--timeout", type=int, default=3600)
    args = p.parse_args(argv)

    target = args.target
    if target is None:
        target = {"phdos": 0.20, "edos": 0.21}[args.task]

    results = []
    with tempfile.TemporaryDirectory() as workdir:
        for recipe in (["ref", "prod"] if args.only is None else [args.only]):
            overrides = {}
            ep = args.epochs_ref if recipe == "ref" else args.epochs_prod
            if ep is not None:
                overrides["--epochs"] = ep
            if recipe == "prod":
                if args.lr_prod is not None:
                    overrides["--lr"] = args.lr_prod
                if args.extra_prod:
                    it = iter(args.extra_prod)
                    for flag in it:
                        overrides["--" + flag.lstrip("-")] = next(it)
            r = run_recipe(args.task, recipe, args.samples, target, workdir,
                           overrides, timeout_s=args.timeout)
            results.append(r)
            print(json.dumps(r))

    if len(results) == 2 and all(r["wall_total_s"] for r in results):
        ratio = results[0]["wall_total_s"] / results[1]["wall_total_s"]
        steady = (results[0]["wall_steady_s"] / results[1]["wall_steady_s"]
                  if all(r["wall_steady_s"] for r in results) else None)
        summary = {"task": args.task, "target": target,
                   "speedup_total": round(ratio, 2),
                   "speedup_steady": round(steady, 2) if steady else None}
        print(json.dumps(summary))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
