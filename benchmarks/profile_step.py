"""Profile the scan-compiled train epoch on the current backend and print an
aggregated per-op-category time breakdown.

Usage:  python benchmarks/profile_step.py [--hidden 256] [--batch 8] [--steps 60]

Parses the jax.profiler trace (protobuf-free: reads the trace-events JSON that
Perfetto emits inside the .gz) and groups device ops by name prefix. This is
the evidence base for the step-overhead burn-down (VERDICT round 1, item 3).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_epoch(hidden, batch, steps, dtype="float32", pad_bins=0,
              min_atoms=None, max_atoms=None, task="edos"):
    # task-default crystal sizes: eDOS headline 4-24, phDOS 2-12 (the
    # bench_configs phdos_* geometry: A=16, E=128)
    if min_atoms is None:
        min_atoms = 4 if task == "edos" else 2
    if max_atoms is None:
        max_atoms = 24 if task == "edos" else 12
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dostransformer_tpu.data import (
        synthetic_edos_samples,
        synthetic_phdos_samples,
    )
    from dostransformer_tpu.data.datasets import GraphLoader
    from dostransformer_tpu.models import (
        DOSTransformerEDOS,
        DOSTransformerPhDOS,
    )
    from dostransformer_tpu.train.device_dataset import DeviceDataset
    from dostransformer_tpu.train.trainer import Trainer

    on_tpu = jax.default_backend() == "tpu"
    if task == "phdos":
        # the production phDOS geometry: 51 bins, atoms 2-12 (A=16 bucket)
        samples = synthetic_phdos_samples(
            64, seed=0, min_atoms=min_atoms, max_atoms=max_atoms)
        model = DOSTransformerPhDOS(layers=3, t_layers=2, hidden=hidden,
                                    use_pallas=on_tpu, dtype=dtype,
                                    bins_pad=pad_bins or None)
        loader = GraphLoader(samples, batch_size=batch)
    else:
        samples = synthetic_edos_samples(64, seed=0, min_atoms=min_atoms,
                                         max_atoms=max_atoms)
        loader = GraphLoader(samples, batch_size=batch)
        model = DOSTransformerEDOS(layers=3, t_layers=2, hidden=hidden,
                                   use_pallas=on_tpu, dtype=dtype,
                                   bins_pad=pad_bins or None)
    trainer = Trainer(model)
    dds = DeviceDataset.from_samples(
        samples * (steps * batch // len(samples) + 1), batch,
        atoms_per_graph=loader.atoms_per_graph,
        edges_per_graph=loader.edges_per_graph)
    state = trainer.init_state(next(iter(loader)), seed=0)
    rng = jax.random.PRNGKey(0)
    for _ in range(2):
        state, losses, rng = trainer.train_epoch_device(state, dds, rng)
        np.asarray(losses)
    return trainer, state, dds, rng, losses


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--top", type=int, default=28)
    p.add_argument("--pad_bins", type=int, default=0)
    p.add_argument("--min_atoms", type=int, default=None)
    p.add_argument("--max_atoms", type=int, default=None,
                   help="64-230 reproduces BASELINE.md's large-crystal row "
                        "(SURVEY §3.3 envelope); default 4-24 eDOS, 2-12 phDOS")
    p.add_argument("--task", choices=["edos", "phdos"], default="edos")
    args = p.parse_args()

    import jax
    import numpy as np

    trainer, state, dds, rng, _ = run_epoch(args.hidden, args.batch,
                                            args.steps, args.dtype,
                                            args.pad_bins, args.min_atoms,
                                            args.max_atoms, args.task)
    tmp = tempfile.mkdtemp(prefix="dostpu_prof_")
    jax.profiler.start_trace(tmp)
    t0 = time.perf_counter()
    state, losses, rng = trainer.train_epoch_device(state, dds, rng)
    np.asarray(losses)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    n_steps = dds.steps_per_epoch
    print(f"epoch wall {wall*1e3:.2f} ms over {n_steps} steps "
          f"-> {wall/n_steps*1e6:.1f} us/step "
          f"({n_steps*args.batch/wall:.0f} samples/s)")

    traces = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print("no trace found under", tmp)
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-lane complete events only
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name.upper() or "/device" in name.lower()}
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0)  # us
        if not dur:
            continue
        key = name.split(".")[0].split("(")[0]
        agg[key] = agg.get(key, 0.0) + dur
        total += dur
    print(f"\ndevice-op total {total/1e3:.2f} ms; top {args.top} by time:")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {v/n_steps:9.1f} us/step  {v/total*100:5.1f}%  {k}")

    # full-name leaves for the hot buckets
    full = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name, dur = e.get("name", ""), e.get("dur", 0)
        if dur:
            full[name] = full.get(name, 0.0) + dur
    print(f"\ntop {args.top} individual ops:")
    for k, v in sorted(full.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {v/n_steps:9.1f} us/step  {k[:110]}")

    # lane-aware occupancy: ops on different device lanes (compute vs DMA)
    # OVERLAP — summed durations overcount. Report per-lane busy time inside
    # the while-loop span; the busiest (compute) lane's idle fraction is the
    # true scheduling-bubble number.
    tid_names = {(e.get("pid"), e.get("tid")): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name"}
    span_lo, span_hi = None, None
    lanes = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0)
        if not dur:
            continue
        ts = e.get("ts", 0)
        if e.get("name", "").startswith("while"):
            span_lo = ts if span_lo is None else min(span_lo, ts)
            span_hi = max(span_hi or 0, ts + dur)
            continue  # the while envelope is not a lane occupant
        key = (e.get("pid"), e.get("tid"))
        lanes.setdefault(key, []).append((ts, ts + dur))
    if span_lo is not None:
        span = span_hi - span_lo
        print(f"\nlane occupancy over the while span ({span/1e3:.2f} ms):")
        for key, ivals in sorted(lanes.items(),
                                 key=lambda kv: -sum(b - a for a, b in kv[1])):
            ivals = sorted((max(a, span_lo), min(b, span_hi))
                           for a, b in ivals)
            busy, cur_a, cur_b = 0.0, None, None
            for a, b in ivals:
                if b <= a:
                    continue
                if cur_b is None or a > cur_b:
                    if cur_b is not None:
                        busy += cur_b - cur_a
                    cur_a, cur_b = a, b
                else:
                    cur_b = max(cur_b, b)
            if cur_b is not None:
                busy += cur_b - cur_a
            if busy / span < 0.02:
                continue
            nm = tid_names.get(key, str(key))
            print(f"  {busy/span*100:5.1f}% busy "
                  f"({(span-busy)/n_steps:6.1f} us/step idle)  {nm}")


if __name__ == "__main__":
    main()
