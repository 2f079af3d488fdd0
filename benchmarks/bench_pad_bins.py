"""A/B throughput of the lane-aligned energy-token pipeline (bins_pad) and
the opt-in Pallas kernels at the aligned shapes.

VERDICT r2 #1: every recent micro-perf negative traced to pad/un-pad copies
at the Lq=201 / Lk in {32, 201} boundaries; bins_pad=256 makes those shapes
tile-aligned so the copies vanish — at the cost of 27% pad rows through the
per-token matmuls. This script measures the headline train config with
pad_bins off/on and with DOSTPU_ATTN_PALLAS_BWD / DOSTPU_FUSE_LN_ATTN
re-enabled at the aligned shapes, one variant per process (the env toggles
are read at trace time).

    python benchmarks/bench_pad_bins.py                # run all variants
    python benchmarks/bench_pad_bins.py --one 256 0 0  # single measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 8
HIDDEN = 256
LAYERS = 3
T_LAYERS = 2
N_SAMPLES = 64
STEPS = 512
EPOCHS_PER_DISPATCH = 5
WARMUP = 2
REPS = 5


def measure(pad_bins: int) -> float:
    import numpy as np
    import jax
    import jax.numpy as jnp
    import jax.random as jrandom

    from dostransformer_tpu.data import synthetic_edos_samples
    from dostransformer_tpu.data.datasets import GraphLoader
    from dostransformer_tpu.models import DOSTransformerEDOS
    from dostransformer_tpu.train.device_dataset import DeviceDataset
    from dostransformer_tpu.train.trainer import Trainer

    samples = synthetic_edos_samples(N_SAMPLES, seed=0, min_atoms=4,
                                     max_atoms=24)
    loader = GraphLoader(samples, batch_size=BATCH, shuffle=True, seed=0)
    on_tpu = jax.default_backend() == "tpu"
    model = DOSTransformerEDOS(layers=LAYERS, t_layers=T_LAYERS,
                               hidden=HIDDEN, use_pallas=on_tpu,
                               bins_pad=pad_bins or None)
    trainer = Trainer(model)
    state = trainer.init_state(next(iter(loader)), seed=0)
    dds = DeviceDataset.from_samples(
        samples * (STEPS * BATCH // len(samples) + 1), BATCH,
        atoms_per_graph=loader.atoms_per_graph,
        edges_per_graph=loader.edges_per_graph)

    base = jrandom.PRNGKey(0)

    def keys_at(first):
        return jnp.stack([jrandom.fold_in(base, e) for e in
                          range(first, first + EPOCHS_PER_DISPATCH)])

    e = 0
    for _ in range(WARMUP):
        state, losses = trainer.train_epochs_device(state, dds, keys_at(e))
        e += EPOCHS_PER_DISPATCH
        np.asarray(losses)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        state, losses = trainer.train_epochs_device(state, dds, keys_at(e))
        e += EPOCHS_PER_DISPATCH
        np.asarray(losses)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    return EPOCHS_PER_DISPATCH * dds.steps_per_epoch * BATCH / dt


VARIANTS = [
    # (pad_bins, attn_pallas_bwd, fuse_ln_attn)
    (0, 0, 0),
    (256, 0, 0),
    (256, 1, 0),
    (256, 0, 1),
    (256, 1, 1),
]


def main():
    if len(sys.argv) >= 5 and sys.argv[1] == "--one":
        pad = int(sys.argv[2])
        sps = measure(pad)
        print(json.dumps({"pad_bins": pad,
                          "attn_pallas_bwd": int(sys.argv[3]),
                          "fuse_ln_attn": int(sys.argv[4]),
                          "samples_per_sec": round(sps, 1),
                          "ms_per_step": round(1000.0 * BATCH / sps, 4)}))
        return
    results = []
    for pad, bwd, ln in VARIANTS:
        env = dict(os.environ)
        env["DOSTPU_ATTN_PALLAS_BWD"] = str(bwd)
        env["DOSTPU_FUSE_LN_ATTN"] = str(ln)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(pad),
             str(bwd), str(ln)],
            env=env, capture_output=True, text=True, cwd=REPO)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            rec = {"pad_bins": pad, "attn_pallas_bwd": bwd, "fuse_ln_attn": ln,
                   "error": (out.stderr or out.stdout)[-500:]}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
