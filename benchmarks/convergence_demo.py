"""Reproducible convergence demonstration (no external datasets needed).

Trains the flagship eDOS model at the reference's hyperparameters (lr 1e-4,
AdamW wd 1e-2, batch 8) on structure-conditioned synthetic crystals whose DOS
targets are a deterministic function of composition and crystal system, and
reports held-out RMSE against the best-constant (mean-predictor) baseline.

Round-1 result on a single v5e chip (2026-08-16): train loss 0.86 -> 0.043
over 400 epochs (~30 s steady-state via the device-resident pipeline),
held-out RMSE 0.195 vs 0.257 baseline, r^2 > 0.

    python benchmarks/convergence_demo.py --epochs 400 --samples 256
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from dostransformer_tpu.data.datasets import GraphLoader, edos_random_split
from dostransformer_tpu.data.synthetic import synthetic_edos_samples
from dostransformer_tpu.models import DOSTransformerEDOS
from dostransformer_tpu.train.device_dataset import DeviceDataset
from dostransformer_tpu.train.metrics import MetricAccumulator
from dostransformer_tpu.train.trainer import Trainer, make_adamw


def make_task(n_samples: int, seed: int = 4):
    """Synthetic crystals with targets = f(composition, crystal system)."""
    samples = synthetic_edos_samples(n_samples, seed=seed)
    grid = np.linspace(0, 1, 201)
    rng = np.random.RandomState(seed + 1)
    w = rng.randn(200, 6) * 0.5
    for s in samples:
        c = (s.system + 1) / 9.0
        width = 0.008 + 0.004 * (s.system % 3)
        feats = np.tanh(s.x[:-1].mean(0) @ w)
        bump = np.exp(-((grid - c) ** 2) / width)
        mix = np.exp(-((grid[:, None] - np.linspace(0, 1, 6)[None]) ** 2)
                     / 0.03) @ (feats + 1.0)
        y = (bump + 0.5 * np.abs(mix)).astype(np.float32)
        s.y = y / y.max()
    return samples


def main(argv=None):
    p = argparse.ArgumentParser("convergence_demo")
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--data_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="DeviceDataset FEATURE storage dtype (bf16 halves "
                        "upload + per-step gather traffic; targets stay f32)")
    args = p.parse_args(argv)

    samples = make_task(args.samples)
    train, valid, _ = edos_random_split(samples, 0)
    ys = np.stack([s.y for s in train])
    baseline = float(np.sqrt(
        ((ys - ys.mean(0, keepdims=True)) ** 2).mean(1)).mean())

    loader = GraphLoader(train, batch_size=args.batch_size)
    import jax.numpy as _jnp

    dds = DeviceDataset.from_samples(
        train, args.batch_size, atoms_per_graph=loader.atoms_per_graph,
        edges_per_graph=loader.edges_per_graph,
        storage_dtype=(_jnp.bfloat16 if args.data_dtype == "bfloat16"
                       else None))
    vloader = GraphLoader(valid, batch_size=args.batch_size,
                          atoms_per_graph=loader.atoms_per_graph,
                          edges_per_graph=loader.edges_per_graph)

    model = DOSTransformerEDOS(layers=3, t_layers=2, hidden=args.hidden,
                               dtype=args.dtype)
    trainer = Trainer(model, tx=make_adamw(1e-4))
    state = trainer.init_state(next(iter(loader)), seed=0)
    base = jax.random.PRNGKey(0)

    # production cadence: one multi-epoch dispatch per eval interval (the
    # tunnel's fixed per-dispatch RTT would otherwise dominate a 400-epoch
    # demo); data order identical to per-epoch dispatches by construction
    import jax.numpy as jnp

    interval = max(args.epochs // 4, 1)
    t0 = time.perf_counter()
    for start in range(0, args.epochs, interval):
        chunk = min(interval, args.epochs - start)
        keys = jnp.stack([jax.random.fold_in(base, e)
                          for e in range(start, start + chunk)])
        state, losses = trainer.train_epochs_device(state, dds, keys)
        acc = MetricAccumulator()
        for b in vloader:
            acc.update(trainer.eval_step(state.params, b))
        r = acc.result()
        print(f"epoch {start + chunk}: train loss "
              f"{float(np.asarray(losses)[-1].mean()):.4f} | held-out rmse "
              f"{r['rmse']:.4f} r2 {r['r2']:.4f} | mean-predictor "
              f"baseline {baseline:.4f} | {time.perf_counter() - t0:.0f}s",
              flush=True)
    return {"rmse": r["rmse"], "r2": r["r2"], "baseline": baseline,
            "train_loss": float(np.asarray(losses)[-1].mean())}


if __name__ == "__main__":
    main()
