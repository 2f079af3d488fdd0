"""phDOS batched-training convergence check (VERDICT r3 next-round #7).

The reference trains phDOS at a hard batch size of 1
(/root/reference/main_phDOS.py:52); our fixed-shape GraphBatch design makes
batching free mechanically (BASELINE.md: 6.5x throughput at B=64), but a
larger batch changes OPTIMIZER dynamics (fewer, lower-variance steps per
epoch). This script validates the headline lever scientifically: train the
flagship phDOS model at B=1 and B=64 on the same structure-conditioned
synthetic corpus for the same epoch count (same lr — the reference's 1e-4,
plus a linearly-scaled lr row for B=64, the standard large-batch guidance)
and report held-out RMSE for each.

    python benchmarks/convergence_phdos_batch.py --epochs 80 --samples 256

Emits one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_task(n_samples: int, seed: int = 4):
    """Synthetic phDOS crystals whose 51-bin targets are a deterministic
    function of composition (mass spectrum) — learnable structure, so
    convergence differences are attributable to the optimizer dynamics.
    Now a thin alias of data.synthetic.synthetic_phdos_learnable (same math,
    same corpus at a given seed) so the CLI --synthetic_learnable path and
    this benchmark are pinned to one implementation."""
    from dostransformer_tpu.data.synthetic import synthetic_phdos_learnable

    return synthetic_phdos_learnable(n_samples, seed=seed)


def run(train, valid, batch_size: int, epochs: int, lr: float,
        seed: int = 0, dtype: str = "float32"):
    import jax
    import jax.numpy as jnp

    from dostransformer_tpu.data.datasets import GraphLoader
    from dostransformer_tpu.models import DOSTransformerPhDOS
    from dostransformer_tpu.train.device_dataset import DeviceDataset
    from dostransformer_tpu.train.metrics import MetricAccumulator
    from dostransformer_tpu.train.trainer import Trainer, make_adamw

    loader = GraphLoader(train, batch_size=batch_size)
    dds = DeviceDataset.from_samples(
        train, batch_size, atoms_per_graph=loader.atoms_per_graph,
        edges_per_graph=loader.edges_per_graph)
    vloader = GraphLoader(valid, batch_size=max(batch_size, 8),
                          atoms_per_graph=loader.atoms_per_graph,
                          edges_per_graph=loader.edges_per_graph)

    model = DOSTransformerPhDOS(layers=3, t_layers=2, hidden=256,
                                dtype=dtype)
    trainer = Trainer(model, tx=make_adamw(lr))
    state = trainer.init_state(next(iter(loader)), seed=seed)
    base = jax.random.PRNGKey(seed)

    t0 = time.perf_counter()
    interval = max(epochs // 4, 1)
    for start in range(0, epochs, interval):
        chunk = min(interval, epochs - start)
        keys = jnp.stack([jax.random.fold_in(base, e)
                          for e in range(start, start + chunk)])
        state, losses = trainer.train_epochs_device(state, dds, keys)
        np.asarray(losses)  # tunnel-safe completion barrier
    acc = MetricAccumulator()
    for b in vloader:
        acc.update(trainer.eval_step(state.params, b))
    r = acc.result()
    return {
        "batch_size": batch_size, "lr": lr, "epochs": epochs, "dtype": dtype,
        "steps_total": epochs * dds.steps_per_epoch,
        "train_loss_final": float(np.asarray(losses)[-1].mean()),
        "heldout_rmse": float(r["rmse"]), "heldout_r2": float(r["r2"]),
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser("convergence_phdos_batch")
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--only", default=None,
                   choices=["b1", "b64", "b64_lrscaled", "b64_lrscaled_bf16"])
    args = p.parse_args(argv)

    from dostransformer_tpu.data.datasets import train_test_split

    samples = make_task(args.samples)
    train, valid = train_test_split(samples, 0.2, random_state=0)

    ys = np.stack([s.y for s in train])
    baseline = float(np.sqrt(
        ((ys - ys.mean(0, keepdims=True)) ** 2).mean(1)).mean())

    configs = {
        "b1": dict(batch_size=1, lr=1e-4),        # the reference cadence
        "b64": dict(batch_size=64, lr=1e-4),      # same lr, 64x fewer steps
        "b64_lrscaled": dict(batch_size=64, lr=1e-4 * 16),  # sqrt-ish scale
        # the recommended production combo: batched phDOS + bf16 compute
        "b64_lrscaled_bf16": dict(batch_size=64, lr=1e-4 * 16,
                                  dtype="bfloat16"),
    }
    names = [args.only] if args.only else list(configs)
    for name in names:
        rec = run(train, valid, epochs=args.epochs, **configs[name])
        rec["config"] = name
        rec["mean_predictor_rmse"] = baseline
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
