"""Dump the optimized HLO of the scan-compiled device epoch and summarize the
ops whose profile categories need attribution (copies, multiply_reduce, ...).

Usage: python benchmarks/dump_hlo.py [--grep multiply_reduce] [--out /tmp/epoch.hlo]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--out", default="/tmp/epoch.hlo")
    args = p.parse_args()

    import jax

    from dostransformer_tpu.data import synthetic_edos_samples
    from dostransformer_tpu.data.datasets import GraphLoader
    from dostransformer_tpu.models import DOSTransformerEDOS
    from dostransformer_tpu.train.device_dataset import DeviceDataset
    from dostransformer_tpu.train.trainer import Trainer

    samples = synthetic_edos_samples(64, seed=0, min_atoms=4, max_atoms=24)
    loader = GraphLoader(samples, batch_size=args.batch)
    on_tpu = jax.default_backend() == "tpu"
    model = DOSTransformerEDOS(layers=3, t_layers=2, hidden=args.hidden,
                               use_pallas=on_tpu)
    trainer = Trainer(model)
    dds = DeviceDataset.from_samples(
        samples * (args.steps * args.batch // len(samples) + 1), args.batch,
        atoms_per_graph=loader.atoms_per_graph,
        edges_per_graph=loader.edges_per_graph)
    state = trainer.init_state(next(iter(loader)), seed=0)
    rng = jax.random.PRNGKey(0)

    key = (dds.steps_per_epoch, dds.batch_size)
    fn = trainer._make_epoch_device(*key)
    lowered = fn.lower(state, dds.data, rng)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB HLO to {args.out}")

    # summarize: copies and multiply_reduce fusions with their metadata lines
    for pat in ("copy", "multiply_reduce_fusion", "multiply_add_fusion"):
        hits = []
        for line in txt.splitlines():
            ls = line.strip()
            if re.match(rf"%?{pat}[.\d]*\s*=", ls):
                hits.append(ls[:220])
        print(f"\n=== {pat}: {len(hits)} ops ===")
        for h in hits[:40]:
            print(" ", h)


if __name__ == "__main__":
    main()
