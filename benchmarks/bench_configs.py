"""Throughput + MFU across realistic shape configs (VERDICT r2 #2).

The headline bench (bench.py) pins small synthetic crystals (4-24 atoms,
the reference-parity config). Real eDOS crystals run A_max ~30-230 with
E ~ 12N (SURVEY.md §3.3), and production serving/training wants batches of
64-128. This script measures the train-step throughput and analytic-FLOPs
MFU at a grid of configs, plus bf16 dataset storage on the production rows.

    python benchmarks/bench_configs.py                 # all configs
    python benchmarks/bench_configs.py --only large    # one config

One config per PROCESS (fresh jit caches; the tunnel backend is long-lived).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HIDDEN, LAYERS, T_LAYERS = 256, 3, 2
PEAK_FLOPS_BY_KIND = {
    "TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v5": 459e12,
    "TPU v5p": 459e12, "TPU v4": 275e12, "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}
FLOPS_CACHE = os.path.join(REPO, "BENCH_FLOPS.json")

CONFIGS = {
    # target_steps: steps per timed dispatch — the tunnel backend adds a
    # fixed ~30-55 ms host round trip PER DISPATCH, so small-step configs
    # need thousands of steps per dispatch to measure device throughput
    # rather than tunnel latency (bench.py uses 5x512); large-crystal steps
    # are 10-40x slower, so far fewer steps already amortize it
    "headline":       dict(batch=8,   lo=4,  hi=24,  n=64,  epochs=5,
                           target_steps=2560),
    "large":          dict(batch=8,   lo=64, hi=230, n=64,  epochs=2,
                           target_steps=256),
    "b64":            dict(batch=64,  lo=4,  hi=24,  n=512, epochs=5,
                           target_steps=1280),
    "b128":           dict(batch=128, lo=4,  hi=24,  n=512, epochs=5,
                           target_steps=640),
    "b64_large":      dict(batch=64,  lo=64, hi=230, n=128, epochs=1,
                           target_steps=48),
    "b64_bf16data":   dict(batch=64,  lo=4,  hi=24,  n=512, epochs=5,
                           target_steps=1280, bf16_data=True),
    "headline_bf16data": dict(batch=8, lo=4, hi=24,  n=64,  epochs=5,
                              target_steps=2560, bf16_data=True),
    # pad_bins at production batch: the B=64 profile shows the 201-column
    # relayout copies explode superlinearly with batch (copy-done 45 ->
    # 1885 us/step, slice-done 40 -> 1027) while the per-token matmul cost
    # of padding stays at 27% — the tradeoff that loses at B=8 may win here
    "b64_pad256":     dict(batch=64,  lo=4,  hi=24,  n=512, epochs=5,
                           target_steps=1280, pad_bins=256),
    "b128_pad256":    dict(batch=128, lo=4,  hi=24,  n=512, epochs=5,
                           target_steps=640, pad_bins=256),
    "large_pad256":   dict(batch=8,   lo=64, hi=230, n=64,  epochs=2,
                           target_steps=256, pad_bins=256),
    # bf16 COMPUTE at production batch: the relayout copies that dominate
    # B>=64 move activation bytes — bf16 halves them (convergence already
    # validated end-to-end, BASELINE.md round 2)
    "b64_bf16":       dict(batch=64,  lo=4,  hi=24,  n=512, epochs=5,
                           target_steps=1280, dtype="bfloat16"),
    "b128_bf16":      dict(batch=128, lo=4,  hi=24,  n=512, epochs=5,
                           target_steps=640, dtype="bfloat16"),
    "headline_bf16":  dict(batch=8,   lo=4,  hi=24,  n=64,  epochs=5,
                           target_steps=2560, dtype="bfloat16"),
    "large_bf16":     dict(batch=8,   lo=64, hi=230, n=64,  epochs=2,
                           target_steps=256, dtype="bfloat16"),
    # the fused-MP kernel's one-hot gather/scatter matmuls scale with A_pad
    # (TE x A one-hots): at A=256 they may lose to XLA's native gathers
    "large_nofusedmp": dict(batch=8,  lo=64, hi=230, n=64,  epochs=2,
                            target_steps=256, fused_mp=False),
    "b64_large_nofusedmp": dict(batch=64, lo=64, hi=230, n=128, epochs=1,
                                target_steps=48, fused_mp=False),
    # STAGED no-pad kernels (ops/attention.py _use_nopad): raw logical
    # shapes, Mosaic-internal alignment — targets the B>=64 pad/un-pad copy
    # floor (BASELINE.md). PALLAS_BWD forced on so fwd+bwd both run no-pad.
    "headline_nopad": dict(batch=8,   lo=4,  hi=24,  n=64,  epochs=5,
                           target_steps=2560,
                           env={"DOSTPU_ATTN_NOPAD": "1",
                                "DOSTPU_ATTN_PALLAS_BWD": "1"}),
    "b64_nopad":      dict(batch=64,  lo=4,  hi=24,  n=512, epochs=5,
                           target_steps=1280,
                           env={"DOSTPU_ATTN_NOPAD": "1"}),
    "b128_nopad":     dict(batch=128, lo=4,  hi=24,  n=512, epochs=5,
                           target_steps=640,
                           env={"DOSTPU_ATTN_NOPAD": "1"}),
    "b64_large_nopad": dict(batch=64, lo=64, hi=230, n=128, epochs=1,
                            target_steps=48,
                            env={"DOSTPU_ATTN_NOPAD": "1"}),
    # nopad FORWARD only at small batch (bwd dispatch stays XLA at B=8):
    # separates the fwd kernel's pad/unpad savings from the bwd tradeoff
    "headline_nopad_fwdonly": dict(batch=8, lo=4, hi=24, n=64, epochs=5,
                                   target_steps=2560,
                                   env={"DOSTPU_ATTN_NOPAD": "1"}),
    # bucketed training on a MIXED-size corpus (half 4-24 atoms, half
    # 64-230): flat pads every batch to the global A=256/E=2816 envelope,
    # bucketed runs each group at its own bucket (--bucketed; one dispatch
    # per bucket per epoch — through the tunnel each dispatch adds ~30-55 ms
    # RTT, so the bucketed numbers here are a LOWER bound on the
    # direct-attached win)
    "mixed_flat":     dict(batch=8,  mixed=True, n=256, epochs=2,
                           target_steps=128),
    "mixed_bucketed": dict(batch=8,  mixed=True, n=256, epochs=2,
                           target_steps=128, bucketed=True),
    "b64_mixed_flat": dict(batch=64, mixed=True, n=512, epochs=1,
                           target_steps=24),
    "b64_mixed_bucketed": dict(batch=64, mixed=True, n=512, epochs=1,
                               target_steps=24, bucketed=True),
    # phDOS flagship (51 bins, SH edge geometry, scatter_mean MP): the
    # reference trains it at batch_size=1 (/root/reference/main_phDOS.py:52)
    # — the b1 row is that cadence on-device; b8/b64 are the batching
    # headroom the fixed-shape GraphBatch design buys over the reference's
    # hard batch-1 loop
    # scaled hidden (single-chip; the width TP is built for): exercises
    # the fused-MP VMEM byte-budget tiling and the FFN-dominant regime
    "h512":      dict(batch=8,  lo=4, hi=24, n=64, epochs=2,
                      target_steps=512, hidden=512),
    "h1024":     dict(batch=8,  lo=4, hi=24, n=64, epochs=1,
                      target_steps=128, hidden=1024),
    "b64_h512":  dict(batch=64, lo=4, hi=24, n=512, epochs=1,
                      target_steps=128, hidden=512),
    # remat vs the B>=64 residual-relayout copy floor: the HLO at B=64 shows
    # ~8 relayout copies of f32[2B,201,256] residuals feeding the FFN
    # backward; remat recomputes layers instead of storing those residuals,
    # trading HBM copy traffic for MXU recompute (MFU still counts
    # useful-FLOPs only, so a win shows up as higher samples/s AND mfu)
    "b64_remat":  dict(batch=64,  lo=4, hi=24, n=512, epochs=1,
                       target_steps=128, remat=True),
    "b128_remat": dict(batch=128, lo=4, hi=24, n=512, epochs=1,
                       target_steps=64, remat=True),
    # XLA flag sweep vs the f32 B=64 copy floor (DOSTPU_COMPILER_OPTIONS
    # rides Trainer's jits as per-compile DebugOptions overrides — the only
    # client-side route to libtpu's xla_tpu_* flags; trainer.py
    # compiler_options_from_env). Candidates chosen for the profiled
    # bottleneck: relayout copies + while-loop scheduling.
    # no-flag CONTROL at the sweep's exact dispatch shape (epochs=1 /
    # 128-step dispatches measure slightly below the 5-epoch b64 row —
    # compare the flag rows against THIS, not against b64)
    "b64_ctrl128": dict(batch=64, lo=4, hi=24, n=512, epochs=1,
                        target_steps=128),
    "b64_vmem64m": dict(batch=64, lo=4, hi=24, n=512, epochs=1,
                        target_steps=128,
                        env={"DOSTPU_COMPILER_OPTIONS":
                             "xla_tpu_scoped_vmem_limit_kib=65536"}),
    "b64_mblo":    dict(batch=64, lo=4, hi=24, n=512, epochs=1,
                        target_steps=128,
                        env={"DOSTPU_COMPILER_OPTIONS":
                             "xla_tpu_memory_bound_loop_optimizer_options="
                             "enabled:true"}),
    "b64_copyfusion": dict(batch=64, lo=4, hi=24, n=512, epochs=1,
                           target_steps=128,
                           env={"DOSTPU_COMPILER_OPTIONS":
                                "xla_tpu_enable_copy_fusion=true"}),
    "b64_lhs_off": dict(batch=64, lo=4, hi=24, n=512, epochs=1,
                        target_steps=128,
                        env={"DOSTPU_COMPILER_OPTIONS":
                             "xla_tpu_enable_latency_hiding_scheduler=false"}),
    # bf16 compute on the OTHER round-4 levers: the phDOS batching headroom
    # and the bucketed mixed corpus (bf16 cleared the eDOS B>=64 copy floor
    # — these check the win composes with the other throughput levers)
    "phdos_b64_bf16": dict(family="phdos", batch=64, lo=2, hi=12, n=512,
                           epochs=5, target_steps=1280, dtype="bfloat16"),
    "phdos_b256_bf16": dict(family="phdos", batch=256, lo=2, hi=12, n=1024,
                            epochs=5, target_steps=640, dtype="bfloat16"),
    # does the memory-bound-loop optimizer compose with bf16's 43% at B=64?
    "b64_bf16_mblo": dict(batch=64, lo=4, hi=24, n=512, epochs=1,
                          target_steps=128, dtype="bfloat16",
                          env={"DOSTPU_COMPILER_OPTIONS":
                               "xla_tpu_memory_bound_loop_optimizer_options="
                               "enabled:true"}),
    # bf16 control at the 128-step dispatch shape (pairs with b64_bf16_mblo
    # the way b64_ctrl128 pairs with the f32 flag rows)
    "b64_bf16_ctrl128": dict(batch=64, lo=4, hi=24, n=512, epochs=1,
                             target_steps=128, dtype="bfloat16"),
    "b64_mixed_flat_bf16": dict(batch=64, mixed=True, n=512, epochs=1,
                                target_steps=24, dtype="bfloat16"),
    "b64_mixed_bucketed_bf16": dict(batch=64, mixed=True, n=512, epochs=1,
                                    target_steps=24, bucketed=True,
                                    dtype="bfloat16"),
    # VERDICT r4 weak #2 / next #3: the eDOS refutations re-measured AT
    # phDOS production shapes (51 bins, A=16, B=64, bf16) where the lane
    # economics differ — 51 of 128 lanes used on the bin axis, 16-key
    # attention. Levers: bin-axis padding to the 64 sublane multiple and the
    # full 128 lane, the no-pad / Pallas-bwd dispatch gates (tuned on eDOS
    # shapes), and the fused-MP kernel (tile economics at A=16).
    "phdos_b64_bf16_pad64": dict(family="phdos", batch=64, lo=2, hi=12,
                                 n=512, epochs=5, target_steps=1280,
                                 dtype="bfloat16", pad_bins=64),
    "phdos_b64_bf16_pad128": dict(family="phdos", batch=64, lo=2, hi=12,
                                  n=512, epochs=5, target_steps=1280,
                                  dtype="bfloat16", pad_bins=128),
    "phdos_b64_bf16_nopad_off": dict(family="phdos", batch=64, lo=2, hi=12,
                                     n=512, epochs=5, target_steps=1280,
                                     dtype="bfloat16",
                                     env={"DOSTPU_ATTN_NOPAD": "0"}),
    "phdos_b64_bf16_xla_bwd": dict(family="phdos", batch=64, lo=2, hi=12,
                                   n=512, epochs=5, target_steps=1280,
                                   dtype="bfloat16",
                                   env={"DOSTPU_ATTN_NOPAD": "0",
                                        "DOSTPU_ATTN_PALLAS_BWD": "0"}),
    "phdos_b64_bf16_no_fused_mp": dict(family="phdos", batch=64, lo=2, hi=12,
                                       n=512, epochs=5, target_steps=1280,
                                       dtype="bfloat16", fused_mp=False),
    # completing the phDOS attention dispatch grid: the first sweep found
    # padded-fwd + XLA-bwd at +10.4% over the nopad default (the Pallas bwd
    # kernel loses at lq=51/lk=16) — these two decide the FORWARD choice and
    # whether the fwd kernel earns its keep at all at phDOS shapes
    "phdos_b64_bf16_nopadfwd_xlabwd": dict(family="phdos", batch=64, lo=2,
                                           hi=12, n=512, epochs=5,
                                           target_steps=1280,
                                           dtype="bfloat16",
                                           env={"DOSTPU_ATTN_NOPAD": "1",
                                                "DOSTPU_ATTN_PALLAS_BWD":
                                                    "0"}),
    "phdos_b64_bf16_xla_attn": dict(family="phdos", batch=64, lo=2, hi=12,
                                    n=512, epochs=5, target_steps=1280,
                                    dtype="bfloat16", pallas=False),
    # VERDICT r4 next #4: low-precision-residual LayerNorm (nn/layernorm.py,
    # DOSTPU_LN_LP=1) vs the profiled 670 us LN-bwd + 347 us convert+reduce
    # categories of the bf16 B=64 step. Paired against b64_bf16_ctrl128
    # (the same 128-step dispatch shape); phDOS row pairs with
    # phdos_b64_bf16.
    "b64_bf16_lnlp": dict(batch=64, lo=4, hi=24, n=512, epochs=1,
                          target_steps=128, dtype="bfloat16",
                          env={"DOSTPU_LN_LP": "1"}),
    "b128_bf16_lnlp": dict(batch=128, lo=4, hi=24, n=512, epochs=1,
                           target_steps=64, dtype="bfloat16",
                           env={"DOSTPU_LN_LP": "1"}),
    # single-pass Pallas LN backward (nn/layernorm.py _ln_bwd_pallas,
    # DOSTPU_LN_PALLAS=1): dx + dscale/dbias partials from ONE VMEM read
    # of dy/xhat instead of XLA's reduce chain; pairs with b64_bf16_ctrl128
    "b64_bf16_lnpallas": dict(batch=64, lo=4, hi=24, n=512, epochs=1,
                              target_steps=128, dtype="bfloat16",
                              env={"DOSTPU_LN_PALLAS": "1"}),
    "b128_bf16_ctrl64": dict(batch=128, lo=4, hi=24, n=512, epochs=1,
                             target_steps=64, dtype="bfloat16"),
    "phdos_b64_bf16_lnlp": dict(family="phdos", batch=64, lo=2, hi=12,
                                n=512, epochs=5, target_steps=1280,
                                dtype="bfloat16",
                                env={"DOSTPU_LN_LP": "1"}),
    "phdos_b1":  dict(family="phdos", batch=1,  lo=2, hi=12, n=64, epochs=5,
                      target_steps=2560),
    "phdos_b8":  dict(family="phdos", batch=8,  lo=2, hi=12, n=64, epochs=5,
                      target_steps=2560),
    "phdos_b64": dict(family="phdos", batch=64, lo=2, hi=12, n=512, epochs=5,
                      target_steps=1280),
}


def _family(cfg_or_name):
    if isinstance(cfg_or_name, dict):
        return cfg_or_name.get("family", "edos")
    return cfg_or_name


def analytic_flops(batch, a, e, family="edos", hidden=HIDDEN):
    """fwd+bwd+update FLOPs from XLA's cost model on the pure-XLA variant
    (Pallas custom calls are invisible to the model AND their one-hot
    gathers are implementation FLOPs that should not inflate MFU); cached
    per full config key."""
    key = f"b{batch}_h{hidden}_l{LAYERS}_t{T_LAYERS}_a{a}_e{e}"
    if family != "edos":
        key = f"{family}_{key}"
    cache = {}
    if os.path.exists(FLOPS_CACHE):
        with open(FLOPS_CACHE) as f:
            cache = json.load(f)
    if key in cache:
        return cache[key]
    from dostransformer_tpu.data import (synthetic_edos_samples,
                                         synthetic_phdos_samples)
    from dostransformer_tpu.data.datasets import GraphLoader
    from dostransformer_tpu.models import (DOSTransformerEDOS,
                                           DOSTransformerPhDOS)
    from dostransformer_tpu.train.trainer import Trainer

    if family == "phdos":
        samples = synthetic_phdos_samples(batch, seed=0, min_atoms=4,
                                          max_atoms=5)
        model_cls = DOSTransformerPhDOS
    else:
        samples = synthetic_edos_samples(batch, seed=0, min_atoms=4,
                                         max_atoms=5)
        model_cls = DOSTransformerEDOS
    loader = GraphLoader(samples, batch_size=batch, atoms_per_graph=a,
                         edges_per_graph=e)
    batch0 = next(iter(loader))
    model = model_cls(layers=LAYERS, t_layers=T_LAYERS,
                      hidden=hidden, use_pallas=False,
                      use_fused_mp=False)
    trainer = Trainer(model, donate=False)
    state = trainer.init_state(batch0, seed=0)
    compiled = trainer._train_step.lower(state, batch0).compile()
    flops = float((compiled.cost_analysis() or {}).get("flops", 0.0))
    cache[key] = flops
    with open(FLOPS_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    return flops


def measure(name: str) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp
    import jax.random as jrandom

    from dostransformer_tpu.data import (synthetic_edos_samples,
                                         synthetic_phdos_samples)
    from dostransformer_tpu.data.datasets import GraphLoader
    from dostransformer_tpu.models import (DOSTransformerEDOS,
                                           DOSTransformerPhDOS)
    from dostransformer_tpu.train.device_dataset import (BucketedDeviceDataset,
                                                         DeviceDataset)
    from dostransformer_tpu.train.trainer import Trainer

    cfg = CONFIGS[name]
    os.environ.update(cfg.get("env", {}))  # kernel-path flags, read at trace
    batch = cfg["batch"]
    family = _family(cfg)
    sample_fn = (synthetic_phdos_samples if family == "phdos"
                 else synthetic_edos_samples)
    model_cls = (DOSTransformerPhDOS if family == "phdos"
                 else DOSTransformerEDOS)
    if cfg.get("mixed"):
        half = cfg["n"] // 2
        samples = (sample_fn(half, seed=0, min_atoms=4, max_atoms=24)
                   + sample_fn(cfg["n"] - half, seed=1,
                               min_atoms=64, max_atoms=230))
    else:
        samples = sample_fn(cfg["n"], seed=0, min_atoms=cfg["lo"],
                            max_atoms=cfg["hi"])
    loader = GraphLoader(samples, batch_size=batch, shuffle=True, seed=0)
    on_tpu = jax.default_backend() == "tpu"
    hidden = cfg.get("hidden", HIDDEN)
    model = model_cls(layers=LAYERS, t_layers=T_LAYERS,
                      hidden=hidden, use_pallas=cfg.get("pallas", on_tpu),
                      bins_pad=cfg.get("pad_bins"),
                      dtype=cfg.get("dtype", "float32"),
                      use_fused_mp=cfg.get("fused_mp"),
                      remat=cfg.get("remat", False))
    trainer = Trainer(model)
    state = trainer.init_state(next(iter(loader)), seed=0)
    # enough samples that one multi-epoch dispatch hits target_steps
    per_rep_steps = cfg["epochs"] * len(samples) // batch
    reps = max(1, -(-cfg["target_steps"] // max(per_rep_steps, 1)))
    storage = jnp.bfloat16 if cfg.get("bf16_data") else None
    if cfg.get("bucketed"):
        dds = BucketedDeviceDataset.from_samples(samples * reps, batch,
                                                 storage_dtype=storage)
    else:
        dds = DeviceDataset.from_samples(
            samples * reps, batch,
            atoms_per_graph=loader.atoms_per_graph,
            edges_per_graph=loader.edges_per_graph,
            storage_dtype=storage)
    epochs_fn = (trainer.train_epochs_buckets if cfg.get("bucketed")
                 else trainer.train_epochs_device)

    base = jrandom.PRNGKey(0)

    def keys_at(first):
        return jnp.stack([jrandom.fold_in(base, x)
                          for x in range(first, first + cfg["epochs"])])

    e = 0
    for _ in range(2):
        state, losses = epochs_fn(state, dds, keys_at(e))
        e += cfg["epochs"]
        np.asarray(losses)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, losses = epochs_fn(state, dds, keys_at(e))
        e += cfg["epochs"]
        np.asarray(losses)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    sps = cfg["epochs"] * dds.steps_per_epoch * batch / dt
    rec = {
        "config": name, "family": family, "batch": batch,
        "hidden": hidden,
        "atoms_bucket": loader.atoms_per_graph,
        "edges_bucket": loader.edges_per_graph,
        "bf16_data": bool(cfg.get("bf16_data")),
        "pad_bins": cfg.get("pad_bins", 0),
        "dtype": cfg.get("dtype", "float32"),
        "env": cfg.get("env", {}),
        "samples_per_sec": round(sps, 1),
        "ms_per_step": round(1000.0 * batch / sps, 3),
        "dataset_mb": round(dds.nbytes() / 2**20, 1),
    }
    if cfg.get("bucketed"):
        rec["buckets"] = {a: d.num_samples for a, d in dds.buckets}
    if not cfg.get("mixed"):
        # MFU is per-shape; a mixed corpus has no single analytic-FLOPs
        # step (flat-vs-bucketed compares samples/s on identical samples)
        try:
            flops = analytic_flops(batch, loader.atoms_per_graph,
                                   loader.edges_per_graph, family,
                                   hidden=hidden)
            peak = PEAK_FLOPS_BY_KIND.get(jax.devices()[0].device_kind)
            if flops and peak:
                rec["flops_per_step"] = flops
                rec["mfu"] = round(flops * (sps / batch) / peak, 4)
        except Exception as ex:  # MFU best-effort
            rec["mfu_error"] = str(ex)[:200]
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None, choices=list(CONFIGS))
    args = p.parse_args()
    if args.only:
        print(json.dumps(measure(args.only)), flush=True)
        return
    for name in CONFIGS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--only", name],
            capture_output=True, text=True, cwd=REPO)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            rec = {"config": name, "error": (out.stderr or out.stdout)[-400:]}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
