"""Benchmark: eDOS flagship train-step throughput vs the eager-PyTorch baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N}

- Ours: jit-compiled DOSTransformerEDOS train step (default config h=256,
  layers=3, t_layers=2, batch 8 — the reference's headline training config,
  reference utils.py:25-43) on whatever device JAX selects (real TPU under
  axon; CPU elsewhere).
- Baseline: behaviorally equivalent eager PyTorch trainer
  (benchmarks/torch_reference.py) — the reference repo publishes no numbers
  and its CUDA/PyG env is unavailable (BASELINE.md), so the baseline is
  measured once on this host's CPU and cached in BENCH_BASELINE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_CACHE = os.path.join(REPO, "BENCH_BASELINE.json")

BATCH = 8
HIDDEN = 256
LAYERS = 3
T_LAYERS = 2
N_SAMPLES = 64
WARMUP = 2
# one scan-compiled MULTI-EPOCH dispatch per timed rep — the production
# cadence (cli/common.py dispatches a whole eval interval at once). The
# tunneled-TPU backend adds a fixed ~30-55 ms host round trip per dispatch;
# a long dispatch amortizes that fixed cost so the metric measures
# steady-state device throughput, not tunnel latency (CLAUDE.md quirks).
STEPS = 512
EPOCHS_PER_DISPATCH = 5


def _samples():
    from dostransformer_tpu.data import synthetic_edos_samples

    return synthetic_edos_samples(N_SAMPLES, seed=0, min_atoms=4, max_atoms=24)


def probe_tpu_backend(timeout_s: int = 180, retries: int = 5,
                      wait_s: int = 90):
    """Fail fast (with retries) if the tunneled-TPU backend is unreachable.

    When the axon tunnel is configured (PALLAS_AXON_POOL_IPS) but the far end
    is down, ``jax.devices()`` hangs forever inside PJRT client init — the
    bench would never print its JSON line. Probe device init + a value fetch
    in a subprocess under a timeout; on persistent failure, emit an explicit
    error record instead of hanging.

    Returns the probed device_kind (or None off-tunnel) so the parent never
    has to initialize jax itself — a wedged tunnel makes ANY backend touch in
    this process a potential forever-hang, and the headline JSON must print.
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return None  # local CPU/TPU backend: init works or raises promptly
    import subprocess

    code = ("import jax, jax.numpy as jnp; d = jax.devices(); "
            "v = float(jnp.arange(8.0).sum()); "  # value fetch = real barrier
            "assert v == 28.0; print(d[0].device_kind)")
    last = ""
    for attempt in range(retries):
        if attempt:
            time.sleep(wait_s)
        try:
            r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                               capture_output=True, text=True)
            if r.returncode == 0:
                return r.stdout.strip().splitlines()[-1]
            last = (r.stderr or "").strip()[-500:]
        except subprocess.TimeoutExpired:
            last = f"device init hung >{timeout_s}s (tunnel down?)"
        print(f"[bench] TPU probe attempt {attempt + 1}/{retries} failed: "
              f"{last}", file=sys.stderr)
    print(json.dumps({
        "metric": "edos_train_samples_per_sec", "value": 0.0,
        "unit": "samples/sec", "vs_baseline": 0.0,
        "error": f"TPU backend unreachable after {retries} probes: {last}",
    }))
    sys.exit(1)


def measure_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["edos_train_samples_per_sec"]
    from benchmarks.torch_reference import measure_torch_throughput

    sps = measure_torch_throughput(_samples(), batch_size=BATCH, h=HIDDEN,
                                   layers=LAYERS, t_layers=T_LAYERS,
                                   warmup=2, steps=8)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"edos_train_samples_per_sec": sps,
                   "config": {"batch": BATCH, "hidden": HIDDEN,
                              "layers": LAYERS, "t_layers": T_LAYERS},
                   "host": "cpu-eager-torch"}, f, indent=1)
    return sps


def measure_jax(dtype: str = "float32") -> float:
    import jax

    from dostransformer_tpu.data.datasets import GraphLoader
    from dostransformer_tpu.models import DOSTransformerEDOS
    from dostransformer_tpu.train.trainer import Trainer

    samples = _samples()
    loader = GraphLoader(samples, batch_size=BATCH, shuffle=True, seed=0)
    batches = list(loader)[: max(4, STEPS)]

    on_tpu = jax.default_backend() == "tpu"
    model = DOSTransformerEDOS(layers=LAYERS, t_layers=T_LAYERS, hidden=HIDDEN,
                               use_pallas=on_tpu, dtype=dtype)
    trainer = Trainer(model)
    state = trainer.init_state(batches[0], seed=0)

    # production path: device-resident dataset, scan-compiled epochs — one
    # dispatch per measurement; the tunneled-TPU backend has noisy dispatch
    # latency and an unreliable block_until_ready, so use value-fetch
    # barriers and the median of several reps
    import numpy as np

    from dostransformer_tpu.train.device_dataset import DeviceDataset

    dds = DeviceDataset.from_samples(
        samples * (STEPS * BATCH // len(samples) + 1), BATCH,
        atoms_per_graph=loader.atoms_per_graph,
        edges_per_graph=loader.edges_per_graph)
    import jax.numpy as jnp
    import jax.random as jrandom

    # the production cadence (cli/common.py): one dispatch per eval interval
    # (multi-epoch scan) — per-epoch shuffle keys derived by fold_in
    base = jrandom.PRNGKey(0)
    def keys_at(first_epoch):
        return jnp.stack([jrandom.fold_in(base, e) for e in
                          range(first_epoch, first_epoch + EPOCHS_PER_DISPATCH)])

    e = 0
    for _ in range(WARMUP):
        state, losses = trainer.train_epochs_device(state, dds, keys_at(e))
        e += EPOCHS_PER_DISPATCH
        np.asarray(losses)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, losses = trainer.train_epochs_device(state, dds, keys_at(e))
        e += EPOCHS_PER_DISPATCH
        np.asarray(losses)
        times.append(time.perf_counter() - t0)
    times.sort()
    samples_per_dispatch = EPOCHS_PER_DISPATCH * dds.steps_per_epoch * BATCH
    # (min, median, max) samples/s over the 5 reps: the spread IS the
    # tunnel-noise band (VERDICT r4 #6) — fastest rep -> max throughput
    return (samples_per_dispatch / times[-1],
            samples_per_dispatch / times[len(times) // 2],
            samples_per_dispatch / times[0])


# bf16 peak matmul throughput per chip (the standard MFU denominator on TPU)
PEAK_FLOPS_BY_KIND = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}
FLOPS_CACHE = os.path.join(REPO, "BENCH_FLOPS.json")


def analytic_flops_per_step() -> float:
    """Algorithmic fwd+bwd+update FLOPs of one train step at the bench config,
    from XLA's cost model on the PURE-XLA model variant (use_pallas off:
    einsum attention/message-passing are counted algorithmically there;
    Pallas custom calls would be invisible to the cost model, and their
    one-hot-matmul gathers are implementation FLOPs that should NOT inflate
    MFU). Cached: the count is config-determined, not hardware-determined."""
    key = f"b{BATCH}_h{HIDDEN}_l{LAYERS}_t{T_LAYERS}"
    if os.path.exists(FLOPS_CACHE):
        with open(FLOPS_CACHE) as f:
            cache = json.load(f)
        if key in cache:
            return cache[key]
    from dostransformer_tpu.data.datasets import GraphLoader
    from dostransformer_tpu.models import DOSTransformerEDOS
    from dostransformer_tpu.train.trainer import Trainer

    samples = _samples()
    loader = GraphLoader(samples, batch_size=BATCH)
    batch0 = next(iter(loader))
    model = DOSTransformerEDOS(layers=LAYERS, t_layers=T_LAYERS, hidden=HIDDEN,
                               use_pallas=False, use_fused_mp=False)
    trainer = Trainer(model, donate=False)
    state = trainer.init_state(batch0, seed=0)
    compiled = trainer._train_step.lower(state, batch0).compile()
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", 0.0))
    cache = {}
    if os.path.exists(FLOPS_CACHE):
        with open(FLOPS_CACHE) as f:
            cache = json.load(f)
    cache[key] = flops
    with open(FLOPS_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    return flops


MEASURE_TIMEOUT_S = 1500


def _measure_subprocess(dtype: str, attempts: int = 2) -> float:
    """measure_jax(dtype) in a fresh, time-bounded interpreter.

    The tunnel can wedge MID-measure (seen in the wild: the probe passes,
    then the first dispatch never returns) — an in-process measurement would
    hang this driver forever and no JSON line would ever print. A subprocess
    bounds the damage; one retry covers a transient flap."""
    import subprocess

    last = ""
    for attempt in range(attempts):
        if attempt:
            time.sleep(60)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--_measure", dtype],
                timeout=MEASURE_TIMEOUT_S, capture_output=True, text=True)
            if r.returncode == 0:
                lo, med, hi = map(float, r.stdout.strip().splitlines()[-1].split())
                return lo, med, hi
            last = (r.stderr or "").strip()[-400:]
        except subprocess.TimeoutExpired:
            last = (f"measurement hung >{MEASURE_TIMEOUT_S}s "
                    "(tunnel wedged mid-run?)")
        print(f"[bench] measure attempt {attempt + 1}/{attempts} ({dtype}) "
              f"failed: {last}", file=sys.stderr)
    raise RuntimeError(last)


def _cached_flops():
    """Analytic step FLOPs: from the committed cache; computed (which
    compiles on the default backend) only when no tunnel is configured —
    under the tunnel a compile is a hang risk and the cache is committed."""
    key = f"b{BATCH}_h{HIDDEN}_l{LAYERS}_t{T_LAYERS}"
    if os.path.exists(FLOPS_CACHE):
        with open(FLOPS_CACHE) as f:
            cache = json.load(f)
        if key in cache:
            return cache[key]
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return None
    return analytic_flops_per_step()


def main():
    kind = probe_tpu_backend()
    baseline = measure_baseline()
    try:
        lo, ours, hi = _measure_subprocess("float32")
    except RuntimeError as e:
        print(json.dumps({
            "metric": "edos_train_samples_per_sec", "value": 0.0,
            "unit": "samples/sec", "vs_baseline": 0.0,
            "error": f"f32 measurement failed: {e}"}))
        sys.exit(1)
    record = {
        "metric": "edos_train_samples_per_sec",
        "value": round(ours, 2),
        "unit": "samples/sec",
        "vs_baseline": round(ours / baseline, 2),
        # within-session rep spread (5 multi-epoch dispatches): the
        # tunnel-noise band — a regression smaller than this band is not
        # distinguishable from noise (BASELINE.md noise-discipline section)
        "value_min": round(lo, 2),
        "value_max": round(hi, 2),
    }
    peak = None
    try:
        if kind is None:
            import jax

            kind = jax.devices()[0].device_kind
        flops = _cached_flops()
        peak = PEAK_FLOPS_BY_KIND.get(kind)
        if flops and peak:
            steps_per_sec = ours / BATCH
            record["flops_per_step"] = flops
            record["mfu"] = round(flops * steps_per_sec / peak, 5)
    except Exception:
        pass  # MFU is best-effort; the headline metric must always print
    try:
        # best-effort extra: the RECOMMENDED production dtype (--dtype
        # bfloat16, convergence-validated in BASELINE.md — RMSE deltas
        # bracket zero vs f32 across seeds/tasks). The headline stays f32
        # for cross-round comparability with the reference's numerics.
        blo, bf16, bhi = _measure_subprocess("bfloat16", attempts=1)
        record["value_bf16"] = round(bf16, 2)
        record["value_bf16_min"] = round(blo, 2)
        record["value_bf16_max"] = round(bhi, 2)
        if "mfu" in record and peak:
            record["mfu_bf16"] = round(
                record["flops_per_step"] * (bf16 / BATCH) / peak, 5)
    except Exception:
        pass
    print(json.dumps(record))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--_measure":
        print(*measure_jax(sys.argv[2]))
    else:
        main()
