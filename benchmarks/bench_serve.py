"""Serving (inference) throughput for serve.Predictor on the real TPU.

Training throughput is covered by bench.py / bench_configs.py; this measures
the production INFERENCE path — serve.Predictor.predict: host featurized
samples in, DOS spectra out, including collation, dispatch pipelining, the
on-device concatenation and the single result fetch.

Through the tunneled backend every predict() call pays one fixed host
round trip (~30-55 ms) for the result fetch, so two numbers are reported
per batch size:

  * wall samples/s on a large request — the end-to-end number a client sees
    (understated here by the tunnel RTT; on a directly-attached TPU host
    the fixed cost is <1 ms);
  * marginal samples/s — differenced between a large and a small request of
    identical bucket shapes (same compiled executable), which cancels the
    per-call fixed costs and measures the per-batch device+dispatch rate,
    i.e. the sustained throughput of a saturated serving loop.

    python benchmarks/bench_serve.py                   # all batch sizes
    python benchmarks/bench_serve.py --batches 64      # one batch size

Reference: no serving path exists upstream (SURVEY.md §5) — the model is
never serialized; eval writes metrics only (main_eDOS.py:129-166).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HIDDEN, LAYERS, T_LAYERS = 256, 3, 2
SMALL_BATCHES = 4     # batches in the small request
LARGE_BATCHES = 36    # batches in the large request
REPS = 7


def measure(batch_size: int, lo: int = 4, hi: int = 24,
            exported: bool = False) -> dict:
    import tempfile

    from dostransformer_tpu.data.datasets import GraphLoader
    from dostransformer_tpu.data.synthetic import synthetic_edos_samples
    from dostransformer_tpu.models import DOSTransformerEDOS
    from dostransformer_tpu.serve import ExportedPredictor, Predictor

    import jax

    base = synthetic_edos_samples(batch_size * SMALL_BATCHES, seed=0,
                                  min_atoms=lo, max_atoms=hi)
    # the large request replicates the small one -> identical bucket maxima
    # -> identical compiled executable for both sizes
    small = base
    large = base * (LARGE_BATCHES // SMALL_BATCHES)

    on_tpu = jax.default_backend() == "tpu"
    model = DOSTransformerEDOS(layers=LAYERS, t_layers=T_LAYERS,
                               hidden=HIDDEN, use_pallas=on_tpu)
    loader = GraphLoader(small, batch_size=batch_size)
    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), b0, deterministic=True)["params"]
    pred = Predictor(model, params, batch_size=batch_size, clamp=True)
    if exported:
        art = tempfile.mkdtemp(prefix="dostpu_bench_artifact_")
        pred.export(art, small)
        pred = ExportedPredictor(art)

    # warmup (compile both request sizes' final-batch shapes; identical here)
    pred.predict(small)
    pred.predict(large)

    def timed(samples):
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = pred.predict(samples)
            times.append(time.perf_counter() - t0)
            assert out.shape == (len(samples), 201)
        times.sort()
        return times[len(times) // 2]

    t_small = timed(small)
    t_large = timed(large)
    marginal_per_batch = (t_large - t_small) / (LARGE_BATCHES - SMALL_BATCHES)
    return {
        "bench": "serve_predict_exported" if exported else "serve_predict",
        "batch": batch_size,
        "atoms": [lo, hi],
        "samples_large": len(large),
        "wall_samples_per_sec": round(len(large) / t_large, 1),
        "marginal_samples_per_sec": round(batch_size / marginal_per_batch, 1),
        "ms_per_batch_marginal": round(1e3 * marginal_per_batch, 3),
        "wall_ms_small": round(1e3 * t_small, 1),
        "wall_ms_large": round(1e3 * t_large, 1),
    }


def measure_mixed(batch_size: int = 8) -> dict:
    """Bucketed vs request-wide-bucket inference on a size-mixed request:
    half small crystals (4-24 atoms), half large (64-230 — the SURVEY §3.3
    envelope). Unbucketed pads every small crystal to the large bucket."""
    import time as _time

    import jax

    from dostransformer_tpu.data.datasets import GraphLoader
    from dostransformer_tpu.data.synthetic import synthetic_edos_samples
    from dostransformer_tpu.models import DOSTransformerEDOS
    from dostransformer_tpu.serve import Predictor

    small = synthetic_edos_samples(64, seed=0, min_atoms=4, max_atoms=24)
    large = synthetic_edos_samples(64, seed=1, min_atoms=64, max_atoms=230)
    mixed = [x for pair in zip(small, large) for x in pair]

    on_tpu = jax.default_backend() == "tpu"
    model = DOSTransformerEDOS(layers=LAYERS, t_layers=T_LAYERS,
                               hidden=HIDDEN, use_pallas=on_tpu)
    b0 = next(iter(GraphLoader(mixed, batch_size=batch_size)))
    params = model.init(jax.random.PRNGKey(0), b0,
                        deterministic=True)["params"]
    pred = Predictor(model, params, batch_size=batch_size, clamp=True)

    def timed(bucketed):
        pred.predict(mixed, bucketed=bucketed)  # compile warmup
        times = []
        for _ in range(5):
            t0 = _time.perf_counter()
            pred.predict(mixed, bucketed=bucketed)
            times.append(_time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]

    t_unbucketed = timed(False)
    t_bucketed = timed(True)
    return {
        "bench": "serve_predict_mixed",
        "batch": batch_size,
        "samples": len(mixed),
        "wall_ms_bucketed": round(1e3 * t_bucketed, 1),
        "wall_ms_unbucketed": round(1e3 * t_unbucketed, 1),
        "speedup": round(t_unbucketed / t_bucketed, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[8, 64, 256])
    ap.add_argument("--mixed", action="store_true",
                    help="measure bucketed vs unbucketed on a size-mixed "
                         "request instead of the batch-size sweep")
    ap.add_argument("--exported", action="store_true",
                    help="serve through a jax.export AOT artifact instead "
                         "of the live predictor (parity check)")
    args = ap.parse_args()
    if args.mixed:
        print(json.dumps(measure_mixed()))
        return
    for b in args.batches:
        print(json.dumps(measure(b, exported=args.exported)))


if __name__ == "__main__":
    main()
