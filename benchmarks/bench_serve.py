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


def measure_coalesce(batch_size: int = 8, clients: int = 16,
                     requests_per_client: int = 8) -> dict:
    """Concurrent small requests: per-request device dispatch (the HTTP
    server's lock path) vs CoalescingBatcher micro-batching. Each of
    ``clients`` threads fires ``requests_per_client`` sequential
    ``batch_size``-sample requests; identical bucket shapes throughout so
    both modes run one compiled executable."""
    import threading
    import time as _time

    import jax

    from dostransformer_tpu.data.datasets import GraphLoader
    from dostransformer_tpu.data.synthetic import synthetic_edos_samples
    from dostransformer_tpu.models import DOSTransformerEDOS
    from dostransformer_tpu.serve import Predictor
    from dostransformer_tpu.serve_batch import CoalescingBatcher

    req = synthetic_edos_samples(batch_size, seed=0, min_atoms=4,
                                 max_atoms=24)
    on_tpu = jax.default_backend() == "tpu"
    model = DOSTransformerEDOS(layers=LAYERS, t_layers=T_LAYERS,
                               hidden=HIDDEN, use_pallas=on_tpu)
    b0 = next(iter(GraphLoader(req, batch_size=batch_size)))
    params = model.init(jax.random.PRNGKey(0), b0,
                        deterministic=True)["params"]
    pred = Predictor(model, params, batch_size=batch_size, clamp=True)
    # warm every chunk variant a coalescing window can produce (scan-of-S
    # chunk functions compile per S — see Predictor._CHUNKS)
    for k in (1, 2, 3, 4, 8, clients):
        pred.predict(req * k)

    def drive(call):
        def client():
            for _ in range(requests_per_client):
                out = call(req)
                assert out.shape == (batch_size, 201)

        threads = [threading.Thread(target=client) for _ in range(clients)]
        t0 = _time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return _time.perf_counter() - t0

    lock = threading.Lock()

    def locked(samples):
        with lock:
            return pred.predict(samples)

    t_lock = min(drive(locked) for _ in range(3))
    batcher = CoalescingBatcher(pred, max_delay_ms=2.0)
    try:
        t_coal = min(drive(batcher.predict) for _ in range(3))
    finally:
        batcher.close()
    n = clients * requests_per_client * batch_size
    return {
        "bench": "serve_coalesce",
        "batch": batch_size,
        "clients": clients,
        "requests": clients * requests_per_client,
        "wall_ms_locked": round(1e3 * t_lock, 1),
        "wall_ms_coalesced": round(1e3 * t_coal, 1),
        "samples_per_sec_locked": round(n / t_lock, 1),
        "samples_per_sec_coalesced": round(n / t_coal, 1),
        "speedup": round(t_lock / t_coal, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[8, 64, 256])
    ap.add_argument("--mixed", action="store_true",
                    help="measure bucketed vs unbucketed on a size-mixed "
                         "request instead of the batch-size sweep")
    ap.add_argument("--coalesce", action="store_true",
                    help="measure concurrent-client micro-batching "
                         "(CoalescingBatcher) vs the per-request lock path")
    ap.add_argument("--exported", action="store_true",
                    help="serve through a jax.export AOT artifact instead "
                         "of the live predictor (parity check)")
    args = ap.parse_args()
    if args.mixed:
        print(json.dumps(measure_mixed()))
        return
    if args.coalesce:
        print(json.dumps(measure_coalesce()))
        return
    for b in args.batches:
        print(json.dumps(measure(b, exported=args.exported)))


if __name__ == "__main__":
    main()
