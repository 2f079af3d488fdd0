"""Microbenchmark the fused message-passing kernel at the flagship shapes.

Usage: python benchmarks/bench_fused_mp.py [--tile 256 384 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--a", type=int, default=32)
    p.add_argument("--e", type=int, default=384)
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--h", type=int, default=256)
    p.add_argument("--tiles", type=int, nargs="+", default=[128, 256, 384, 512])
    p.add_argument("--reps", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dostransformer_tpu.ops import fused_mp

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    sp = jax.random.normal(ks[0], (args.b, args.a, args.m), jnp.float32)
    dp = jax.random.normal(ks[1], (args.b, args.a, args.m), jnp.float32)
    ep = jax.random.normal(ks[2], (args.b, args.e, args.m), jnp.float32)
    senders = jax.random.randint(ks[3], (args.b, args.e), 0, args.a)
    receivers = jax.random.randint(ks[4], (args.b, args.e), 0, args.a)
    mask = jnp.ones((args.b, args.e), jnp.float32)
    lns = jnp.ones((args.m,), jnp.float32)
    lnb = jnp.zeros((args.m,), jnp.float32)
    alpha = jnp.full((1,), 0.25, jnp.float32)
    w1 = jax.random.normal(ks[5], (args.m, args.h), jnp.float32) * 0.05
    b1 = jnp.zeros((args.h,), jnp.float32)

    inputs = (sp, dp, ep, senders, receivers, mask, lns, lnb, alpha, w1, b1)

    def timed_scan(step_of_carry):
        """Time one call by scanning dependent calls inside ONE jit dispatch,
        at two scan lengths; the difference cancels the tunnel's fixed
        ~30-50 ms dispatch+fetch cost (CLAUDE.md environment quirks)."""
        import functools

        @functools.partial(jax.jit, static_argnames=("length",))
        def run(sp0, length):
            def body(c, _):
                return step_of_carry(c), None
            c, _ = jax.lax.scan(body, sp0, None, length=length)
            return c

        l1, l2 = args.reps // 8, args.reps
        for length in (l1, l2):             # compile both
            np.asarray(run(sp, length))

        def once(length):
            t0 = time.perf_counter()
            np.asarray(run(sp, length))
            return time.perf_counter() - t0

        ts = sorted((once(l2) - once(l1)) for _ in range(5))
        return ts[2] / (l2 - l1) * 1e6

    for tile in args.tiles:
        def step(c, tile=tile):
            eout, agg = fused_mp._fused_fwd_call(
                c, dp, ep, senders, receivers, mask, lns, lnb, alpha, w1, b1,
                tile_e=tile)
            # feed agg back so steps are sequentially dependent
            return c + 1e-6 * agg[:, :, : args.m // 2].repeat(2, axis=-1)
        print(f"tile_e={tile:4d}  fwd {timed_scan(step):8.1f} us/call")

    def loss(spc):
        eout, agg = fused_mp.fused_mp_edge(spc, dp, ep, senders, receivers,
                                           mask, lns, lnb, alpha, w1, b1)
        return (eout ** 2).sum() + (agg ** 2).sum()

    gfn = jax.grad(loss)
    print(f"default fwd+bwd {timed_scan(lambda c: c + 1e-6 * gfn(c)):8.1f}"
          " us/call")

    def loss_ref(spc):
        eout, agg = fused_mp.mp_edge_reference(
            spc, dp, ep, senders, receivers, mask, lns, lnb, alpha, w1, b1)
        return (eout ** 2).sum() + (agg ** 2).sum()

    def ref_step(c):
        eout, agg = fused_mp.mp_edge_reference(
            c, dp, ep, senders, receivers, mask, lns, lnb, alpha, w1, b1)
        return c + 1e-6 * agg[:, :, : args.m // 2].repeat(2, axis=-1)

    print(f"XLA ref fwd     {timed_scan(ref_step):8.1f} us/call")
    grfn = jax.grad(loss_ref)
    print(f"XLA ref fwd+bwd {timed_scan(lambda c: c + 1e-6 * grfn(c)):8.1f}"
          " us/call")


if __name__ == "__main__":
    main()
