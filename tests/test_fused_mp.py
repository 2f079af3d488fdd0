"""Differential tests for the fused message-passing Pallas kernel vs its jnp
composition (forward and custom-VJP backward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dostransformer_tpu.ops.fused_mp import fused_mp_edge, mp_edge_reference


def _inputs(seed=0, b=3, a=13, e=70, m=48, h=24):
    rng = np.random.RandomState(seed)
    j = lambda x: jnp.array(x.astype(np.float32))
    src_proj = j(rng.randn(b, a, m))
    dst_proj = j(rng.randn(b, a, m))
    edge_proj = j(rng.randn(b, e, m))
    senders = jnp.array(rng.randint(0, a, (b, e)).astype(np.int32))
    receivers = jnp.array(rng.randint(0, a, (b, e)).astype(np.int32))
    edge_mask = j((rng.rand(b, e) > 0.2).astype(np.float32))
    ln_scale = j(rng.rand(m) + 0.5)
    ln_bias = j(rng.randn(m) * 0.1)
    alpha = j(np.array([0.25]))
    w1 = j(rng.randn(m, h) * 0.2)
    b1 = j(rng.randn(h) * 0.1)
    return (src_proj, dst_proj, edge_proj, senders, receivers, edge_mask,
            ln_scale, ln_bias, alpha, w1, b1)


class TestFusedMP:
    def test_forward_matches_reference(self):
        args = _inputs()
        e_ref, a_ref = mp_edge_reference(*args)
        e_out, agg = fused_mp_edge(*args)
        np.testing.assert_allclose(np.asarray(e_out), np.asarray(e_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(agg), np.asarray(a_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_gradients_match_reference(self):
        args = _inputs(seed=1)
        diff_idx = (0, 1, 2, 6, 7, 8, 9, 10)  # all float operands

        def loss(fn):
            def f(*diff_args):
                full = list(args)
                for k, i in enumerate(diff_idx):
                    full[i] = diff_args[k]
                e_out, agg = fn(*full)
                return (e_out ** 2).sum() * 0.5 + (agg * 1.3).sum()
            return f

        diff_args = tuple(args[i] for i in diff_idx)
        g_ref = jax.grad(loss(mp_edge_reference),
                         argnums=tuple(range(len(diff_idx))))(*diff_args)
        g_fus = jax.grad(loss(fused_mp_edge),
                         argnums=tuple(range(len(diff_idx))))(*diff_args)
        names = ("src_proj", "dst_proj", "edge_proj", "ln_scale", "ln_bias",
                 "alpha", "w1", "b1")
        for n, a_, b_ in zip(names, g_fus, g_ref):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=2e-4, atol=1e-4, err_msg=n)

    def test_model_level_equivalence(self):
        """DOSTransformer with use_fused_mp=True must match the standard path
        with the SAME params (identical tree), outputs and gradients."""
        from dostransformer_tpu.data import collate, synthetic_edos_samples
        from dostransformer_tpu.models import DOSTransformerEDOS

        samples = synthetic_edos_samples(4, seed=17)
        batch = collate(samples)
        m0 = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)
        m1 = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                use_fused_mp=True)
        params = m0.init(jax.random.PRNGKey(0), batch)
        params1 = m1.init(jax.random.PRNGKey(0), batch)
        assert (jax.tree.structure(params) == jax.tree.structure(params1))

        out0 = m0.apply(params, batch)
        out1 = m1.apply(params, batch)
        for a, b in zip(out0, out1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

        def loss(m):
            def f(p):
                dg, _, ds = m.apply({"params": p}, batch)
                return ((batch.y - dg) ** 2).mean() + ((batch.y - ds) ** 2).mean()
            return f

        g0 = jax.grad(loss(m0))(params["params"])
        g1 = jax.grad(loss(m1))(params["params"])
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)

    def test_phdos_mean_aggregation_equivalence(self):
        """phDOS uses scatter_mean; the fused kernel returns the masked sum
        and NodeModel divides by the degree count — must match exactly."""
        from dostransformer_tpu.data import collate, synthetic_phdos_samples
        from dostransformer_tpu.models import DOSTransformerPhDOS

        samples = synthetic_phdos_samples(3, seed=19)
        batch = collate(samples)
        m0 = DOSTransformerPhDOS(layers=2, t_layers=1, hidden=32,
                                 use_fused_mp=False)
        m1 = DOSTransformerPhDOS(layers=2, t_layers=1, hidden=32,
                                 use_fused_mp=True)
        params = m0.init(jax.random.PRNGKey(0), batch)
        out0 = m0.apply(params, batch)
        out1 = m1.apply(params, batch)
        for a, b in zip(out0, out1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_tile_picker_respects_vmem_budget(self):
        """The edge tile comes from a byte budget over (m, h, a_pad), not E
        alone (ADVICE r2): the measured-fast one-tile configs stay one-tile,
        and larger hidden degrades to smaller tiles instead of exceeding
        ~16 MB VMEM."""
        from dostransformer_tpu.ops.fused_mp import (
            _fixed_bytes,
            _pick_tile_e,
            _tile_bytes,
        )

        # measured one-tile-faster configs (BASELINE.md) must stay one-tile
        assert _pick_tile_e(384, 512, 256, 32) == 384   # flagship
        assert _pick_tile_e(768, 512, 256, 64) == 768   # scaled config
        # larger hidden (m = 2*hidden) must degrade, and every choice must
        # fit the budget
        budget = 14 * 1024 * 1024
        for e, m, h, a_pad in [(1024, 1024, 512, 64), (4096, 2048, 1024, 256),
                               (768, 512, 256, 64), (384, 512, 256, 32)]:
            t = _pick_tile_e(e, m, h, a_pad)
            assert t % 128 == 0 or t == min(-(-e // 128) * 128, 1024)
            assert _tile_bytes(t, m, h, a_pad) + _fixed_bytes(m, h, a_pad) \
                <= budget or t == 128

    @pytest.mark.parametrize("shape", [(1, 5, 30, 32, 16), (2, 40, 300, 64, 64)])
    def test_shapes(self, shape):
        b, a, e, m, h = shape
        args = _inputs(seed=2, b=b, a=a, e=e, m=m, h=h)
        e_ref, a_ref = mp_edge_reference(*args)
        e_out, agg = fused_mp_edge(*args)
        np.testing.assert_allclose(np.asarray(e_out), np.asarray(e_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(agg), np.asarray(a_ref),
                                   rtol=1e-4, atol=1e-4)


class TestMultiTileEdgeGrid:
    """Force tile_e below E so the kernels run a MULTI-TILE edge grid — the
    production shape for large crystals (E>1024) and wide hidden (m>=1024) —
    exercising the e_idx==0 zeroing, the cross-tile agg/gsp/gdp
    accumulation, and the whole-grid parameter-grad accumulation, none of
    which a single-tile grid touches."""

    def test_forward_multi_tile_matches_reference(self):
        from dostransformer_tpu.ops.fused_mp import _fused_fwd_call

        args = _inputs(seed=3)  # e=70; tile_e=32 -> 3 edge tiles
        e_ref, a_ref = mp_edge_reference(*args)
        e_out, agg = _fused_fwd_call(*args, tile_e=32)
        np.testing.assert_allclose(np.asarray(e_out), np.asarray(e_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(agg), np.asarray(a_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_backward_multi_tile_matches_reference_vjp(self):
        from dostransformer_tpu.ops.fused_mp import _fused_bwd_call

        args = _inputs(seed=4)
        diff_idx = (0, 1, 2, 6, 7, 8, 9, 10)

        def ref(*diff_args):
            full = list(args)
            for k, i in enumerate(diff_idx):
                full[i] = diff_args[k]
            return mp_edge_reference(*full)

        diff_args = tuple(args[i] for i in diff_idx)
        (e_ref, a_ref), vjp = jax.vjp(ref, *diff_args)
        rng = np.random.RandomState(9)
        g_eout = jnp.array(rng.randn(*e_ref.shape).astype(np.float32))
        g_agg = jnp.array(rng.randn(*a_ref.shape).astype(np.float32))
        g_ref = vjp((g_eout, g_agg))

        (src_proj, dst_proj, edge_proj, senders, receivers, edge_mask,
         ln_scale, ln_bias, alpha, w1, b1) = args
        g_fus = _fused_bwd_call(src_proj, dst_proj, edge_proj, senders,
                                receivers, edge_mask, ln_scale, ln_bias,
                                alpha, w1, g_eout, g_agg, tile_e=32)
        names = ("src_proj", "dst_proj", "edge_proj", "ln_scale", "ln_bias",
                 "alpha", "w1", "b1")
        for n, a_, b_ in zip(names, g_fus, g_ref):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=2e-4, atol=1e-4, err_msg=n)
