"""Differential tests of the low-precision-residual LayerNorm
(nn/layernorm.py, the bf16 LN-bwd lever; BASELINE.md round-5).

The default path must stay BIT-identical to flax (it IS flax); the LP path
must match flax's forward exactly (same op sequence) and flax's autodiff
backward analytically — exact-ish at f32/f64 residuals, within bf16 rounding
at bf16 residuals."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as fnn

from dostransformer_tpu.nn.layernorm import LN_EPS, layer_norm_lp


def _ref_ln(x, scale, bias):
    """The default composition at the transformer call sites."""
    f = jnp.promote_types(x.dtype, jnp.float32)
    mod = fnn.LayerNorm(epsilon=LN_EPS, dtype=None)
    y = mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    assert y.dtype == f
    return y.astype(x.dtype)


def _data(dtype, shape=(4, 7, 256), seed=0):
    kx, ks, kb = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = (jax.random.normal(kx, shape, jnp.float32) * 3 + 1).astype(dtype)
    scale = jax.random.normal(ks, (shape[-1],), jnp.float32) * 0.2 + 1.0
    bias = jax.random.normal(kb, (shape[-1],), jnp.float32) * 0.1
    return x, scale, bias


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_flax_exactly(dtype):
    x, scale, bias = _data(dtype)
    got = layer_norm_lp(x, scale, bias)
    want = _ref_ln(x, scale, bias)
    assert got.dtype == dtype
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_backward_matches_autodiff_f32():
    x, scale, bias = _data(jnp.float32)

    def loss_lp(x, s, b):
        return (layer_norm_lp(x, s, b) ** 2).sum()

    def loss_ref(x, s, b):
        return (_ref_ln(x, s, b) ** 2).sum()

    g_lp = jax.grad(loss_lp, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(g_lp, g_ref, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_backward_matches_autodiff_bf16_within_rounding():
    """bf16 residuals round xhat once; grads must stay within a few bf16
    ulps of the f32-residual autodiff (compared in f32 space)."""
    x, scale, bias = _data(jnp.bfloat16)

    def loss_lp(x, s, b):
        return (layer_norm_lp(x, s, b).astype(jnp.float32) ** 2).sum()

    def loss_ref(x, s, b):
        return (_ref_ln(x, s, b).astype(jnp.float32) ** 2).sum()

    g_lp = jax.grad(loss_lp, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(g_lp, g_ref, ("dx", "dscale", "dbias")):
        a, b_ = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        denom = max(1e-3, float(np.abs(b_).max()))
        assert np.abs(a - b_).max() / denom < 0.03, name


def test_x64_residuals_keep_full_precision():
    jax.config.update("jax_enable_x64", True)
    try:
        x, scale, bias = _data(jnp.float64)
        scale, bias = scale.astype(jnp.float64), bias.astype(jnp.float64)

        def loss_lp(x, s, b):
            return (layer_norm_lp(x, s, b) ** 2).sum()

        def loss_ref(x, s, b):
            return (_ref_ln(x, s, b) ** 2).sum()

        g_lp = jax.grad(loss_lp)(x, scale, bias)
        g_ref = jax.grad(loss_ref)(x, scale, bias)
        np.testing.assert_allclose(np.asarray(g_lp), np.asarray(g_ref),
                                   rtol=1e-12, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


class TestPallasBwd:
    """DOSTPU_LN_PALLAS=1: the LN backward runs as ONE Pallas pass (dx +
    dscale/dbias partials from a single read of dy/xhat) on 3D streams,
    jnp fallback elsewhere. Interpret mode on CPU; grads must match the
    jnp backward analytically (identical residual format — only the
    execution engine differs)."""

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("shape", [(8, 201, 256), (6, 7, 32)])
    def test_grads_match_jnp_bwd(self, dtype, shape, monkeypatch):
        monkeypatch.setenv("DOSTPU_PALLAS_INTERPRET", "1")
        x, scale, bias = _data(dtype, shape=shape)

        def loss(x, s, b):
            return (layer_norm_lp(x, s, b).astype(jnp.float32) ** 2).sum()

        monkeypatch.setenv("DOSTPU_LN_PALLAS", "1")
        g_pl = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)
        monkeypatch.delenv("DOSTPU_LN_PALLAS")
        g_jnp = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_, name in zip(g_pl, g_jnp, ("dx", "dscale", "dbias")):
            a = np.asarray(a, np.float32)
            b_ = np.asarray(b_, np.float32)
            if dtype == jnp.bfloat16:
                # the kernel keeps g = dy*scale in f32 where the jnp path
                # rounds it at bf16 — a real (more-precise) rounding-path
                # difference, so compare within bf16 rounding, like
                # test_backward_matches_autodiff_bf16_within_rounding
                denom = max(1e-3, float(np.abs(b_).max()))
                assert np.abs(a - b_).max() / denom < 0.03, name
            else:
                np.testing.assert_allclose(a, b_, rtol=2e-5, atol=2e-5,
                                           err_msg=name)

    def test_2d_falls_back_to_jnp(self, monkeypatch):
        monkeypatch.setenv("DOSTPU_LN_PALLAS", "1")
        x, scale, bias = _data(jnp.float32, shape=(16, 64))

        def loss(x, s, b):
            return (layer_norm_lp(x, s, b) ** 2).sum()

        g = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)
        monkeypatch.delenv("DOSTPU_LN_PALLAS")
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-6, atol=1e-6)


class TestModelDispatch:
    def _outputs(self, env_val, dtype="float32"):
        from dostransformer_tpu.data import synthetic_edos_samples
        from dostransformer_tpu.data.datasets import GraphLoader
        from dostransformer_tpu.models import DOSTransformerEDOS

        old = os.environ.get("DOSTPU_LN_LP")
        os.environ["DOSTPU_LN_LP"] = env_val
        try:
            samples = synthetic_edos_samples(4, seed=0)
            batch = next(iter(GraphLoader(samples, batch_size=4)))
            model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                       use_pallas=False, dtype=dtype)
            params = model.init(jax.random.PRNGKey(0), batch)

            def loss(p):
                dg, _, ds = model.apply(p, batch)
                return ((dg.astype(jnp.float32) - batch.y) ** 2).mean()

            val, grads = jax.value_and_grad(loss)(params)
            return params, float(val), grads
        finally:
            if old is None:
                os.environ.pop("DOSTPU_LN_LP", None)
            else:
                os.environ["DOSTPU_LN_LP"] = old

    def test_param_tree_and_f32_numerics_unchanged(self):
        p0, v0, g0 = self._outputs("0")
        p1, v1, g1 = self._outputs("1")
        assert jax.tree.structure(p0) == jax.tree.structure(p1)
        assert jax.tree.all(jax.tree.map(
            lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
            p0, p1))
        assert abs(v0 - v1) < 1e-7 * max(1.0, abs(v0))
        flat0, flat1 = jax.tree.leaves(g0), jax.tree.leaves(g1)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)

    def test_bf16_loss_close(self):
        _, v0, _ = self._outputs("0", dtype="bfloat16")
        _, v1, _ = self._outputs("1", dtype="bfloat16")
        assert abs(v0 - v1) < 0.02 * max(1.0, abs(v0))
