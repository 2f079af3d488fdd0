"""Opt-in multi-head attention extension (num_heads=1 default reproduces the
reference's single-head projection-free math exactly)."""

import jax
import jax.numpy as jnp
import numpy as np

from dostransformer_tpu.nn.transformer import TransformerEncoder
from dostransformer_tpu.ops.attention import dot_product_attention


class TestMultiHead:
    def test_one_head_is_reference_semantics(self):
        rng = np.random.RandomState(0)
        x = jnp.array(rng.randn(2, 7, 32).astype(np.float32))
        enc1 = TransformerEncoder(embed_dim=32, num_heads=1, layers=1,
                                  use_pallas=False)
        params = enc1.init(jax.random.PRNGKey(0), x)
        out1 = enc1.apply(params, x)
        assert np.isfinite(np.asarray(out1)).all()

    def test_heads_change_math_but_stay_finite_and_param_compatible(self):
        rng = np.random.RandomState(1)
        x = jnp.array(rng.randn(2, 7, 32).astype(np.float32))
        enc1 = TransformerEncoder(embed_dim=32, num_heads=1, layers=1,
                                  use_pallas=False)
        enc4 = TransformerEncoder(embed_dim=32, num_heads=4, layers=1,
                                  use_pallas=False)
        params = enc1.init(jax.random.PRNGKey(0), x)  # same param tree
        out1 = enc1.apply(params, x)
        out4 = enc4.apply(params, x)
        assert np.isfinite(np.asarray(out4)).all()
        assert not np.allclose(np.asarray(out1), np.asarray(out4))

    def test_head_split_equals_manual_blockwise(self):
        # 4-head attention == running attention per 8-dim slice independently
        rng = np.random.RandomState(2)
        b, l, d, h = 2, 5, 32, 4
        q, k, v = (jnp.array(rng.randn(b, l, d).astype(np.float32))
                   for _ in range(3))
        outs = []
        for i in range(h):
            sl = slice(i * d // h, (i + 1) * d // h)
            outs.append(dot_product_attention(q[..., sl], k[..., sl], v[..., sl]))
        want = jnp.concatenate(outs, axis=-1)

        def split(t):
            return (t.reshape(b, l, h, d // h)
                    .transpose(0, 2, 1, 3).reshape(b * h, l, d // h))

        got = dot_product_attention(split(q), split(k), split(v))
        got = got.reshape(b, h, l, d // h).transpose(0, 2, 1, 3).reshape(b, l, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestFusedLNAttention:
    """LN-fused Pallas attention (ops/attention.fused_attention_ln) vs the
    jnp composition — values AND gradients, incl. the shared-tensor
    self-attention case and non-128-multiple widths (padded-column LN
    statistics)."""

    def _case(self, b, lq, lk, d, self_attn=False, masked=False, seed=0):
        from dostransformer_tpu.ops.attention import (
            fused_attention_ln,
            ln_attention_reference,
        )

        rng = np.random.RandomState(seed)
        x = jnp.array(rng.randn(b, lq, d).astype(np.float32))
        if self_attn:
            xk = xv = x
        else:
            xk = jnp.array(rng.randn(b, lk, d).astype(np.float32))
            xv = jnp.array(rng.randn(b, lk, d).astype(np.float32))
        scale = jnp.array(rng.rand(d).astype(np.float32) + 0.5)
        bias = jnp.array(rng.randn(d).astype(np.float32) * 0.1)
        mask = None
        if masked:
            mask = jnp.array(rng.rand(b, xk.shape[1]) > 0.3)
            mask = mask.at[:, 0].set(True)  # at least one key

        out_f = fused_attention_ln(x, xk, xv, scale, bias, mask)
        out_r = ln_attention_reference(x, xk, xv, scale, bias, mask)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=2e-5, atol=2e-5)

        def loss_f(x_, xk_, xv_, s_, b_):
            return (fused_attention_ln(x_, xk_, xv_, s_, b_, mask) ** 2).sum()

        def loss_r(x_, xk_, xv_, s_, b_):
            return (ln_attention_reference(x_, xk_, xv_, s_, b_, mask) ** 2).sum()

        gf = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(x, xk, xv, scale, bias)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, xk, xv, scale, bias)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=3e-4, atol=3e-4)

    def test_cross_attention(self):
        self._case(2, 9, 6, 32)

    def test_self_attention_shared_tensor(self):
        self._case(2, 7, 7, 32, self_attn=True)

    def test_masked_keys(self):
        self._case(2, 5, 11, 64, masked=True, seed=3)

    def test_flagship_width(self):
        self._case(1, 13, 5, 256, seed=5)

    def test_transformer_layer_fused_matches_unfused(self, monkeypatch):
        """The full encoder layer with the LN-fused path (opt-in via
        DOSTPU_FUSE_LN_ATTN — measured slower at flagship shapes, kept for
        larger configs) must match the unfused module math (same params)."""
        monkeypatch.setenv("DOSTPU_FUSE_LN_ATTN", "1")
        rng = np.random.RandomState(4)
        x = jnp.array(rng.randn(2, 7, 32).astype(np.float32))
        xk = jnp.array(rng.randn(2, 4, 32).astype(np.float32))
        enc_f = TransformerEncoder(embed_dim=32, layers=2, use_pallas=True)
        enc_u = TransformerEncoder(embed_dim=32, layers=2, use_pallas=False)
        params = enc_u.init(jax.random.PRNGKey(0), x, xk, xk)
        params_f = enc_f.init(jax.random.PRNGKey(0), x, xk, xk)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(params_f))
        out_u = enc_u.apply(params, x, xk, xk)
        out_f = enc_f.apply(params, x, xk, xk)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                                   rtol=2e-5, atol=2e-5)
