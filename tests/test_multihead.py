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
