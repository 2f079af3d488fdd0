"""Numerical tests of the dropout path (VERDICT r4 weak #1).

The reference applies dropout to the ATTENTION WEIGHTS
(/root/reference/layers/multihead_attention.py:70, F.dropout on attn_weights)
plus relu/res/embed dropout in the encoder layer
(/root/reference/layers/transformer.py:44-76). Our mirror lives at
ops/attention.py (inverted-scaling Bernoulli on the softmax weights) and
nn/transformer.py (flax Dropout modules). These tests pin:

  * the empirical drop rate matches the configured p;
  * the inverted 1/(1-p) scaling makes the dropped weights UNBIASED
    (mean over masks == the deterministic weights);
  * eval mode (deterministic / no rng) is exactly the no-dropout forward;
  * the Pallas dispatch falls back to the jnp path under dropout with
    BIT-IDENTICAL results given the same rng;
  * the full model is stochastic under train mode and deterministic in
    eval mode, with the dropout rng threaded by the Trainer;
  * a CLI train run with --attn_drop 0.1 stays finite and learns.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dostransformer_tpu.ops.attention import (
    dot_product_attention,
    fused_attention,
)


def _qkv(b=4, lq=8, lk=64, d=64, seed=0, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(kq, (b, lq, d), dtype)
    k = jax.random.normal(kk, (b, lk, d), dtype)
    v = jax.random.normal(kv, (b, lk, d), dtype)
    return q, k, v


class TestAttentionWeightDropout:
    """Weight-level statistics, observed through a v = I probe: with
    v = eye(Lk) (Lk == D) the attention output rows ARE the post-dropout
    weight rows, so the Bernoulli rate and the 1/(1-p) scaling are directly
    measurable without reaching into the op."""

    RATE = 0.3
    N_KEYS = 200

    def _weights(self, rate, rng, b=2, lq=8, lk=64, seed=0):
        q, k, _ = _qkv(b=b, lq=lq, lk=lk, d=lk, seed=seed)
        v = jnp.broadcast_to(jnp.eye(lk, dtype=q.dtype), (b, lk, lk))
        return dot_product_attention(q, k, v, None, dropout_rate=rate,
                                     dropout_rng=rng)

    def test_drop_rate_scaling_and_unbiasedness(self):
        w0 = np.asarray(self._weights(0.0, None))
        assert (w0 > 0).all()  # softmax weights are strictly positive
        np.testing.assert_allclose(w0.sum(-1), 1.0, atol=1e-5)

        keys = jax.random.split(jax.random.PRNGKey(42), self.N_KEYS)
        dropped = np.asarray(jax.vmap(
            lambda key: self._weights(self.RATE, key))(keys))

        # empirical Bernoulli rate: zeros are exactly the dropped slots
        # (kept slots are strictly positive). SE ~ sqrt(p(1-p)/n) = 0.0015.
        zero_frac = (dropped == 0.0).mean()
        assert abs(zero_frac - self.RATE) < 0.01, zero_frac

        # kept slots are scaled by exactly 1/(1-p): every element is either
        # 0 or w0/(1-p) bit-for-bit in the float sense
        scaled = w0 / (1.0 - self.RATE)
        kept = dropped != 0.0
        np.testing.assert_allclose(
            dropped[kept], np.broadcast_to(scaled, dropped.shape)[kept],
            rtol=1e-6)

        # unbiasedness: E[dropout(w)] == w. Per-element SE =
        # w * sqrt(p/(1-p)/N) <= 0.065 w; assert within 5 sigma.
        mean = dropped.mean(axis=0)
        tol = 5 * w0 * np.sqrt(self.RATE / (1 - self.RATE) / self.N_KEYS)
        assert (np.abs(mean - w0) <= tol + 1e-7).all()

    def test_masked_keys_stay_masked_under_dropout(self):
        b, lq, lk = 2, 8, 64
        q, k, _ = _qkv(b=b, lq=lq, lk=lk, d=lk, seed=1)
        v = jnp.broadcast_to(jnp.eye(lk, dtype=q.dtype), (b, lk, lk))
        mask = jnp.arange(lk)[None, :] < jnp.array([[40], [50]])
        w = np.asarray(dot_product_attention(
            q, k, v, mask, dropout_rate=0.3,
            dropout_rng=jax.random.PRNGKey(7)))
        assert (w[0, :, 40:] == 0.0).all()
        assert (w[1, :, 50:] == 0.0).all()

    def test_eval_mode_is_exactly_the_deterministic_forward(self):
        q, k, v = _qkv()
        base = dot_product_attention(q, k, v, None)
        # rate > 0 but NO rng (the eval-mode contract: the layer passes
        # rate=0/rng=None when deterministic) — must be the identical graph
        no_rng = dot_product_attention(q, k, v, None, dropout_rate=0.5,
                                       dropout_rng=None)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(no_rng))
        # rate == 0 with an rng supplied is also exactly deterministic
        zero_rate = dot_product_attention(
            q, k, v, None, dropout_rate=0.0,
            dropout_rng=jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(base), np.asarray(zero_rate))

    def test_pallas_dispatch_falls_back_bit_identically(self):
        """fused_attention documents that attention-weight dropout cannot
        run in the Pallas kernel (the mask lives on the [Lq, Lk] weights)
        and falls back to the jnp path — the fallback must be bit-identical
        to calling the jnp path directly with the same rng, and must
        actually drop (differ from the deterministic forward)."""
        q, k, v = _qkv(b=64)  # batch >= 64 also exercises the no-pad gate
        mask = jnp.ones((64, 64), bool).at[:, 50:].set(False)
        rng = jax.random.PRNGKey(3)
        via_fused = fused_attention(q, k, v, mask, dropout_rate=0.25,
                                    dropout_rng=rng)
        via_jnp = dot_product_attention(q, k, v, mask, dropout_rate=0.25,
                                        dropout_rng=rng)
        np.testing.assert_array_equal(np.asarray(via_fused),
                                      np.asarray(via_jnp))
        det = dot_product_attention(q, k, v, mask)
        assert not np.array_equal(np.asarray(via_fused), np.asarray(det))

    def test_dropout_gradients_flow_and_respect_the_mask(self):
        """d(loss)/dv must be zero exactly where the weight column was
        dropped for every query — the mask gates the backward too."""
        q, k, v = _qkv(b=1, lq=4, lk=8, d=8, seed=2)
        # pick the first rng whose draw fully drops at least one key for
        # every query (0.6^4 ~ 13% per key -> a handful of tries suffices;
        # the scan is deterministic, so the test is not flaky)
        eye = jnp.eye(8, dtype=q.dtype)[None]
        for i in range(64):
            rng = jax.random.PRNGKey(i)
            w = np.asarray(dot_product_attention(
                q, k, eye, None, dropout_rate=0.4, dropout_rng=rng))[0]
            dead_keys = (w == 0.0).all(axis=0)
            if dead_keys.any() and not dead_keys.all():
                break
        else:
            pytest.fail("no rng in 64 tries fully dropped a key")

        def loss(v_):
            out = dot_product_attention(q, k, v_, None, dropout_rate=0.4,
                                        dropout_rng=rng)
            return (out ** 2).sum()

        g = np.asarray(jax.grad(loss)(v))
        assert np.isfinite(g).all()
        # grad wrt v rows of fully-dropped keys must be exactly zero
        assert (g[0][dead_keys] == 0.0).all()
        assert (g[0][~dead_keys] != 0.0).any()


class TestModelDropout:
    def _batch_and_models(self, attn_drop):
        from dostransformer_tpu.data import synthetic_edos_samples
        from dostransformer_tpu.data.datasets import GraphLoader
        from dostransformer_tpu.models import DOSTransformerEDOS

        samples = synthetic_edos_samples(4, seed=0)
        batch = next(iter(GraphLoader(samples, batch_size=4)))
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                   attn_drop=attn_drop, use_pallas=False)
        params = model.init(jax.random.PRNGKey(0), batch)
        return model, params, batch

    def test_train_mode_stochastic_eval_mode_deterministic(self):
        model, params, batch = self._batch_and_models(0.5)
        # attn_drop does not change the param tree or values
        model0, params0, _ = self._batch_and_models(0.0)
        assert jax.tree.all(jax.tree.map(
            lambda a, b: bool((a == b).all()), params, params0))

        det1 = model.apply(params, batch, deterministic=True)
        det2 = model.apply(params, batch, deterministic=True)
        base = model0.apply(params0, batch, deterministic=True)
        for a, b, c in zip(det1, det2, base):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

        tr1 = model.apply(params, batch, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        tr1b = model.apply(params, batch, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(1)})
        tr2 = model.apply(params, batch, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        # same rng -> same draw; different rng -> different draw
        np.testing.assert_array_equal(np.asarray(tr1[0]), np.asarray(tr1b[0]))
        assert not np.array_equal(np.asarray(tr1[0]), np.asarray(tr2[0]))
        assert not np.array_equal(np.asarray(tr1[0]), np.asarray(det1[0]))
        assert np.isfinite(np.asarray(tr1[0])).all()

    def test_trainer_threads_the_dropout_rng(self):
        """Trainer.train_step must produce different grads step to step from
        the dropout draw alone (params/batch held fixed) when attn_drop > 0,
        and identical losses when attn_drop == 0."""
        from dostransformer_tpu.train.trainer import Trainer

        model, params, batch = self._batch_and_models(0.5)
        trainer = Trainer(model, donate=False)
        state = trainer.init_state(batch, seed=0)
        _, m1 = trainer.train_step(state, batch)
        state2 = state.replace(rng=jax.random.fold_in(state.rng, 1))
        _, m2 = trainer.train_step(state2, batch)
        assert float(m1["loss"]) != float(m2["loss"])

        model0, _, _ = self._batch_and_models(0.0)
        trainer0 = Trainer(model0, donate=False)
        state0 = trainer0.init_state(batch, seed=0)
        _, n1 = trainer0.train_step(state0, batch)
        _, n2 = trainer0.train_step(
            state0.replace(rng=jax.random.fold_in(state0.rng, 1)), batch)
        assert float(n1["loss"]) == float(n2["loss"])


class TestCLIDropout:
    # the DP variant needs batch % 8 == 0 on the 8-device test mesh; it
    # exercises the shard_map path's per-shard rng fold_in decorrelation
    @pytest.mark.parametrize("extra", [["--batch_size", "4"],
                                       ["--batch_size", "8",
                                        "--data_parallel"]],
                             ids=["single", "dp"])
    def test_train_with_attn_drop_learns(self, tmp_path, extra):
        """The last untested reference flag gets a runtime test: a tiny
        --attn_drop 0.1 run must keep every loss finite and end below its
        starting loss (reference flag: utils.py attn_drop; applied at
        multihead_attention.py:70)."""
        import json

        from dostransformer_tpu.cli import main_phdos

        log = tmp_path / "log.jsonl"
        result = main_phdos.main([
            "--synthetic", "32", "--epochs", "8", "--eval", "4",
            "--hidden", "32", "--layers", "2", "--transformer", "1",
            "--attn_drop", "0.1",
            "--results_dir", str(tmp_path), "--log_jsonl", str(log), *extra])
        assert result["test"] is not None
        assert np.isfinite(result["test"]["rmse"])
        losses = [r["loss"] for r in map(json.loads, log.open())
                  if "loss" in r]
        assert len(losses) == 8
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
