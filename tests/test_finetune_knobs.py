"""Fine-tuning optimizer extensions (default-off; reference parity is the
fixed-lr no-clip optax.adamw path, unchanged)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dostransformer_tpu.train.trainer import make_adamw


def _one_param_updates(tx, grads_seq, param=1.0):
    params = {"w": jnp.asarray(param)}
    state = tx.init(params)
    deltas = []
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        deltas.append(float(updates["w"]))
        params = optax.apply_updates(params, updates)
    return deltas


class TestFinetuneKnobs:
    def test_default_is_plain_adamw(self):
        """No kwargs -> bit-identical to the reference-parity optimizer."""
        a = _one_param_updates(make_adamw(1e-3), [0.5, -0.25, 1.0])
        b = _one_param_updates(
            optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2,
                        mu_dtype=jnp.bfloat16), [0.5, -0.25, 1.0])
        np.testing.assert_array_equal(a, b)

    def test_grad_clip_bounds_update(self):
        """A 1e6x larger gradient must produce the same clipped update."""
        small = _one_param_updates(make_adamw(1e-3, grad_clip=1.0), [1.0])
        huge = _one_param_updates(make_adamw(1e-3, grad_clip=1.0), [1e6])
        np.testing.assert_allclose(small, huge, rtol=1e-5)

    def test_warmup_ramps_from_zero(self):
        tx = make_adamw(1e-3, weight_decay=0.0, mu_dtype=None,
                        warmup_steps=10)
        deltas = _one_param_updates(tx, [1.0] * 12)
        # step 0 lr==0 -> zero update; by the end of warmup the update
        # reaches the full Adam step size (~lr, since grads are constant)
        assert deltas[0] == 0.0
        assert abs(deltas[11]) > abs(deltas[2]) > 0
        np.testing.assert_allclose(abs(deltas[11]), 1e-3, rtol=0.05)

    def test_cosine_decays_to_zero(self):
        tx = make_adamw(1e-3, weight_decay=0.0, mu_dtype=None,
                        cosine_decay_steps=20)
        deltas = _one_param_updates(tx, [1.0] * 20)
        # starts at peak (no warmup), decays monotonically toward 0
        np.testing.assert_allclose(abs(deltas[0]), 1e-3, rtol=0.05)
        assert abs(deltas[19]) < 0.1 * abs(deltas[0])

    def test_warmup_plus_cosine(self):
        tx = make_adamw(1e-3, weight_decay=0.0, mu_dtype=None,
                        warmup_steps=5, cosine_decay_steps=15)
        deltas = _one_param_updates(tx, [1.0] * 20)
        assert deltas[0] == 0.0
        peak = max(abs(d) for d in deltas)
        np.testing.assert_allclose(peak, 1e-3, rtol=0.05)
        assert abs(deltas[19]) < 0.15 * peak

    def test_cli_smoke(self, tmp_path):
        from dostransformer_tpu.cli import main_phdos

        main_phdos.main(
            ["--synthetic", "16", "--epochs", "2", "--eval", "2",
             "--layers", "1", "--transformer", "1", "--hidden", "16",
             "--batch_size", "4", "--grad_clip", "1.0",
             "--warmup_epochs", "1", "--cosine_lr",
             "--results_dir", str(tmp_path)])
