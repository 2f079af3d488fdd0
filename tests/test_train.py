"""Training-subsystem tests: loss/metric reference semantics, the early-stop
state machine, trainer integration (loss decreases), and distributed
equivalence on the virtual 8-device mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dostransformer_tpu.data import synthetic_edos_samples, synthetic_phdos_samples
from dostransformer_tpu.data.datasets import GraphLoader
from dostransformer_tpu.models import DOSTransformerEDOS
from dostransformer_tpu.models.registry import build_model
from dostransformer_tpu.parallel.mesh import make_mesh
from dostransformer_tpu.train.early_stop import BestTracker
from dostransformer_tpu.train.loss import clamp_negative, dos_loss, per_sample_rmse
from dostransformer_tpu.train.metrics import (
    MetricAccumulator,
    eval_metrics,
    r2_variance_weighted,
)
from dostransformer_tpu.train.trainer import Trainer


class TestLoss:
    def test_reference_formula(self):
        # loss = mean_b sqrt(mean_e (y-g)^2) + beta * mean_b sqrt(mean_e (y-s)^2)
        rng = np.random.RandomState(0)
        y = rng.randn(4, 7).astype(np.float32)
        g = rng.randn(4, 7).astype(np.float32)
        s = rng.randn(4, 7).astype(np.float32)
        yc = np.where(y < 0, 0, y)
        want = (np.sqrt(((yc - g) ** 2).mean(1)).mean()
                + 2.5 * np.sqrt(((yc - s) ** 2).mean(1)).mean())
        got, aux = dos_loss(jnp.array(g), jnp.array(s), jnp.array(y),
                            jnp.ones(4), beta=2.5, clamp_targets=True)
        np.testing.assert_allclose(float(got), want, rtol=1e-6)

    def test_dummy_graphs_excluded(self):
        y = jnp.ones((3, 5))
        g = jnp.zeros((3, 5))
        mask = jnp.array([1.0, 1.0, 0.0])
        loss, _ = dos_loss(g, None, y, mask, clamp_targets=False)
        np.testing.assert_allclose(float(loss), 1.0, rtol=1e-6)

    def test_single_head(self):
        y = jnp.zeros((2, 3))
        g = jnp.ones((2, 3)) * 2.0
        loss, aux = dos_loss(g, None, y, jnp.ones(2), beta=1.0,
                             clamp_targets=False)
        np.testing.assert_allclose(float(loss), 2.0, rtol=1e-6)

    def test_clamp(self):
        np.testing.assert_array_equal(
            np.asarray(clamp_negative(jnp.array([-1.0, 0.0, 2.0]))),
            [0.0, 0.0, 2.0])


class TestMetrics:
    def test_r2_matches_sklearn(self):
        from sklearn.metrics import r2_score

        rng = np.random.RandomState(1)
        y, p = rng.randn(201), rng.randn(201)
        want = r2_score(y.flatten(), p.flatten(),
                        multioutput="variance_weighted")
        assert r2_variance_weighted(y, p) == pytest.approx(want, rel=1e-9)

    def test_eval_clamp_asymmetry(self):
        # eDOS test() clamps y AND preds (utils.py:74-76); phDOS doesn't
        y = jnp.array([[-1.0, 1.0]])
        p = jnp.array([[-2.0, 1.0]])
        m_edos = eval_metrics(p, y, clamp=True)
        m_ph = eval_metrics(p, y, clamp=False)
        assert float(m_edos["rmse"][0]) == pytest.approx(0.0)
        assert float(m_ph["rmse"][0]) == pytest.approx(np.sqrt(0.5))

    def test_accumulator_per_sample_mean(self):
        acc = MetricAccumulator()
        # one batch of two real samples + one dummy (mask 0): the dummy's
        # values must not contaminate the means
        acc.update({"rmse": np.array([1.0, 3.0, 99.0]),
                    "mse": np.array([1.0, 3.0, 99.0]),
                    "mae": np.array([1.0, 3.0, 99.0]),
                    "mask": np.array([1.0, 1.0, 0.0]),
                    "y": np.array([[1.0, 2.0]] * 3),
                    "preds": np.array([[1.0, 2.0]] * 3)})
        r = acc.result()
        assert r["rmse"] == pytest.approx(2.0)
        assert r["r2"] == pytest.approx(1.0)

    def test_accumulator_batched_equals_per_sample(self):
        # feeding N batch-1 updates or one batch-N update must agree
        rng = np.random.RandomState(0)
        rmse = rng.rand(6)
        ys = rng.rand(6, 5)
        ps = rng.rand(6, 5)
        a, b = MetricAccumulator(), MetricAccumulator()
        for i in range(6):
            a.update({"rmse": rmse[i:i+1], "mse": rmse[i:i+1],
                      "mae": rmse[i:i+1], "mask": np.ones(1),
                      "y": ys[i:i+1], "preds": ps[i:i+1]})
        b.update({"rmse": rmse, "mse": rmse, "mae": rmse,
                  "mask": np.ones(6), "y": ys, "preds": ps})
        for k in ("rmse", "r2"):
            assert a.result()[k] == pytest.approx(b.result()[k])


class TestEarlyStop:
    def test_three_branches(self):
        t = BestTracker(es=50, eval_every=5)
        assert t.update(1, 0.5, 0.5)          # both improve
        assert t.update(2, 0.4, 0.6)          # rmse improves only
        assert t.best_rmse == 0.4 and t.best_mae == 0.5
        assert t.update(3, 0.45, 0.4)         # mae improves only
        assert t.best_rmse == 0.4 and t.best_mae == 0.4
        assert not t.update(4, 0.5, 0.5)      # neither

    def test_exact_ties_fire_no_branch(self):
        # Reference main_eDOS.py:140-157: three sequential strict-inequality
        # branches; at valid_rmse == best_rmse or valid_mae == best_mae
        # exactly, no branch fires — no best update, no test eval.
        t = BestTracker(es=50, eval_every=5)
        assert t.update(1, 0.5, 0.5)
        # rmse ties exactly, mae improves -> reference runs NO test eval
        assert not t.update(2, 0.5, 0.4)
        assert t.best_rmse == 0.5 and t.best_mae == 0.5 and t.best_epoch == 1
        # mae ties exactly, rmse improves -> branch 2 needs mae strictly >
        assert not t.update(3, 0.4, 0.5)
        assert t.best_rmse == 0.5 and t.best_mae == 0.5 and t.best_epoch == 1
        # both tie exactly -> nothing
        assert not t.update(4, 0.5, 0.5)
        assert t.best_epoch == 1

    def test_plateau_stop(self):
        # es=50, eval=5: stop once best_rmse unchanged across 10 evals
        t = BestTracker(es=50, eval_every=5)
        t.update(1, 0.3, 0.3)
        stops = [t.step_and_should_stop() for _ in range(11)]
        assert not any(stops[:10])
        assert stops[10]

    def test_improvement_resets_plateau(self):
        # es=10, eval=5 -> stop when best_losses[-1] == best_losses[-es//5=-2]
        # once len > es/eval = 2 (reference main_eDOS.py:159-163)
        t = BestTracker(es=10, eval_every=5)
        t.update(1, 0.5, 0.5)
        assert not t.step_and_should_stop()   # [0.5]: len <= 2
        t.update(2, 0.4, 0.4)
        assert not t.step_and_should_stop()   # [0.5, 0.4]: len <= 2
        t.update(3, 0.3, 0.3)
        assert not t.step_and_should_stop()   # [0.5, 0.4, 0.3]: -1 != -2
        assert t.step_and_should_stop()       # [0.5, 0.4, 0.3, 0.3]


@pytest.fixture(scope="module")
def tiny_edos():
    samples = synthetic_edos_samples(16, seed=0)
    loader = GraphLoader(samples, batch_size=8, shuffle=True, seed=0)
    return samples, loader


class TestTrainerIntegration:
    def test_loss_decreases(self, tiny_edos):
        _, loader = tiny_edos
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)
        tr = Trainer(model)
        state = tr.init_state(next(iter(loader)))
        first = last = None
        for epoch in range(5):
            for batch in loader:
                state, m = tr.train_step(state, batch)
                if first is None:
                    first = float(m["loss"])
                last = float(m["loss"])
        assert last < first

    def test_bf16_trains_and_tracks_f32(self, tiny_edos):
        """bf16 end-to-end regression guard (BASELINE.md: bf16 RMSE is
        validated within 1% of f32 on the TPU convergence demo): the bf16
        model must train (loss decreases, stays finite) and its first-step
        loss must sit near the f32 one — a silent dtype bug (e.g. a f32
        cast dropping out) would blow this tolerance."""
        _, loader = tiny_edos
        batches = list(loader)
        losses = {}
        for dtype in ("float32", "bfloat16"):
            model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                       dtype=dtype)
            tr = Trainer(model, donate=False)
            state = tr.init_state(batches[0], seed=0)
            traj = []
            for _ in range(6):
                for b in batches:
                    state, m = tr.train_step(state, b)
                    traj.append(float(m["loss"]))
            losses[dtype] = traj
        bf = np.asarray(losses["bfloat16"])
        f32 = np.asarray(losses["float32"])
        assert np.isfinite(bf).all()
        assert bf[-1] < bf[0]
        np.testing.assert_allclose(bf[0], f32[0], rtol=0.03)

    def test_baseline_families_train(self, tiny_edos):
        _, loader = tiny_edos
        batch = next(iter(loader))
        for name in ("graphnetwork", "graphnetwork2", "mlp", "mlp2"):
            model = build_model("edos", name, layers=2, hidden=32)
            tr = Trainer(model)
            state = tr.init_state(batch)
            state, m = tr.train_step(state, batch)
            assert np.isfinite(float(m["loss"])), name
            em = tr.eval_step(state.params, batch)
            assert np.isfinite(np.asarray(em["rmse"])).all(), name

    def test_phdos_baselines_train(self):
        samples = synthetic_phdos_samples(8, seed=1)
        loader = GraphLoader(samples, batch_size=4)
        batch = next(iter(loader))
        for name in ("graphnetwork", "graphnetwork2", "mlp", "mlp2"):
            model = build_model("phdos", name, layers=2, hidden=32)
            tr = Trainer(model, clamp_targets=False, eval_clamp=False)
            state = tr.init_state(batch)
            state, m = tr.train_step(state, batch)
            assert np.isfinite(float(m["loss"])), name


class TestConvergence:
    def test_beats_mean_predictor_on_learnable_task(self):
        """Overfit 8 samples whose targets are a deterministic function of
        the crystal-system id: train RMSE must drop well below the best
        constant (mean) predictor — evidence of real function fitting, not
        just loss-goes-down noise. Uses the mlp family (fastest learner;
        the flagship's deep pre-LN stack needs ~150 epochs to break its
        plateau — verified manually, too slow for the default suite)."""
        from dostransformer_tpu.models.mlp import MLPEDOS
        from dostransformer_tpu.train.trainer import make_adamw

        samples = synthetic_edos_samples(8, seed=4)
        grid = np.linspace(0, 1, 201)
        for s in samples:
            c = (s.system + 1) / 9.0
            y = np.exp(-((grid - c) ** 2) / 0.01).astype(np.float32) + 0.05
            s.y = y / y.max()
        ys = np.stack([s.y for s in samples])
        baseline_rmse = float(np.sqrt(
            ((ys - ys.mean(0, keepdims=True)) ** 2).mean(1)).mean())

        loader = GraphLoader(samples, batch_size=8)
        tr = Trainer(MLPEDOS(hidden=64), tx=make_adamw(1e-3))
        state = tr.init_state(next(iter(loader)))
        rmse = None
        for _ in range(80):
            state, losses = tr.train_epoch(state, list(loader))
            rmse = float(np.asarray(losses).mean())
        assert rmse < 0.65 * baseline_rmse, (rmse, baseline_rmse)


class TestRemat:
    def test_remat_matches_no_remat(self, tiny_edos):
        """remat=True recomputes activations in the backward pass — outputs,
        loss, and gradients must be identical."""
        _, loader = tiny_edos
        batch = next(iter(loader))
        m0 = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)
        m1 = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32, remat=True)
        params = m0.init(jax.random.PRNGKey(0), batch)

        out0 = m0.apply(params, batch)
        out1 = m1.apply(params, batch)
        np.testing.assert_allclose(np.asarray(out0[0]), np.asarray(out1[0]),
                                   rtol=1e-6)

        def loss(m):
            def f(p):
                dg, _, ds = m.apply({"params": p}, batch)
                return ((batch.y - dg) ** 2).mean() + ((batch.y - ds) ** 2).mean()
            return f

        g0 = jax.grad(loss(m0))(params["params"])
        g1 = jax.grad(loss(m1))(params["params"])
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


class TestCompilerOptions:
    def test_env_parsing(self, monkeypatch):
        from dostransformer_tpu.train.trainer import compiler_options_from_env

        monkeypatch.setenv(
            "DOSTPU_COMPILER_OPTIONS",
            "xla_tpu_scoped_vmem_limit_kib=65536, xla_flag_b=TRUE,"
            "xla_flag_f=1.5,xla_flag_s=enabled:foo")
        assert compiler_options_from_env() == {
            "xla_tpu_scoped_vmem_limit_kib": 65536,
            "xla_flag_b": True,
            "xla_flag_f": 1.5,
            "xla_flag_s": "enabled:foo",
        }
        monkeypatch.setenv("DOSTPU_COMPILER_OPTIONS", "")
        assert compiler_options_from_env() is None
        monkeypatch.setenv("DOSTPU_COMPILER_OPTIONS", "notapair")
        with pytest.raises(ValueError):
            compiler_options_from_env()

    def test_train_step_runs_under_override(self, tiny_edos, monkeypatch):
        """A valid backend option rides Trainer's jits end-to-end, and the
        numerics are unchanged (overrides only retune the compiler)."""
        _, loader = tiny_edos
        batch = next(iter(loader))
        model = DOSTransformerEDOS(layers=1, t_layers=1, hidden=32)

        tr0 = Trainer(model, donate=False)
        s0, m0 = tr0.train_step(tr0.init_state(batch, seed=0), batch)

        monkeypatch.setenv("DOSTPU_COMPILER_OPTIONS",
                           "xla_cpu_enable_fast_math=false")
        tr1 = Trainer(model, donate=False)
        s1, m1 = tr1.train_step(tr1.init_state(batch, seed=0), batch)
        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                                   rtol=1e-6)

    def test_unknown_option_fails_loudly(self, tiny_edos, monkeypatch):
        _, loader = tiny_edos
        batch = next(iter(loader))
        model = DOSTransformerEDOS(layers=1, t_layers=1, hidden=32)
        monkeypatch.setenv("DOSTPU_COMPILER_OPTIONS", "xla_no_such_option=1")
        tr = Trainer(model, donate=False)
        with pytest.raises(Exception, match="(?i)no such|invalid|unknown"):
            tr.train_step(tr.init_state(batch, seed=0), batch)


class TestScanEpoch:
    def test_matches_per_step(self, tiny_edos):
        """The scan-compiled epoch must produce the same loss trajectory as
        per-step dispatch."""
        _, loader = tiny_edos
        batches = list(loader)
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)
        tr = Trainer(model, donate=False)

        s_a = tr.init_state(batches[0], seed=0)
        losses_a = []
        for b in batches:
            s_a, m = tr.train_step(s_a, b)
            losses_a.append(float(m["loss"]))

        s_b = tr.init_state(batches[0], seed=0)
        s_b, losses_b = tr.train_epoch(s_b, batches)
        np.testing.assert_allclose(losses_a, np.asarray(losses_b), rtol=1e-5)
        # parameters end up identical too
        for pa, pb in zip(jax.tree.leaves(s_a.params),
                          jax.tree.leaves(s_b.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=2e-4, atol=1e-6)


class TestDeviceDataset:
    def test_trains_and_handles_ragged_n(self):
        """Device-resident pipeline: N not divisible by B pads with dummy
        graphs; every real sample is seen each epoch; loss decreases."""
        from dostransformer_tpu.train.device_dataset import DeviceDataset

        samples = synthetic_edos_samples(11, seed=6)  # 11 % 4 != 0
        dds = DeviceDataset.from_samples(samples, batch_size=4)
        assert dds.num_samples == 12 and dds.steps_per_epoch == 3
        assert float(dds.data.graph_mask.sum()) == 11.0

        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)
        tr = Trainer(model)
        from dostransformer_tpu.data.graph import collate

        state = tr.init_state(collate(samples[:4]))
        rng = jax.random.PRNGKey(0)
        first = last = None
        for _ in range(3):
            state, losses, rng = tr.train_epoch_device(state, dds, rng)
            if first is None:
                first = float(losses.mean())
            last = float(losses.mean())
        assert last < first

    def test_deterministic_given_rng(self):
        from dostransformer_tpu.train.device_dataset import DeviceDataset
        from dostransformer_tpu.data.graph import collate

        samples = synthetic_edos_samples(8, seed=7)
        dds = DeviceDataset.from_samples(samples, batch_size=4)
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)
        tr = Trainer(model, donate=False)
        out = []
        for _ in range(2):
            state = tr.init_state(collate(samples[:4]), seed=0)
            rng = jax.random.PRNGKey(3)
            state, losses, rng = tr.train_epoch_device(state, dds, rng)
            out.append(np.asarray(losses))
        np.testing.assert_array_equal(out[0], out[1])

    def test_tensorboard_writer_roundtrip(self, tmp_path):
        """The dependency-free TensorBoard writer must produce valid TFRecord
        framing (crc-checked) and Event protos that parse back to the
        written scalars (train/tensorboard.py)."""
        from dostransformer_tpu.train.tensorboard import (SummaryWriter,
                                                          read_events)

        w = SummaryWriter(str(tmp_path))
        w.add_scalars(1, {"train/loss": 0.5, "valid/rmse": 0.25})
        w.add_scalars(2, {"train/loss": 0.25})
        w.close()

        events = read_events(w.path)   # crc-verified parse
        assert events[0][1] == {}      # file_version header event
        assert events[1] == (1, {"train/loss": 0.5, "valid/rmse": 0.25})
        assert events[2] == (2, {"train/loss": 0.25})

    def test_eval_epoch_matches_per_batch(self):
        """Scan-compiled eval (one dispatch) must reproduce per-batch
        eval_step outputs exactly — the CLI's run_eval contract."""
        from dostransformer_tpu.data.graph import collate

        samples = synthetic_edos_samples(16, seed=9)
        loader = GraphLoader(samples, batch_size=4)
        batches = list(loader)
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)
        tr = Trainer(model)
        params = tr.init_state(collate(samples[:4])).params

        stacked_ms = tr.eval_epoch(params, batches)
        for i, b in enumerate(batches):
            m = tr.eval_step(params, b)
            for k in m:
                np.testing.assert_allclose(
                    np.asarray(stacked_ms[k][i]), np.asarray(m[k]),
                    rtol=1e-6, atol=1e-7, err_msg=k)

    def test_eval_epoch_under_dp(self, tiny_edos):
        """eval_epoch under the DP mesh matches the single-device result."""
        samples = synthetic_edos_samples(16, seed=9)
        loader = GraphLoader(samples, batch_size=8)
        batches = list(loader)
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                   use_pallas=False)
        tr1 = Trainer(model)
        params = tr1.init_state(batches[0]).params
        ms1 = tr1.eval_epoch(params, batches)

        mesh = make_mesh(axes=("data",))
        tr8 = Trainer(model, mesh=mesh)
        ms8 = tr8.eval_epoch(params, batches)
        for k in ms1:
            np.testing.assert_allclose(np.asarray(ms1[k]),
                                       np.asarray(ms8[k]),
                                       rtol=2e-4, atol=1e-6, err_msg=k)

    def test_fused_adamw_matches_optax(self):
        """The shape-grouped fused AdamW (train/fused_adamw.py — OPT-IN, the
        default stays optax after it measured slower end-to-end) must
        reproduce the optax.adamw trajectory — same torch semantics
        (decoupled wd on all params, bf16 first moment), different kernel
        layout only."""
        from dostransformer_tpu.data.graph import collate
        from dostransformer_tpu.train.fused_adamw import FusedAdamW
        from dostransformer_tpu.train.trainer import make_adamw

        samples = synthetic_edos_samples(8, seed=3)
        batch = collate(samples)
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)

        tr_opt = Trainer(model, tx=make_adamw(), donate=False)
        tr_fus = Trainer(model, tx=FusedAdamW(), donate=False)
        s_opt = tr_opt.init_state(batch, seed=0)
        s_fus = tr_fus.init_state(batch, seed=0)

        for _ in range(5):
            s_opt, m_opt = tr_opt.train_step(s_opt, batch)
            s_fus, m_fus = tr_fus.train_step(s_fus, batch)
            np.testing.assert_allclose(float(m_opt["loss"]),
                                       float(m_fus["loss"]), rtol=1e-6)
        # the optimizer math itself is bitwise-identical to optax (same op
        # order, same weak-scalar bf16 promotion, integer-exponent bias
        # correction); the residual tolerance absorbs backward-pass fusion
        # differences between the two compiled train steps (~1 ulp/step)
        for a, b in zip(jax.tree.leaves(s_opt.params),
                        jax.tree.leaves(s_fus.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=1e-6)

    def test_fused_adamw_resume_into_fresh_instance(self):
        """Checkpoint-resume path (ADVICE r2): a FRESH FusedAdamW (no init()
        call) must consume a restored opt_state — the grouping metadata is
        rebuilt lazily from the param tree — and continue the trajectory
        identically to the original instance."""
        from dostransformer_tpu.data.graph import collate
        from dostransformer_tpu.train.fused_adamw import FusedAdamW

        samples = synthetic_edos_samples(8, seed=3)
        batch = collate(samples)
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)

        tr1 = Trainer(model, tx=FusedAdamW(), donate=False)
        s = tr1.init_state(batch, seed=0)
        s, _ = tr1.train_step(s, batch)

        # "restore": hand the live state to a brand-new optimizer/Trainer
        tr2 = Trainer(model, tx=FusedAdamW(), donate=False)
        s1, m1 = tr1.train_step(s, batch)
        s2, m2 = tr2.train_step(s, batch)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=0, atol=0)
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fused_adamw_checkpoint_roundtrip(self, tmp_path):
        """FusedAdamW's stacked-group opt_state must survive an orbax
        save/restore into a FRESH Trainer (ADVICE r2: the layout differs
        from optax's per-leaf trees) and continue identically."""
        from dostransformer_tpu.data.graph import collate
        from dostransformer_tpu.train.checkpoint import CheckpointManager
        from dostransformer_tpu.train.fused_adamw import FusedAdamW

        samples = synthetic_edos_samples(8, seed=3)
        batch = collate(samples)
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)

        tr1 = Trainer(model, tx=FusedAdamW(), donate=False)
        s = tr1.init_state(batch, seed=0)
        s, _ = tr1.train_step(s, batch)
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(1, s)

        tr2 = Trainer(model, tx=FusedAdamW(), donate=False)
        template = tr2.init_state(batch, seed=0)
        restored, epoch, _ = mgr.restore(template)
        assert epoch == 1
        for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        s1, m1 = tr1.train_step(s, batch)
        s2, m2 = tr2.train_step(restored, batch)
        assert float(m1["loss"]) == float(m2["loss"])
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_multi_epoch_dispatch_matches_sequential(self):
        """train_epochs_device (E epochs, ONE dispatch) must replay the exact
        data order of E sequential train_epoch_device dispatches when fed the
        same per-epoch fold_in keys — the CLI's eval-interval dispatch
        contract (cli/common.py)."""
        import jax.numpy as jnp

        from dostransformer_tpu.data.graph import collate
        from dostransformer_tpu.train.device_dataset import DeviceDataset

        samples = synthetic_edos_samples(8, seed=7)
        dds = DeviceDataset.from_samples(samples, batch_size=4)
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)
        tr = Trainer(model, donate=False)
        base = jax.random.PRNGKey(11)

        state = tr.init_state(collate(samples[:4]), seed=0)
        seq = []
        for e in range(3):
            state, losses, _ = tr.train_epoch_device(
                state, dds, jax.random.fold_in(base, e))
            seq.append(np.asarray(losses))

        state2 = tr.init_state(collate(samples[:4]), seed=0)
        keys = jnp.stack([jax.random.fold_in(base, e) for e in range(3)])
        state2, losses2 = tr.train_epochs_device(state2, dds, keys)
        assert losses2.shape == (3, dds.steps_per_epoch)
        np.testing.assert_array_equal(np.stack(seq), np.asarray(losses2))
        np.testing.assert_array_equal(np.asarray(state.step),
                                      np.asarray(state2.step))



    def test_from_samples_uploads_straight_into_dp_sharding(self):
        """DeviceDataset.from_samples(sharding=trainer.dataset_sharding())
        must land sample-axis sharded WITHOUT a device-0 staging copy of the
        whole dataset (the pod memory layout), with values identical to the
        host collate and training results identical to the replicated-upload
        path."""
        from dostransformer_tpu.data.graph import collate
        from dostransformer_tpu.train.device_dataset import DeviceDataset

        samples = synthetic_edos_samples(16, seed=8)
        mesh = make_mesh(axes=("data",))
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                   use_pallas=False)
        # donate=False: the same initial state is dispatched twice below
        tr = Trainer(model, mesh=mesh, donate=False)
        assert str(tr.dataset_sharding().spec) == "PartitionSpec('data',)"

        dds = DeviceDataset.from_samples(samples, batch_size=8,
                                         sharding=tr.dataset_sharding())
        assert str(dds.data.nodes.sharding.spec) == "PartitionSpec('data',)"
        host = collate(samples, num_graphs=16, numpy=True)
        np.testing.assert_array_equal(np.asarray(dds.data.nodes), host.nodes)
        np.testing.assert_array_equal(np.asarray(dds.data.y), host.y)

        # same training trajectory as the default-device upload
        dds_default = DeviceDataset.from_samples(samples, batch_size=8)
        state = tr.init_state(collate(samples[:8]))
        rng = jax.random.PRNGKey(3)
        s1, l1, _ = tr.train_epoch_device(state, dds, rng)
        s2, l2, _ = tr.train_epoch_device(state, dds_default, rng)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-6, atol=1e-7)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
            s1.params, s2.params)


class TestDistributed:
    """The TPU-native fake-backend analogue (SURVEY.md §4): the same train
    step on 1 device and on the 8-device mesh must agree."""

    def test_dp_matches_single_device(self, tiny_edos):
        _, loader = tiny_edos
        batch = next(iter(loader))
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                   use_pallas=False)

        tr1 = Trainer(model, donate=False)
        s1 = tr1.init_state(batch, seed=0)

        mesh = make_mesh(axes=("data",))
        assert mesh.devices.size == 8
        tr8 = Trainer(model, mesh=mesh, donate=False)
        s8 = tr8.init_state(batch, seed=0)

        losses1, losses8 = [], []
        for _ in range(3):
            s1, m1 = tr1.train_step(s1, batch)
            s8, m8 = tr8.train_step(s8, batch)
            losses1.append(float(m1["loss"]))
            losses8.append(float(m8["loss"]))
        np.testing.assert_allclose(losses1, losses8, rtol=2e-4)

    def test_dp_tp_matches_single_device(self, tiny_edos):
        """dp x tp over a 2-D (data=2, model=4) mesh: FFN kernels sharded in
        the Megatron layout (explicit tp_enter/tp_exit collectives inside
        the shard_map step); loss trajectory must match single-device.
        tp_axis='model' is a no-op on the single-device trainer (axis
        unbound), so ONE model serves both."""
        _, loader = tiny_edos
        batch = next(iter(loader))
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                   use_pallas=False, tp_axis="model")

        tr1 = Trainer(model, donate=False)
        s1 = tr1.init_state(batch, seed=0)

        mesh = make_mesh(shape=(2, 4), axes=("data", "model"))
        tr_tp = Trainer(model, mesh=mesh, donate=False)
        s_tp = tr_tp.init_state(batch, seed=0)

        # fc1 kernel is column-sharded over 'model'
        fc1 = s_tp.params["transformer"]["layer0"]["fc1"]["kernel"]
        assert fc1.sharding.spec == jax.sharding.PartitionSpec(None, "model")

        l1, ltp = [], []
        for _ in range(3):
            s1, m1 = tr1.train_step(s1, batch)
            s_tp, mtp = tr_tp.train_step(s_tp, batch)
            l1.append(float(m1["loss"]))
            ltp.append(float(mtp["loss"]))
        np.testing.assert_allclose(l1, ltp, rtol=2e-4)

    def test_scan_epoch_under_dp_tp_mesh(self, tiny_edos):
        """The scan-compiled epoch must also run under the 2-D dp x tp mesh
        (stacked batches shard P(None, 'data'); TP params stay sharded)."""
        _, loader = tiny_edos
        batches = list(loader)
        mesh = make_mesh(shape=(2, 4), axes=("data", "model"))
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                   use_pallas=False, use_fused_mp=False,
                                   tp_axis="model")
        tr = Trainer(model, mesh=mesh)
        state = tr.init_state(batches[0], seed=0)
        state, losses = tr.train_epoch(state, batches)
        assert np.isfinite(np.asarray(losses)).all()
        fc1 = state.params["transformer"]["layer0"]["fc1"]["kernel"]
        assert fc1.sharding.spec == jax.sharding.PartitionSpec(None, "model")

    def test_dp_with_pallas_matches_single_device(self, tiny_edos):
        """Pallas kernels under the DP shard_map path (VERDICT round 1 #2):
        fused attention + fused message passing must produce the same loss
        trajectory as the single-device run. Under shard_map each device's
        pallas_call sees the local batch shard — the layout a real pod uses
        (interpret mode on the CPU mesh stands in for the TPU lowering)."""
        _, loader = tiny_edos
        batch = next(iter(loader))
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=128,
                                   use_pallas=True, use_fused_mp=True)

        tr1 = Trainer(model, donate=False)
        s1 = tr1.init_state(batch, seed=0)
        mesh = make_mesh(axes=("data",))
        tr8 = Trainer(model, mesh=mesh, donate=False)
        s8 = tr8.init_state(batch, seed=0)

        losses1, losses8 = [], []
        for _ in range(3):
            s1, m1 = tr1.train_step(s1, batch)
            s8, m8 = tr8.train_step(s8, batch)
            losses1.append(float(m1["loss"]))
            losses8.append(float(m8["loss"]))
        np.testing.assert_allclose(losses1, losses8, rtol=2e-4)

    def test_device_epoch_under_dp(self, tiny_edos):
        """Device-resident epochs under the DP mesh: the dataset's SAMPLE
        axis is sharded over 'data' — each device holds only its 1/N block
        and shuffles it locally (the pod memory layout, VERDICT r2 #3).
        Differential oracle: reproduce the shard-local permutation scheme on
        the host, assemble the global batches explicitly, and run them
        through the single-device trainer — losses and params must match."""
        from dostransformer_tpu.train.device_dataset import DeviceDataset

        samples = synthetic_edos_samples(16, seed=0)
        dds = DeviceDataset.from_samples(samples, batch_size=8)
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                   use_pallas=False)
        batch0 = next(iter(GraphLoader(samples[:8], batch_size=8)))
        key = jax.random.PRNGKey(3)

        mesh = make_mesh(axes=("data",))
        n_sh = mesh.devices.size
        tr8 = Trainer(model, mesh=mesh, donate=False)
        s8 = tr8.init_state(batch0, seed=0)
        # placement: each device holds only its sample block
        placed = tr8.place_dataset(dds)
        assert placed.nodes.sharding.spec == jax.sharding.PartitionSpec("data")
        s8, losses8, _ = tr8.train_epoch_device(s8, dds, key)

        # host oracle: per-device local perms (same derivation as
        # trainer._shard_perm), global batch = concat of shard-local slices
        steps, local_b = dds.steps_per_epoch, dds.batch_size // n_sh
        n_local = dds.num_samples // n_sh
        data_np = jax.tree.map(np.asarray, dds.data)
        gathered = []
        for d in range(n_sh):
            sub = jax.random.split(jax.random.fold_in(key, d))[1]
            perm = np.asarray(jax.random.permutation(
                sub, steps * local_b)).reshape(steps, local_b)
            gathered.append(jax.tree.map(
                lambda x: x[d * n_local:(d + 1) * n_local][perm], data_np))
        batches = jax.tree.map(
            lambda *xs: np.concatenate(xs, axis=1), *gathered)

        tr1 = Trainer(model, donate=False)
        s1 = tr1.init_state(batch0, seed=0)
        losses1 = []
        for t in range(steps):
            s1, m = tr1.train_step(s1, jax.tree.map(lambda x: x[t], batches))
            losses1.append(float(m["loss"]))
        np.testing.assert_allclose(np.asarray(losses1), np.asarray(losses8),
                                   rtol=2e-4)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)

    def test_multi_epoch_dispatch_under_dp(self, tiny_edos):
        """The multi-epoch dispatch must agree with sequential single-epoch
        dispatches under the DP shard_map too (same fold_in keys)."""
        import jax.numpy as jnp

        from dostransformer_tpu.train.device_dataset import DeviceDataset

        samples = synthetic_edos_samples(16, seed=0)
        dds = DeviceDataset.from_samples(samples, batch_size=8)
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                   use_pallas=False)
        batch0 = next(iter(GraphLoader(samples[:8], batch_size=8)))
        mesh = make_mesh(axes=("data",))
        base = jax.random.PRNGKey(5)

        tr = Trainer(model, mesh=mesh, donate=False)
        s = tr.init_state(batch0, seed=0)
        seq = []
        for e in range(2):
            s, losses, _ = tr.train_epoch_device(
                s, dds, jax.random.fold_in(base, e))
            seq.append(np.asarray(losses))

        s2 = tr.init_state(batch0, seed=0)
        keys = jnp.stack([jax.random.fold_in(base, e) for e in range(2)])
        s2, losses2 = tr.train_epochs_device(s2, dds, keys)
        np.testing.assert_allclose(np.stack(seq), np.asarray(losses2),
                                   rtol=2e-4)

    def test_batch_leaves_sharded(self, tiny_edos):
        _, loader = tiny_edos
        batch = next(iter(loader))
        mesh = make_mesh(axes=("data",))
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                   use_pallas=False)
        tr = Trainer(model, mesh=mesh)
        sharded = tr.shard_batch(batch)
        spec = sharded.nodes.sharding.spec
        assert spec == jax.sharding.PartitionSpec("data")


class TestDeviceEpochsUnderTP:
    def test_device_epochs_under_dp_tp_mesh(self):
        """train_epochs_device under the 2-D dp x tp mesh: the dataset's
        sample axis shards over 'data' (replicated across 'model') and each
        data-rank runs shard-local shuffles — the SAME derivation as a pure
        2-device DP mesh, so the dp(2) x tp(4) loss trajectory must equal
        the dp(2) one exactly (same data order, same global math; TP only
        changes how the FFN matmuls are laid out)."""
        import jax.numpy as jnp

        from dostransformer_tpu.data.graph import collate
        from dostransformer_tpu.train.device_dataset import DeviceDataset

        samples = synthetic_edos_samples(8, seed=7)
        # tp_axis='model' is inert on the pure-DP mesh (axis unbound), so
        # one model serves both trainers
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                   use_pallas=False, use_fused_mp=False,
                                   tp_axis="model")
        base = jax.random.PRNGKey(11)
        keys = jnp.stack([jax.random.fold_in(base, e) for e in range(2)])

        mesh_dp = make_mesh(shape=(2,), axes=("data",))
        tr1 = Trainer(model, mesh=mesh_dp, donate=False)
        dds1 = DeviceDataset.from_samples(
            samples, batch_size=4, sharding=tr1.dataset_sharding())
        s1 = tr1.init_state(collate(samples[:4]), seed=0)
        s1, losses1 = tr1.train_epochs_device(s1, dds1, keys)

        mesh = make_mesh(shape=(2, 4), axes=("data", "model"))
        tr_tp = Trainer(model, mesh=mesh, donate=False)
        dds_tp = DeviceDataset.from_samples(
            samples, batch_size=4, sharding=tr_tp.dataset_sharding())
        s_tp = tr_tp.init_state(collate(samples[:4]), seed=0)
        fc1 = s_tp.params["transformer"]["layer0"]["fc1"]["kernel"]
        assert fc1.sharding.spec == jax.sharding.PartitionSpec(None, "model")
        s_tp, losses_tp = tr_tp.train_epochs_device(s_tp, dds_tp, keys)

        np.testing.assert_allclose(np.asarray(losses1),
                                   np.asarray(losses_tp), rtol=2e-4)
        # the updated params must also agree (incl. reassembly of the
        # Megatron-sharded FFN kernels)
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s_tp.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)

    def test_dp_tp_with_pallas_matches_single_device(self):
        """dp x tp with the Pallas attention + fused-MP kernels ON (VERDICT
        r3 weak #5: the old auto-SPMD TP path had to disable them). Explicit
        same-batch steps, so the trajectory must match single-device."""
        from dostransformer_tpu.data.graph import collate

        samples = synthetic_edos_samples(8, seed=9)
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=128,
                                   use_pallas=True, use_fused_mp=True,
                                   tp_axis="model")
        batch = collate(samples)

        tr1 = Trainer(model, donate=False)
        s1 = tr1.init_state(batch, seed=0)
        mesh = make_mesh(shape=(2, 4), axes=("data", "model"))
        tr_tp = Trainer(model, mesh=mesh, donate=False)
        s_tp = tr_tp.init_state(batch, seed=0)

        l1, ltp = [], []
        for _ in range(3):
            s1, m1 = tr1.train_step(s1, batch)
            s_tp, mtp = tr_tp.train_step(s_tp, batch)
            l1.append(float(m1["loss"]))
            ltp.append(float(mtp["loss"]))
        np.testing.assert_allclose(l1, ltp, rtol=2e-4)

    def test_tp_mesh_requires_tp_axis_model(self):
        """A 'model'-axis mesh with a model lacking tp_axis would silently
        skip the Megatron all-reduces — must raise instead."""
        import pytest

        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                   use_pallas=False)
        mesh = make_mesh(shape=(2, 4), axes=("data", "model"))
        with pytest.raises(ValueError, match="tp_axis"):
            Trainer(model, mesh=mesh, donate=False)


class TestBucketedTraining:
    """Bucketed device training (train/device_dataset.py:
    BucketedDeviceDataset): per-atom-bucket shapes instead of the
    dataset-global pad — the training-side analogue of serving's bucketed
    inference (reference N/A: its PyG loader re-pads per ragged batch)."""

    @staticmethod
    def _mixed_samples():
        small = synthetic_edos_samples(10, seed=11, min_atoms=4, max_atoms=10)
        large = synthetic_edos_samples(6, seed=12, min_atoms=40, max_atoms=60)
        return small + large

    def test_partition_covers_every_sample_once(self):
        from dostransformer_tpu.data.graph import bucket_size
        from dostransformer_tpu.train.device_dataset import (
            BucketedDeviceDataset)

        samples = self._mixed_samples()
        b = BucketedDeviceDataset.from_samples(samples, batch_size=4)
        real = sum(float(d.data.graph_mask.sum()) for _, d in b.buckets)
        assert real == len(samples)
        assert [a for a, _ in b.buckets] == sorted(
            {bucket_size(s.n_nodes) for s in samples})
        for a, d in b.buckets:
            assert d.data.nodes.shape[1] == a
            assert d.num_samples % 4 == 0
        assert b.steps_per_epoch == sum(d.steps_per_epoch
                                        for _, d in b.buckets)

    def test_single_bucket_matches_flat_path(self):
        """All samples in one atom bucket: the bucketed epoch must be
        bit-identical to the flat DeviceDataset epoch under the same
        per-bucket rng fold."""
        from dostransformer_tpu.train.device_dataset import (
            BucketedDeviceDataset, DeviceDataset)
        from dostransformer_tpu.data.graph import collate

        # n_nodes 10-15 (atoms + prompt node) -> every sample in bucket 16
        samples = synthetic_edos_samples(8, seed=5, min_atoms=9, max_atoms=14)
        bdds = BucketedDeviceDataset.from_samples(samples, batch_size=4)
        assert len(bdds.buckets) == 1
        flat = DeviceDataset.from_samples(samples, batch_size=4)

        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)
        tr = Trainer(model, donate=False)
        state0 = tr.init_state(collate(samples[:4]), seed=0)
        rng = jax.random.PRNGKey(9)

        sb, lb, _ = tr.train_epoch_buckets(state0, bdds, rng)
        sf, lf, _ = tr.train_epoch_device(state0, flat,
                                          jax.random.fold_in(rng, 0))
        np.testing.assert_array_equal(np.asarray(lb), np.asarray(lf))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            sb.params, sf.params)

    def test_mixed_sizes_train_and_decrease(self):
        from dostransformer_tpu.data.graph import collate
        from dostransformer_tpu.train.device_dataset import (
            BucketedDeviceDataset)

        samples = self._mixed_samples()
        bdds = BucketedDeviceDataset.from_samples(samples, batch_size=4)
        assert len(bdds.buckets) >= 2
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)
        tr = Trainer(model)
        state = tr.init_state(collate(samples[:4]), seed=0)
        rng = jax.random.PRNGKey(0)
        first = last = None
        for _ in range(3):
            state, losses, rng = tr.train_epoch_buckets(state, bdds, rng)
            assert losses.shape == (bdds.steps_per_epoch,)
            assert np.isfinite(np.asarray(losses)).all()
            if first is None:
                first = float(losses.mean())
            last = float(losses.mean())
        assert last < first
        assert int(state.step) == 3 * bdds.steps_per_epoch

    def test_multi_epoch_matches_sequential(self):
        from dostransformer_tpu.data.graph import collate
        from dostransformer_tpu.train.device_dataset import (
            BucketedDeviceDataset)

        samples = self._mixed_samples()
        bdds = BucketedDeviceDataset.from_samples(samples, batch_size=4)
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32)
        tr = Trainer(model, donate=False)
        state0 = tr.init_state(collate(samples[:4]), seed=0)
        keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(1), e)
                          for e in range(2)])

        sm, lm = tr.train_epochs_buckets(state0, bdds, keys)
        ss = state0
        seq = []
        for e in range(2):
            ss, ls, _ = tr.train_epoch_buckets(ss, bdds, keys[e])
            seq.append(np.asarray(ls))
        np.testing.assert_array_equal(np.asarray(lm), np.stack(seq))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            sm.params, ss.params)

    def test_under_dp_mesh(self):
        """Bucketed epochs under the pure-DP shard_map path: each bucket's
        DeviceDataset is sample-axis sharded over the mesh; per-step batch
        composition derives from shard-local shuffles (so it is NOT
        compared against the single-device order — place_dataset docstring),
        but the run must be finite, deterministic given the rng, and step
        the optimizer once per global batch."""
        from dostransformer_tpu.data.graph import collate
        from dostransformer_tpu.train.device_dataset import (
            BucketedDeviceDataset)

        small = synthetic_edos_samples(16, seed=21, min_atoms=4, max_atoms=10)
        large = synthetic_edos_samples(8, seed=22, min_atoms=40, max_atoms=60)
        samples = small + large
        model = DOSTransformerEDOS(layers=2, t_layers=1, hidden=32,
                                   use_pallas=False)

        mesh = make_mesh(axes=("data",))
        tr8 = Trainer(model, mesh=mesh, donate=False)
        s0 = tr8.init_state(collate(samples[:8]), seed=0)
        b8 = BucketedDeviceDataset.from_samples(
            samples, batch_size=8, sharding=tr8.dataset_sharding())
        assert len(b8.buckets) >= 2

        runs = []
        for _ in range(2):
            s8, l8, _ = tr8.train_epoch_buckets(s0, b8, jax.random.PRNGKey(2))
            assert l8.shape == (b8.steps_per_epoch,)
            assert np.isfinite(np.asarray(l8)).all()
            assert int(s8.step) == b8.steps_per_epoch
            runs.append(np.asarray(l8))
        np.testing.assert_array_equal(runs[0], runs[1])
