"""Multi-host (DCN) init tests — VERDICT r2 weak #1.

The env has no multi-host TPU pod, but jax.distributed works over plain TCP
between local CPU processes, so the DCN init path is exercised for real: two
subprocesses initialize against one coordinator, form a global 4-device
mesh, and run a cross-process allgather. Failure semantics are also pinned:
a botched init (bad coordinator, cluster env detected) RAISES instead of
silently degrading to single-process training on 1/N of the data.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from dostransformer_tpu.parallel.mesh import initialize_multihost

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


WORKER = textwrap.dedent("""
    import sys
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from dostransformer_tpu.parallel.mesh import initialize_multihost

    port, pid = sys.argv[1], int(sys.argv[2])
    ok = initialize_multihost(f"127.0.0.1:{port}", 2, pid,
                              initialization_timeout=180)
    assert ok, "explicit args must initialize"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert len(jax.local_devices()) == 2

    # real cross-process collective over the distributed runtime
    got = multihost_utils.process_allgather(
        jnp.asarray([float(jax.process_index())]))
    assert sorted(got.ravel().tolist()) == [0.0, 1.0], got
    print("MULTIHOST_OK", jax.process_index())
""")


class TestTwoProcessInit:
    def test_two_local_cpu_processes_form_a_pod(self, tmp_path):
        port = _free_port()
        script = tmp_path / "worker.py"
        script.write_text(WORKER)
        procs = [subprocess.Popen(
            [sys.executable, str(script), str(port), str(i)],
            env=_worker_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True) for i in range(2)]
        outs = [p.communicate(timeout=300)[0] for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out}"
            assert f"MULTIHOST_OK {i}" in out


class TestFailureSemantics:
    def test_single_process_env_is_noop(self):
        # no explicit args, no cluster launcher in env -> documented no-op
        assert initialize_multihost() is False

    def test_single_worker_tpu_vm_is_noop(self, monkeypatch):
        # single-host managed TPU VMs (and this env's tunnel runtime) export
        # TPU_WORKER_HOSTNAMES with ONE hostname — there is no second
        # process to silently lose data to, so init must be a no-op, not an
        # attempted jax.distributed.initialize (which raises once the XLA
        # backend is up — the exact failure this pins)
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
        assert initialize_multihost() is False

    def test_multiprocess_markers_detected(self, monkeypatch):
        from dostransformer_tpu.parallel.mesh import _cluster_is_multiprocess
        for var in ("SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE", "PMI_SIZE",
                    "TPU_WORKER_HOSTNAMES", "TPU_SKYLARK_WORKER_ID",
                    "MEGASCALE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                    "COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID",
                    "SLURM_NTASKS", "SLURM_NPROCS"):
            monkeypatch.delenv(var, raising=False)
        assert not _cluster_is_multiprocess()
        # single-worker / single-task markers: not multi-process
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "t1v-n-x-w-0")
        monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "1")
        monkeypatch.setenv("SLURM_JOB_ID", "1234")
        assert not _cluster_is_multiprocess()
        # a second worker appears -> multi-process
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w-0,w-1")
        assert _cluster_is_multiprocess()
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w-0")
        monkeypatch.setenv("SLURM_NTASKS", "4")
        assert _cluster_is_multiprocess()
        monkeypatch.setenv("SLURM_NTASKS", "1")
        assert not _cluster_is_multiprocess()
        # explicit coordinator address always forces the loud path
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        assert _cluster_is_multiprocess()

    def test_botched_init_fails_loudly(self, tmp_path):
        # explicit coordinator that doesn't exist: must fail LOUDLY — either
        # a Python exception or the distributed client's fatal abort (the
        # C++ client LOG(FATAL)s on RegisterTask deadline) — never continue
        # silently as a single process
        script = tmp_path / "bad.py"
        script.write_text(textwrap.dedent("""
            from dostransformer_tpu.parallel.mesh import initialize_multihost
            try:
                initialize_multihost("127.0.0.1:1", 2, 1,
                                     initialization_timeout=3)
            except Exception as e:
                print("RAISED", type(e).__name__)
                raise SystemExit(1)
            print("SILENT")
        """))
        res = subprocess.run(
            [sys.executable, str(script)], env=_worker_env(),
            capture_output=True, text=True, timeout=240)
        assert res.returncode != 0, res.stdout + res.stderr
        assert "SILENT" not in res.stdout

    def test_cluster_env_without_coordinator_raises(self, tmp_path):
        # a cluster launcher marker in env (JAX_COORDINATOR_ADDRESS) but a
        # dead coordinator: silent single-process fallback is forbidden
        script = tmp_path / "cluster.py"
        script.write_text(textwrap.dedent("""
            from dostransformer_tpu.parallel.mesh import initialize_multihost
            try:
                initialize_multihost(initialization_timeout=3)
            except Exception as e:
                print("RAISED", type(e).__name__)
            else:
                print("SILENT")
        """))
        env = _worker_env()
        env["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:1"
        out = subprocess.run(
            [sys.executable, str(script)], env=env,
            capture_output=True, text=True, timeout=240).stdout
        assert "RAISED" in out, out
        assert "SILENT" not in out


TRAIN_FLAGS = [
    "--synthetic", "24", "--epochs", "2", "--eval", "1",
    "--hidden", "32", "--layers", "2", "--transformer", "1",
    "--batch_size", "8", "--data_parallel",
]


def _launch_pod_training(shared, port, pid, nproc, devs_per_proc,
                         extra_flags=()):
    env = _worker_env()
    env["XLA_FLAGS"] = \
        f"--xla_force_host_platform_device_count={devs_per_proc}"
    env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = str(nproc)
    env["JAX_PROCESS_ID"] = str(pid)
    return subprocess.Popen(
        [sys.executable, "-u", "-m",
         "dostransformer_tpu.cli.main_phdos", *TRAIN_FLAGS, *extra_flags,
         "--results_dir", str(shared),
         "--checkpoint_dir", str(shared / "ck"),
         "--checkpoint_every", "1"],
        env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


class TestPodTraining:
    @pytest.mark.parametrize("nproc,devs_per_proc", [(2, 4), (4, 2)],
                             ids=["2proc_x4dev", "4proc_x2dev"])
    def test_pod_dp_training_matches_single_process(self, tmp_path, nproc,
                                                    devs_per_proc):
        """Full multi-host DP TRAINING (not just init): nproc real processes
        x devs_per_proc CPU devices each drive the production CLI end-to-end
        against a shared results + checkpoint directory. Pins the pod
        contract: identical host-side loops everywhere, eval metrics
        allgathered (the out shards span processes), orbax coordinating the
        shared-dir save, and file writers emitting exactly ONE copy
        (process 0). The final metrics must match a single-process 8-device
        run of the same config up to cross-host psum reduction-order
        rounding. The 4-process case (VERDICT r3 weak #6) exercises >2-party
        coordination: barrier/allgather fan-in, 4-way orbax save."""
        shared = tmp_path / "shared"
        shared.mkdir()
        port = _free_port()

        procs = [_launch_pod_training(shared, port, i, nproc, devs_per_proc)
                 for i in range(nproc)]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out}"

        # exactly ONE results block despite two processes sharing the dir
        results = (shared / "experiments_DOSTransformer.txt").read_text()
        assert results.count("best epoch") == 1

        # orbax coordinated the shared checkpoint dir (incl. best/)
        assert (shared / "ck" / "best").is_dir()

        # single-process 8-device reference run of the SAME config
        env = _worker_env()
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        single = tmp_path / "single"
        single.mkdir()
        res = subprocess.run(
            [sys.executable, "-u", "-m",
             "dostransformer_tpu.cli.main_phdos", *TRAIN_FLAGS,
             "--results_dir", str(single)],
            env=env, capture_output=True, text=True, timeout=420)
        assert res.returncode == 0, res.stdout + res.stderr

        def rmse_of(text):
            import re

            return float(re.search(r"best RMSE : ([0-9.]+)", text).group(1))

        rmse_pod = rmse_of(results)
        rmse_one = rmse_of(
            (single / "experiments_DOSTransformer.txt").read_text())
        # same 8-device math; cross-host psum may reduce in a different
        # order than the single-process collective (~1e-7 relative)
        assert abs(rmse_pod - rmse_one) <= 1e-3 * max(rmse_one, 1e-9)

    def test_pod_dp_tp_training_matches_single_process(self, tmp_path):
        """dp×tp on a REAL 2-process pod: 2 processes × 4 CPU devices with
        --tensor_parallel 4 build a dp(2)×tp(4) mesh where each TP group is
        one process's devices and DP spans the pod — the production layout
        (TP rides the fast intra-host links, DP the slower cross-host ones).
        The Megatron FFN all-reduces (parallel/megatron.py) therefore run
        inside a process while the gradient psums cross processes.  Final
        metrics must match a single-process 8-device run of the SAME
        dp(2)×tp(4) layout.  (Not pure dp(8): the device dataset shuffles
        shard-locally, so a different dp WIDTH sees a different data order —
        measured dp2 == dp2×tp4 exactly while dp8 differs 1.9% on this tiny
        corpus.  Same-width pure-dp equality is pinned by the Trainer-level
        dp(2)×tp(4) == dp(2) test and reproduced at the CLI: dp2 and dp2×tp4
        print identical RMSE.)"""
        shared = tmp_path / "shared"
        shared.mkdir()
        port = _free_port()
        procs = [_launch_pod_training(shared, port, i, 2, 4,
                                      extra_flags=("--tensor_parallel", "4"))
                 for i in range(2)]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out}"
        results = (shared / "experiments_DOSTransformer.txt").read_text()
        assert results.count("best epoch") == 1

        env = _worker_env()
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        single = tmp_path / "single"
        single.mkdir()
        res = subprocess.run(
            [sys.executable, "-u", "-m",
             "dostransformer_tpu.cli.main_phdos", *TRAIN_FLAGS,
             "--tensor_parallel", "4", "--results_dir", str(single)],
            env=env, capture_output=True, text=True, timeout=420)
        assert res.returncode == 0, res.stdout + res.stderr

        def rmse_of(text):
            import re

            return float(re.search(r"best RMSE : ([0-9.]+)", text).group(1))

        rmse_pod = rmse_of(results)
        rmse_one = rmse_of(
            (single / "experiments_DOSTransformer.txt").read_text())
        assert abs(rmse_pod - rmse_one) <= 1e-3 * max(rmse_one, 1e-9)


SERVE_WORKER = textwrap.dedent("""
    import sys
    import jax
    import numpy as np
    from dostransformer_tpu.data.synthetic import synthetic_phdos_samples
    from dostransformer_tpu.models import DOSTransformerPhDOS
    from dostransformer_tpu.parallel.mesh import initialize_multihost, make_mesh
    from dostransformer_tpu.serve import Predictor
    from dostransformer_tpu.data.graph import collate

    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    if nproc > 1:
        assert initialize_multihost(f"127.0.0.1:{port}", nproc, pid,
                                    initialization_timeout=180)
    samples = synthetic_phdos_samples(12, seed=5)
    model = DOSTransformerPhDOS(layers=2, t_layers=1, hidden=32)
    params = model.init(jax.random.PRNGKey(0), collate([samples[0]]))["params"]
    mesh = make_mesh(axes=("data",))  # 8 global devices, 2 processes
    p = Predictor(model, params, batch_size=8, mesh=mesh)
    out = p.predict(samples)
    assert out.shape == (12, 51), out.shape
    print("SERVE_SUM", float(np.float64(out.sum())))
""")


class TestTwoProcessServing:
    def test_pod_predict_matches_single_process(self, tmp_path):
        """Mesh-sharded serving on a real 2-process pod: outputs are sharded
        over 'data' across processes, so the single fetch must allgather.
        Both processes must return the identical full result, equal to a
        single-process prediction of the same model/params."""
        port = _free_port()
        script = tmp_path / "serve_worker.py"
        script.write_text(SERVE_WORKER)
        env = _worker_env()
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        procs = [subprocess.Popen(
            [sys.executable, str(script), str(port), str(i), "2"],
            env={**env}, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True) for i in range(2)]
        outs = [p.communicate(timeout=420)[0] for p in procs]
        sums = []
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out}"
            sums.append(float(out.split("SERVE_SUM")[1].strip()))
        assert sums[0] == sums[1]

        # single-process reference value (8 devices, same params/mesh axes)
        single = subprocess.run(
            [sys.executable, str(script), "0", "0", "1"],
            env=_worker_env() | {
                "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
            capture_output=True, text=True, timeout=420)
        assert single.returncode == 0, single.stdout + single.stderr
        ref = float(single.stdout.split("SERVE_SUM")[1].strip())
        np.testing.assert_allclose(sums[0], ref, rtol=1e-5)


RESTORE_SERVE_WORKER = textwrap.dedent("""
    import sys
    import numpy as np
    from dostransformer_tpu.data.synthetic import synthetic_phdos_samples
    from dostransformer_tpu.serve import Predictor

    ckpt_dir = sys.argv[1]
    samples = synthetic_phdos_samples(12, seed=5)
    p = Predictor.from_checkpoint(ckpt_dir, task="phdos", example=samples[0],
                                  layers=2, t_layers=1, hidden=32,
                                  batch_size=8)
    out = p.predict(samples)
    assert out.shape == (12, 51), out.shape
    assert np.isfinite(out).all()
    print("RESTORE_SERVE_OK", float(np.float64(out.sum())))
""")


class TestCrossProcessCountRestore:
    def test_two_process_checkpoint_serves_and_resumes_on_one(self, tmp_path):
        """Checkpoint portability across process counts (VERDICT r3 weak #6):
        a checkpoint written collectively by a 2-process pod must (a) serve
        on a plain single process via Predictor.from_checkpoint, and
        (b) resume single-process training — orbax restores into whatever
        sharding the restoring topology's state template carries (DP params
        are replicated, so any process count can adopt them)."""
        shared = tmp_path / "shared"
        shared.mkdir()
        port = _free_port()
        procs = [_launch_pod_training(shared, port, i, 2, 4)
                 for i in range(2)]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert (shared / "ck" / "best").is_dir()

        # (a) single-process serving from the pod-written best checkpoint
        script = tmp_path / "restore_serve.py"
        script.write_text(RESTORE_SERVE_WORKER)
        env = _worker_env()
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        res = subprocess.run(
            [sys.executable, str(script), str(shared / "ck")],
            env=env, capture_output=True, text=True, timeout=420)
        assert res.returncode == 0, res.stdout + res.stderr
        assert "RESTORE_SERVE_OK" in res.stdout

        # (b) single-process RESUME of the pod run: same checkpoint dir,
        # more epochs — must restore at epoch 2 and train on (argparse
        # last-wins overrides --epochs from TRAIN_FLAGS)
        resume_dir = tmp_path / "resume_results"
        resume_dir.mkdir()
        res = subprocess.run(
            [sys.executable, "-u", "-m",
             "dostransformer_tpu.cli.main_phdos", *TRAIN_FLAGS,
             "--epochs", "4",
             "--results_dir", str(resume_dir),
             "--checkpoint_dir", str(shared / "ck"),
             "--checkpoint_every", "1"],
            env=env, capture_output=True, text=True, timeout=420)
        assert res.returncode == 0, res.stdout + res.stderr
        assert "resumed from epoch 2" in res.stdout, res.stdout
        results = (resume_dir / "experiments_DOSTransformer.txt").read_text()
        assert results.count("best epoch") == 1
