"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the TPU-native analogue of a fake
backend for distributed tests, SURVEY.md §4) and exact matmul precision so
golden comparisons against the torch oracle are tight. Pallas kernels run in
interpreter mode on CPU (they are additionally verified on real TPU by
bench.py / the driver's compile checks).

The ambient environment pre-imports jax via a sitecustomize hook (gated on
PALLAS_AXON_POOL_IPS) and locks the tunneled-TPU backend before any test code
runs — setting JAX_PLATFORMS afterwards is a no-op. The only reliable fix is
to re-exec the interpreter with the gate removed and the CPU platform forced.
The re-exec happens in pytest_configure with global capture suspended so the
child's output reaches the real stdout.
"""

import os
import sys


def _needs_reexec() -> bool:
    if os.environ.get("DOSTPU_TEST_REEXEC") == "1":
        return False
    # NEVER query jax.default_backend() while the tunneled-TPU gate is set:
    # initializing that backend can HANG indefinitely (tunnel down) or RAISE
    # (tunnel unreachable -> pytest INTERNALERROR before any test runs).
    # Decide from the environment alone; only touch jax when the environment
    # already points at a local backend.
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and platforms.split(",")[0] not in ("", "cpu"):
        return True
    import jax

    try:
        return jax.default_backend() != "cpu" or len(jax.devices()) < 8
    except RuntimeError:
        return True


def pytest_configure(config):
    if not _needs_reexec():
        os.environ.setdefault("DOSTPU_PALLAS_INTERPRET", "1")
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables the sitecustomize TPU hook
    env["JAX_PLATFORMS"] = "cpu"
    env["DOSTPU_PALLAS_INTERPRET"] = "1"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    env["DOSTPU_TEST_REEXEC"] = "1"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *config.invocation_params.args],
              env)


sys.path.insert(0, os.path.dirname(__file__))


# ---------------------------------------------------------------------------
# Fast test tier (VERDICT r4 #7): `pytest -m fast` is the <=5-min
# high-signal subset on this 1-CPU box. Membership is the COMPLEMENT of a
# measured slow list — tests/slow_tier.txt holds every test whose
# setup+call+teardown exceeded 8 s in a full-suite `--durations=0` run
# (plus all of test_multihost.py, whose 2-process spawns dominate wall
# time) — so new small tests join the fast tier by default. Regenerate
# after big suite changes:
#   python -m pytest tests/ -q --durations=0 > /tmp/suite.log
#   (threshold the per-test phase sums at 8 s -> tests/slow_tier.txt)
# ---------------------------------------------------------------------------

def pytest_collection_modifyitems(config, items):
    import pytest

    slow_path = os.path.join(os.path.dirname(__file__), "slow_tier.txt")
    try:
        with open(slow_path) as f:
            slow = {line.strip() for line in f if line.strip()}
    except OSError:
        slow = set()
    for item in items:
        if item.nodeid in slow or item.nodeid.startswith(
                "tests/test_multihost.py"):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
