"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the TPU-native analogue of a fake
backend for distributed tests, SURVEY.md §4) and exact matmul precision so
golden comparisons against the torch oracle are tight. Pallas kernels run in
interpreter mode on CPU (they are additionally verified on real TPU by
bench.py / the driver's compile checks).
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the tunneled
# TPU); tests must run on the virtual 8-device CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("DOSTPU_PALLAS_INTERPRET", "1")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
