"""Test environment: 8 virtual CPU devices + float64 enabled.

Multi-device sharding tests run on a virtual CPU mesh per SURVEY.md §4(d):
single- vs multi-device equivalence replaces the reference's untestable MPI
path. Parity-grade numerics use float64 (the reference is double precision) —
which requires the real CPU backend: this image's axon TPU plugin registers
itself via sitecustomize and wins platform selection even over
JAX_PLATFORMS=cpu in the environment, and TPU "f64" is double-emulated with
~1-ulp drift. jax.config.update('jax_platforms', ...) before first backend
use reliably forces CPU.

Tests that need the real TPU (pallas kernels) are marked @pytest.mark.tpu and
deselected here; run them with `python -m pytest -m tpu --no-header -p no:cacheprovider`
without this platform override (see tests/tpu/conftest.py).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_collection_modifyitems(config, items):
    import pytest
    skip_tpu = pytest.mark.skip(reason="needs real TPU (run tests/tpu/ directly)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
