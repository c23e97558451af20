"""TPU-only tests: run with `python -m pytest tests/tpu/ -q` (no platform
override — uses the real chip via the axon plugin)."""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="no TPU backend available")
        for item in items:
            item.add_marker(skip)
