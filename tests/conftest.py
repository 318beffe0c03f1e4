"""Shared fixtures. The CPU-mesh environment swap happens earlier, in the
``autoawq_tpu._testenv`` plugin loaded via addopts (see that module's
docstring for why it cannot live here)."""

import jax
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def requires_multidevice():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
