"""Test configuration.

Forces JAX onto the host CPU platform with 8 virtual devices so that
multi-chip mesh/sharding tests run without TPU hardware. Must run before the
first `import jax` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# Persistent compilation cache: repeated pytest runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def tempo_data_4_4():
    """A simple single-region tempo map: 4/4 at 120 BPM, downbeats every 2 s
    from t=2 to t=16 (8 measures + synthetic pickup + trailing)."""
    return [
        {
            "time_sig": 4,
            "bpm": 120.0,
            "start": 2.0,
            "downbeats": [2.0 + 2.0 * i for i in range(8)],
        }
    ]
