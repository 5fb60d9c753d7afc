"""Test configuration.

Tests run on the host CPU platform with 8 virtual devices so multi-chip
mesh/sharding tests work without TPU hardware. The platform override must
happen before the first JAX backend use: `jax.config.update` beats the
eagerly-registered TPU (axon) plugin even though sitecustomize loads it at
interpreter startup.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

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
