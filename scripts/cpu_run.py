#!/usr/bin/env python
"""Run a repo script pinned to the host CPU backend.

`JAX_PLATFORMS=cpu` does NOT override the eagerly-registered TPU (axon)
plugin in this environment; `jax.config.update("jax_platforms", "cpu")`
before first backend use does (same mechanism as tests/conftest.py). Use
this to run corpus/eval tooling on CPU while the TPU is busy training:

    python scripts/cpu_run.py scripts/eval_engine_parity.py --songs 3 ...
"""

import runpy
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

if __name__ == "__main__":
    script = sys.argv[1]
    sys.argv = sys.argv[1:]
    runpy.run_path(script, run_name="__main__")
