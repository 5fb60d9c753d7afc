#!/usr/bin/env python
"""Decoder training throughput on the local chip(s).

Measures the sharded train step (gradient accumulation included) in
tokens/sec at the reference's training shape (batch 8 × accum 4, seqlen
1024, full-size 25M decoder).
"""

from __future__ import annotations

import os

# Must land in os.environ BEFORE jax is imported anywhere in this
# process: jax freezes the compilation-cache default at import time, so
# the same setdefault in etude_tpu.__init__ is a no-op for scripts that
# import jax first (100-900 s recompiles per program on the hosted TPU).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from etude_tpu.models.decoder import (
        ATTRIBUTE_ORDER,
        EtudeDecoderConfig,
        init_params,
    )
    from etude_tpu.parallel.mesh import make_mesh
    from etude_tpu.parallel.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
        reshape_for_accum,
    )

    config = EtudeDecoderConfig()
    params = init_params(config, seed=0)
    tx, _ = make_optimizer(total_steps=1000)
    state = init_train_state(params, tx)

    n_dev = len(jax.devices())
    micro, accum, T = 8, 4, 1024
    dp = min(n_dev, micro)
    while dp > 1 and micro % dp:  # dp must divide the micro batch
        dp -= 1
    mesh = make_mesh(data_parallel=dp)
    step = make_train_step(config, tx, mesh=mesh)

    rng = np.random.default_rng(0)

    def batch(seed):
        r = np.random.default_rng(seed)
        ids = r.integers(4, config.vocab_size, (micro * accum, T)).astype(np.int32)
        labels = np.roll(ids, -1, 1).astype(np.int32)
        labels[:, -1] = -100
        b = {
            "input_ids": ids,
            "class_ids": r.integers(1, 3, (micro * accum, T)).astype(np.int32),
            "labels": labels,
            "attention_mask": np.ones((micro * accum, T), np.int32),
        }
        for name in ATTRIBUTE_ORDER:
            b[f"{name}_bin_ids"] = r.integers(0, 3, (micro * accum, T)).astype(np.int32)
        return reshape_for_accum(b, accum)

    state, m = step(state, batch(0))  # compile
    float(m["loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for i in range(1, n_steps + 1):
        state, m = step(state, batch(i))
    float(m["loss"])
    dt = time.perf_counter() - t0

    tokens = n_steps * micro * accum * T
    print(json.dumps({
        "metric": "train_tokens_per_sec",
        "value": round(tokens / dt, 1),
        "unit": "tokens/s",
        "global_batch": micro * accum,
        "seqlen": T,
        "devices": n_dev,
        "step_ms": round(dt / n_steps * 1000, 1),
    }))


if __name__ == "__main__":
    main()
