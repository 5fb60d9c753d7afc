#!/usr/bin/env python
"""Compare the XLA shifted-slice dilated attention against the Pallas kernel
on a full-song beat-tracking workload (real TPU).

Usage: python scripts/bench_dilated_attention.py [--t 12288] [--heads 8]
Prints per-backend wall times and the max output deviation; exits non-zero if
the Pallas kernel fails to compile/run (the env-flag backend should then be
removed rather than shipped untested).
"""

from __future__ import annotations

import os

# Must land in os.environ BEFORE jax is imported anywhere in this
# process: jax freezes the compilation-cache default at import time, so
# the same setdefault in etude_tpu.__init__ is a no-op for scripts that
# import jax first (100-900 s recompiles per program on the hosted TPU).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--t", type=int, default=12288)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--dim", type=int, default=32)
    parser.add_argument("--attn-len", type=int, default=5)
    parser.add_argument("--layers", type=int, default=9)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from etude_tpu.ops.dilated_attention import (
        dilated_attention,
        dilated_attention_pallas,
    )

    H, T, d, A = args.heads, args.t, args.dim, args.attn_len
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, H, T, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, H, T, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, H, T, d)), jnp.bfloat16)
    er = jnp.asarray(rng.normal(0, 0.02, size=(H, d, A)), jnp.bfloat16)

    results = {}
    for name, fn in (("xla", dilated_attention), ("pallas", dilated_attention_pallas)):
        outs = []
        # One jit wrapper per backend, shared by warm-up and the timed loop —
        # a fresh jax.jit() has its own trace cache, so re-wrapping inside the
        # timed region would charge re-tracing to the measurement.
        jitted = jax.jit(fn, static_argnames=("dilation",))
        try:
            # Warm-up also yields the parity-check outputs (same q for both
            # backends).
            for layer in range(args.layers):
                out = jitted(q, k, v, er, dilation=2 ** layer)
                out.block_until_ready()
                outs.append(out)
            # Fresh input VALUES for every timed repetition: the axon layer
            # replays identical executions near-instantly, which would make
            # warm+repeat timing meaningless.
            dt = float("inf")
            for rep in range(3):
                qr = q + jnp.bfloat16(0.001 * (rep + 1))
                t0 = time.perf_counter()
                outs_r = [
                    jitted(qr, k, v, er, dilation=2 ** layer)
                    for layer in range(args.layers)
                ]
                jax.block_until_ready(outs_r)
                dt = min(dt, time.perf_counter() - t0)
            results[name] = (dt, outs)
            print(f"{name}: {args.layers} layers over [{H},{T},{d}] "
                  f"in {dt * 1e3:.1f} ms (best of 3, fresh values)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED — {type(e).__name__}: {e}")
            results[name] = None

    if results.get("pallas") is None:
        return 1
    if results.get("xla") is not None:
        max_dev = max(
            float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
            for a, b in zip(results["xla"][1], results["pallas"][1])
        )
        print(f"max |xla - pallas| = {max_dev:.4f}")
        speedup = results["xla"][0] / results["pallas"][0]
        print(f"pallas speedup over xla: {speedup:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
