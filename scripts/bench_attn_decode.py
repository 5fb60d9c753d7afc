#!/usr/bin/env python
"""A/B the streaming decode step's attention read formulations on real TPU.

The decode step is HBM-bound on the KV cache read (VERDICT r3: effective
bandwidth 42% of speed-of-light). Candidates:

  * xla      — the production formulation (generate_stream.stream_chunk):
               einsum scores over K, f32 softmax + bias, einsum ctx over V.
  * pallas   — fused single-pass kernel: grid over (L·B·H); per grid point a
               2-D matvec q·K, in-VMEM softmax, 2-D dot p·Vᵀ. Reads each KV
               byte exactly once, never materializes probs in HBM. Dots are
               strictly 2-D, dodging this toolchain's MLIR
               `tpu.dot_dimension_numbers` parse failure on batched dots
               (ops/dilated_attention.py:17-21).
  * vpu      — scores as a fused multiply-reduce (VPU path) instead of the
               MXU matvec; ctx stays an einsum.

Each variant runs L=8 chained "layers" per step (q evolves layer-to-layer —
the real dependency structure), N steps inside one fori_loop program, and the
per-step cost is a difference quotient between two trip counts, best-of-R
with distinct inputs (the axon layer replays identical executions).

Usage: python scripts/bench_attn_decode.py [--batch 16] [--cache-len 768]
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from etude_tpu.ops.decode_attention import decode_attention_pallas  # noqa: E402

L, H, D = 8, 8, 64


def attn_xla(q, k_l, v_l, bias):
    """Production two-einsum read (stream_chunk non-quant path), S=1."""
    scores = jnp.einsum(
        "bqhd,bhdc->bhqc", q.astype(jnp.bfloat16), k_l.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) / np.sqrt(D)
    probs = jax.nn.softmax(scores + bias, axis=-1)
    ctx = jnp.einsum(
        "bhqc,bhdc->bqhd", probs.astype(jnp.bfloat16), v_l.astype(jnp.bfloat16)
    )
    return ctx


def attn_vpu(q, k_l, v_l, bias):
    """Scores via fused multiply-reduce (VPU), ctx via einsum."""
    qh = q[:, 0].astype(jnp.bfloat16)             # [B,H,D]
    scores = jnp.sum(
        qh[:, :, :, None] * k_l.astype(jnp.bfloat16),
        axis=2, dtype=jnp.float32,
    )[:, :, None, :] / np.sqrt(D)                 # [B,H,1,C]
    probs = jax.nn.softmax(scores + bias, axis=-1)
    ctx = jnp.einsum(
        "bhqc,bhdc->bqhd", probs.astype(jnp.bfloat16), v_l.astype(jnp.bfloat16)
    )
    return ctx


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--cache-len", type=int, default=768)
    parser.add_argument("--n1", type=int, default=64)
    parser.add_argument("--n2", type=int, default=512)
    parser.add_argument("--repeats", type=int, default=4)
    parser.add_argument("--variants", nargs="+",
                        default=["xla", "pallas", "vpu"])
    args = parser.parse_args(argv)
    B, C = args.batch, args.cache_len

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((L, B, H, D, C)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((L, B, H, D, C)), jnp.bfloat16)
    # visibility bias: ~90% of slots live
    live = rng.random((B, 1, 1, C)) < 0.9
    bias = jnp.asarray(np.where(live, 0.0, -1e9), jnp.float32)

    out = {
        "backend": jax.default_backend(), "B": B, "C": C,
        "kv_mbytes_per_step": round(L * B * H * D * C * 2 * 2 / 1e6, 1),
    }

    def make_runner(variant):
        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def run(q0, k, v, bias, *, n_steps):
            def body(i, q):
                for layer in range(L):
                    if variant == "xla":
                        ctx = attn_xla(q, k[layer], v[layer], bias)
                    elif variant == "vpu":
                        ctx = attn_vpu(q, k[layer], v[layer], bias)
                    else:
                        ctx = decode_attention_pallas(
                            q, k[layer], v[layer], bias
                        )
                    # q evolves (prevents replay/DCE; mimics the layer chain)
                    q = (ctx / (1e-3 + jnp.linalg.norm(
                        ctx, axis=-1, keepdims=True))).astype(q.dtype)
                return q
            return jax.lax.fori_loop(0, n_steps, body, q0)
        return run

    for variant in args.variants:
        runner = make_runner(variant)
        try:
            times = {}
            for n in (args.n1, args.n2):
                best = float("inf")
                for rep in range(args.repeats):
                    q0 = jnp.asarray(
                        rng.standard_normal((B, 1, H, D)), jnp.bfloat16
                    )
                    compiled = runner.lower(
                        q0, k, v, bias, n_steps=n
                    ).compile() if rep == 0 and n == args.n1 else None
                    t0 = time.perf_counter()
                    np.asarray(runner(q0, k, v, bias, n_steps=n))
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            ms = (times[args.n2] - times[args.n1]) / (args.n2 - args.n1) * 1e3
            out[f"{variant}_ms_per_step"] = round(ms, 4)
            out[f"{variant}_eff_gbps"] = round(
                out["kv_mbytes_per_step"] / 1e3 / (ms / 1e3), 1
            )
        except Exception as e:  # noqa: BLE001 — record toolchain rejections
            out[f"{variant}_error"] = f"{type(e).__name__}: {str(e)[:300]}"

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
