#!/usr/bin/env python
"""Decompose the streaming decode step cost at several batch sizes.

The axon layer replays identical executables in <1 ms even when input
VALUES change, so single-dispatch timings are meaningless here. Every
measurement below runs N decode steps inside ONE device program
(lax.fori_loop whose state evolves: sampled token → chunk → logits) and the
per-step cost is the difference quotient between two trip counts — launch
overhead and replay effects cancel.

Variants decompose the cost:
  * full: sample_token + stream_chunk (the real decode step);
  * greedy: argmax instead of top-p sampling (isolates sampling cost);
  * cache_len sweep: window-read scaling.

Usage: python scripts/bench_decode_step.py [--batches 1 16] [--n1 64] [--n2 192]
"""

from __future__ import annotations

import os

# Must land in os.environ BEFORE jax is imported anywhere in this
# process: jax freezes the compilation-cache default at import time, so
# the same setdefault in etude_tpu.__init__ is a no-op for scripts that
# import jax first (100-900 s recompiles per program on the hosted TPU).
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

from etude_tpu.models.decoder import ATTRIBUTE_ORDER, EtudeDecoderConfig, init_params  # noqa: E402
from etude_tpu.models.generate_stream import init_stream_cache, stream_chunk  # noqa: E402
from etude_tpu.ops.sampling import sample_token  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cache-lens", type=int, nargs="+", default=[769, 257])
    parser.add_argument("--batches", type=int, nargs="+", default=[1, 16])
    parser.add_argument("--n1", type=int, default=64)
    parser.add_argument("--n2", type=int, default=512)
    parser.add_argument("--quant", action="store_true",
                        help="int8 KV cache (halved HBM cache read)")
    parser.add_argument("--repeats", type=int, default=3,
                        help="executions per trip count (min taken): the "
                             "tunnel's service load swings several-fold "
                             "between minutes, single runs are meaningless")
    args = parser.parse_args(argv)

    ckpt = REPO / "checkpoints" / "decoder"
    if (ckpt / "latest.ckpt").exists():
        from etude_tpu.utils.model_loader import load_etude_decoder

        params, config = load_etude_decoder(
            ckpt / "etude_decoder_config.json", ckpt / "latest.ckpt"
        )
    else:
        config = EtudeDecoderConfig()
        params = init_params(config, seed=0)
    rng = np.random.default_rng(0)
    out = {"backend": jax.default_backend(), "n1": args.n1, "n2": args.n2,
           "quant": args.quant}

    @functools.partial(
        jax.jit, static_argnames=("n_steps", "B", "cache_len", "greedy")
    )
    def run_steps(params, key, tok0, *, n_steps, B, cache_len, greedy):
        cache = init_stream_cache(config, B, cache_len, quant=args.quant)
        cls = jnp.full((B, 1), 2, jnp.int32)
        attrs = {n: jnp.ones((B, 1), jnp.int32) for n in ATTRIBUTE_ORDER}
        win = jnp.zeros((B,), jnp.int32)
        temp = jnp.float32(0.0 if greedy else 0.8)
        top_p = jnp.float32(0.9)

        logits0, cache = stream_chunk(
            params, config, cache, tok0, cls, attrs,
            start_pos=jnp.zeros((B,), jnp.int32), win_start=win,
            slot_offset=jnp.int32(0), max_hi=16,
        )

        def body(i, state):
            logits, cache, key = state
            key, sub = jax.random.split(key)
            tok = sample_token(logits[:, 0], sub, temp, top_p)
            logits, cache = stream_chunk(
                params, config, cache, tok[:, None].astype(jnp.int32), cls,
                attrs,
                start_pos=jnp.full((B,), 1 + i, jnp.int32), win_start=win,
                slot_offset=(1 + i) % cache_len,
                max_hi=16,
            )
            return (logits, cache, key)

        logits, cache, _ = jax.lax.fori_loop(
            0, n_steps, body, (logits0, cache, key)
        )
        return logits[:, 0, :8]

    def timed(B, cache_len, greedy):
        """The axon layer replays previously-seen EXECUTABLES near-instantly
        even with different input values, so each executable here is
        compiled ahead-of-time and executed exactly ONCE; per-step cost is
        the slope between the two trip counts."""
        times = {}
        for j, n in enumerate((args.n1, args.n2)):
            tok0 = jnp.asarray(
                rng.integers(4, config.vocab_size, (B, 1)).astype(np.int32)
            )
            compiled = run_steps.lower(
                params, jax.random.PRNGKey(0), tok0, n_steps=n, B=B,
                cache_len=cache_len, greedy=greedy,
            ).compile()
            best = float("inf")
            for rep in range(args.repeats):
                # Fresh PRNG key per repeat: identical executions are
                # replayed near-instantly by the axon layer.
                key = jax.random.PRNGKey(j * 1000 + rep + 1)
                t0 = time.perf_counter()
                # np.asarray forces a real value fetch: through the axon
                # tunnel, block_until_ready alone returns before remote
                # execution ends.
                np.asarray(compiled(params, key, tok0))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[args.n2] - times[args.n1]) / (args.n2 - args.n1) * 1e3

    for B in args.batches:
        for cl in args.cache_lens:
            out[f"step_b{B}_c{cl}_ms"] = round(timed(B, cl, greedy=False), 4)
        out[f"step_b{B}_c{args.cache_lens[0]}_greedy_ms"] = round(
            timed(B, args.cache_lens[0], greedy=True), 4
        )

    print(json.dumps(out))  # ONE aggregate line, after all batch sizes
    return 0


if __name__ == "__main__":
    sys.exit(main())
