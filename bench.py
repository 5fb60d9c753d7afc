#!/usr/bin/env python
"""Benchmark: EtudeDecoder autoregressive generation throughput on one chip.

Measures the STREAMING engine (models/generate_stream.py): the whole song —
every bar's condition encode, sampled decode loop, and KV management — runs
as ONE device program, so the number reflects on-device generation rather
than per-launch tunnel latency (this environment reaches the chip through a
remote tunnel whose round-trip varies several-fold with service load; each
measurement is repeated and the best wall-clock is kept, with different
sampling seeds so the axon layer's identical-execution cache cannot replay).

Two numbers (BASELINE.json metric "decoder tokens/sec"):
  * batched (headline): 16 parallel attribute streams decoding the song in
    lockstep — the serving-throughput configuration;
  * single_stream: one stream, the latency path.

Weights: the distilled decoder checkpoint (checkpoints/decoder) when present
— sampled distributions and EOS behavior are trained-model-real — otherwise
random init (flagged in the output). Condition bars come from a reference
corpus song (etude_e.mid on an estimated beat grid, the eval_distilled
construction) so bar lengths match the training distribution; synthetic
random bars are the fallback.

vs_baseline compares against REF_TOKENS_PER_SEC, an estimate of the
reference's Python token-at-a-time loop (per-step host sync + per-bar KV
rebuild, etude/models/etude_decoder.py:299-343) on its stated hardware class
(>=16GB GPU): ~100 tok/s for the 25M-param decoder. The reference publishes
no throughput numbers (BASELINE.json "published": {}), so this constant is an
engineering estimate kept fixed across rounds for comparability.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

REF_TOKENS_PER_SEC = 100.0

BATCH = 16
N_BARS = 24
MAX_BAR_TOKENS = 128
REPEATS = 4  # best-of over distinct seeds: the remote tunnel's service load
             # varies several-fold between runs; steady-state = best observed


def _load_weights(repo: Path):
    from etude_tpu.models.decoder import EtudeDecoderConfig, init_params

    ckpt = repo / "checkpoints" / "decoder"
    if (ckpt / "etude_decoder_config.json").exists() and (ckpt / "latest.ckpt").exists():
        from etude_tpu.utils.model_loader import load_etude_decoder

        params, config = load_etude_decoder(
            ckpt / "etude_decoder_config.json", ckpt / "latest.ckpt"
        )
        vocab = None
        if (ckpt / "vocab.json").exists():
            from etude_tpu.data.vocab import Vocab

            vocab = Vocab.load(ckpt / "vocab.json")
        return params, config, vocab, "distilled"
    config = EtudeDecoderConfig()
    return init_params(config, seed=0), config, None, "random"


def _corpus_bars(vocab, n_bars: int):
    """Condition bars from a real corpus song (training-distribution bar
    lengths); None if the corpus or grid is unavailable."""
    song = Path("/root/reference/docs/songs/CPOP01/etude_e.mid")
    if vocab is None or not song.exists():
        return None
    try:
        import sys

        sys.path.insert(0, str(Path(__file__).resolve().parent / "scripts"))
        from distill_dataset import estimate_tempo_grid

        from etude_tpu.data.tokenizer import (
            TinyREMITokenizer,
            split_sequence_into_bars,
        )
        from etude_tpu.utils.midi import read_midi_notes

        notes = read_midi_notes(song)
        tempo = estimate_tempo_grid(notes)
        if tempo is None:
            return None
        tok = TinyREMITokenizer(tempo_data=tempo)
        ids = vocab.encode_sequence(tok.encode(notes, with_grace_note=True))
        bars = split_sequence_into_bars(ids, vocab.bar_bos_id, vocab.bar_eos_id)
        return bars[:n_bars] if len(bars) >= n_bars else None
    except Exception:
        return None


def main() -> None:
    import os
    import time as _time

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    import jax

    for attempt in range(3):  # TPU backend registration is occasionally transient
        try:
            jax.devices()
            break
        except RuntimeError:
            if attempt == 2:
                raise
            _time.sleep(10)

    from etude_tpu.models.generate import ATTR_KEYS
    from etude_tpu.models.generate_stream import StreamingGenerationEngine

    repo = Path(__file__).resolve().parent
    params, config, vocab, weights = _load_weights(repo)

    if vocab is not None:
        BOS, EOS, PAD = vocab.bar_bos_id, vocab.bar_eos_id, vocab.pad_id
        note_ids = [vocab.encode(f"Note_{p}") for p in range(60, 72)] + [
            vocab.encode("Pos_0"), vocab.encode("Duration_4"),
        ]
    else:
        BOS, EOS, PAD = 4, 5, 0
        note_ids = list(range(6, 30))

    bars = _corpus_bars(vocab, N_BARS)
    source = "corpus"
    if bars is None:
        source = "synthetic"
        rng = np.random.default_rng(0)
        bars = [
            [BOS] + rng.choice(note_ids, size=24).tolist() + [EOS]
            for _ in range(N_BARS)
        ]
    attrs = [{k: 1 for k in ATTR_KEYS} for _ in range(len(bars))]

    # prompt_cap 512 = the reference's effective window (max_pos 1024 −
    # max_bar_token_limit 512, etude/config/schema.py:222-226). Without it
    # the engine derives cap 1024 − MAX_BAR_TOKENS = 896, a LARGER history
    # window than the reference ever attends — slower and not parity.
    # int8 KV cache measured SLOWER end-to-end at this scale (6.6k vs 14.0k
    # tok/s batched, r3): the per-step quantize/requantize work and s32
    # conversions outweigh the halved cache read for a 25M-param window of
    # ~770 slots. Quality is parity (scripts/eval_distilled.py --kv-quant),
    # so the option stays for larger windows; BENCH_KV_QUANT=1 re-measures.
    kv_quant = os.environ.get("BENCH_KV_QUANT", "0") == "1"
    engine = StreamingGenerationEngine(
        config, bar_bos_id=BOS, bar_eos_id=EOS, pad_id=PAD,
        max_bar_token_limit=MAX_BAR_TOKENS, prompt_cap=512,
        x_len_buckets=(96, 128), bars_bucket=N_BARS, kv_quant=kv_quant,
    )

    def measure(n_streams: int):
        """(tokens, best wall-clock) over REPEATS runs with distinct seeds."""
        xs = [bars] * n_streams
        ats = [attrs] * n_streams
        engine.generate_batch(params, xs, ats, temperature=0.8, top_p=0.9,
                              seed=999)  # compile + warm
        best = float("inf")
        tokens = 0
        for rep in range(REPEATS):
            t0 = time.perf_counter()
            out = engine.generate_batch(params, xs, ats, temperature=0.8,
                                        top_p=0.9, seed=rep)
            dt = time.perf_counter() - t0
            n = sum(len(bar) for s in out for bar in s)
            if dt < best:
                best, tokens = dt, n
        return tokens, best

    n_tok_b, dt_b = measure(BATCH)
    n_tok_s, dt_s = measure(1)

    print(json.dumps({
        "metric": "decoder_tokens_per_sec",
        "value": round(n_tok_b / dt_b, 2),
        "unit": "tokens/s",
        "vs_baseline": round(n_tok_b / dt_b / REF_TOKENS_PER_SEC, 3),
        "vs_baseline_note": "reference rate is an ESTIMATE "
                            f"({REF_TOKENS_PER_SEC:.0f} tok/s for its "
                            "host-synced Python sampling loop on its stated "
                            "GPU class; the repo publishes no speed numbers)",
        "single_stream_tok_s": round(n_tok_s / dt_s, 2),
        "single_stream_tokens": int(n_tok_s),
        "batched_tokens": int(n_tok_b),
        "batched_streams": BATCH,
        "n_bars": len(bars),
        "condition_source": source,
        "weights": weights,
        "kv_quant": kv_quant,
    }))


if __name__ == "__main__":
    main()
