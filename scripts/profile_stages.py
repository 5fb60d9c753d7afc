#!/usr/bin/env python
"""Per-component device timing for the Extract and Structuralize stages.

bench_e2e.py gives stage wall-clocks; this script isolates the individual
device programs (mel, hFT groups, beat conv/attention stack, DBN) so
optimization targets the right op. Each program is warmed once and then
timed best-of-N with varied inputs (the axon layer replays identical
executions from cache — identical-input timings are meaningless).

Usage: python scripts/profile_stages.py [--seconds 240] [--repeats 3]
"""

from __future__ import annotations

import os

# Must land in os.environ BEFORE jax is imported anywhere in this
# process: jax freezes the compilation-cache default at import time, so
# the same setdefault in etude_tpu.__init__ is a no-op for scripts that
# import jax first (100-900 s recompiles per program on the hosted TPU).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed(fn, variants, warm=1):
    """Best wall-clock over len(variants) calls of fn(variant)."""
    for _ in range(warm):
        jax.block_until_ready(fn(variants[0]))
    best = np.inf
    for v in variants[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(v))
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=float, default=240.0)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args(argv)
    rng = np.random.default_rng(0)
    out = {"backend": jax.default_backend()}
    R = args.repeats + 1

    # ---------------- Extract: mel + hFT groups --------------------------
    from etude_tpu.config.schema import ExtractorConfig
    from etude_tpu.data.extractor import AMTAPC_Extractor, _transcribe_group
    from etude_tpu.ops.mel import log_mel_spectrogram

    ec = ExtractorConfig()
    extractor = AMTAPC_Extractor(
        ec, model_path=REPO / "checkpoints/extractor/latest.ckpt"
    )
    sr = ec.feature.sr
    n_wave = int(args.seconds * sr)
    waves = [jnp.asarray(rng.normal(0, 0.1, n_wave), jnp.float32)
             for _ in range(R)]
    out["extract_mel_s"] = timed(
        lambda w: log_mel_spectrogram(
            w, sr=sr, n_fft=ec.feature.fft_bins, hop=ec.feature.hop_sample,
            win_length=ec.feature.window_length, n_mels=ec.feature.mel_bins,
            log_offset=ec.feature.log_offset,
        ),
        waves,
    )

    B = extractor.segment_batch
    ic = ec.input
    win_total = ic.margin_b + B * extractor.amt_config.n_frame + ic.margin_f
    featw = [jnp.asarray(rng.normal(-10, 4, (win_total, 256)), jnp.float32)
             for _ in range(R)]
    out["extract_group_s"] = timed(
        lambda f: _transcribe_group(
            extractor.params, extractor.amt_config, f, branches=("time",),
            batch=B,
        ),
        featw,
    )
    fps = sr / ec.feature.hop_sample
    n_seg = int(np.ceil(args.seconds * fps / extractor.amt_config.n_frame))
    out["extract_groups_per_song"] = int(np.ceil(n_seg / B))
    out["extract_model_total_s"] = round(
        out["extract_group_s"] * out["extract_groups_per_song"], 4
    )

    # ---------------- Structuralize: separator + beat --------------------
    from etude_tpu.config.schema import BeatDetectorConfig
    from etude_tpu.data.beat_detector import BeatDetector, _beat_activations_jit
    from etude_tpu.models.beat_transformer import forward as beat_forward

    det = BeatDetector(
        BeatDetectorConfig(),
        model_path=REPO / "checkpoints/beat_detector/latest.ckpt",
    )
    beat_fps = 44100.0 / 1024.0
    T = int(np.ceil(args.seconds * beat_fps / 2048) * 2048)
    feats = [jnp.asarray(rng.uniform(-80, 0, (5, T, 128)), jnp.float32)
             for _ in range(R)]
    out["beat_T"] = T
    out["beat_forward_s"] = timed(
        lambda f: _beat_activations_jit(det.params, det.model_config, f),
        feats,
    )

    # Beat forward decomposition: conv front-end only vs full stack.
    from etude_tpu.models.beat_transformer import _conv_frontend

    conv_jit = jax.jit(lambda f: _conv_frontend(
        det.params, f.reshape(5, T, 128).astype(jnp.bfloat16), jnp.bfloat16
    ))
    out["beat_conv_s"] = timed(lambda f: conv_jit(f), feats)

    # Single dilated layer at full T (batch 5 stems).
    from etude_tpu.ops.dilated_attention import dilated_attention

    d = det.model_config.dmodel // det.model_config.nhead
    qkv = [tuple(
        jnp.asarray(rng.normal(0, 1, (5, det.model_config.nhead, T, d)),
                    jnp.bfloat16) for _ in range(3)
    ) for _ in range(R)]
    er = jnp.asarray(
        rng.normal(0, 0.02, (det.model_config.nhead, d, 5)), jnp.bfloat16
    )
    att = jax.jit(lambda q, k, v, dil: dilated_attention(q, k, v, er, dil),
                  static_argnames=("dil",))
    for dil in (1, 16, 256):
        out[f"dilated_attn_dil{dil}_s"] = timed(
            lambda t, _dil=dil: att(*t, _dil), qkv
        )

    # DBN decode (host+device hybrid).
    acts = [np.clip(rng.uniform(0, 1, (T,)).astype(np.float32) ** 4, 0, 1)
            for _ in range(R)]
    out["dbn_beat_s"] = timed(lambda a: det.beat_tracker(a), acts)

    # ---------------- Separator ------------------------------------------
    from etude_tpu.data.separation import SourceSeparator, _separate_mel

    sep = SourceSeparator(
        model_path=REPO / "checkpoints/separator/latest.ckpt"
    )
    n44 = int(args.seconds * 44100)
    sep_waves = [jnp.asarray(rng.normal(0, 0.1, n44 + 4096), jnp.float32)
                 for _ in range(R)]
    true_frames = 1 + n44 // 1024
    out["separator_s"] = timed(
        lambda w: _separate_mel(sep.params, sep.config, w, true_frames),
        sep_waves,
    )

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
