#!/usr/bin/env python
"""Full-pipeline benchmark: synthetic 4-minute song → MIDI on one chip.

Measures the BASELINE.json north-star configuration (full audio→MIDI cover
of a 4-minute song; target < 10 s on one v5e) with per-stage wall-clock.
Uses full-size models with random weights (compute shape is what matters for
throughput). Run twice: the first run pays one-time jit compiles, the second
reports steady-state numbers.

Usage: python scripts/bench_pipeline.py [--seconds 240] [--skip-warmup]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_song(path: Path, seconds: int, sr: int = 44100) -> None:
    """A synthetic pop-like mix: chord pad + bass + beat clicks + melody."""
    from etude_tpu.utils.audio import save_wav

    rng = np.random.default_rng(0)
    t = np.arange(int(sr * seconds)) / sr
    wave = np.zeros_like(t, dtype=np.float64)
    # chords (2-second bars)
    for bar in range(seconds // 2):
        root = 110 * 2 ** ((bar * 5 % 12) / 12)
        seg = slice(int(bar * 2 * sr), int((bar * 2 + 2) * sr))
        tt = t[seg] - bar * 2
        for mult in (1.0, 1.25, 1.5):
            wave[seg] += 0.12 * np.sin(2 * np.pi * root * mult * tt)
    # beat clicks at 120 bpm
    for beat_t in np.arange(0, seconds, 0.5):
        i = int(beat_t * sr)
        n = min(3000, len(wave) - i)
        wave[i:i + n] += 0.4 * np.exp(-np.arange(n) / 400) * rng.normal(size=n)
    # melody
    wave += 0.1 * np.sin(2 * np.pi * 440 * t * (1 + 0.001 * np.sin(2 * np.pi * 0.25 * t)))
    save_wav(path, (wave / np.abs(wave).max() * 0.8).astype(np.float32), sr)


def run_pipeline(work: Path, stage: str) -> dict:
    """Each neural stage runs twice in-process: the first pass pays jit
    compiles (cold), the second measures steady state (warm) — the remote
    compile service's cross-process cache is unreliable."""
    from etude_tpu.config import load_config
    from etude_tpu.utils.profiling import StageTimer

    cfg = load_config(None, overrides={
        "paths": {"infer_output_dir": str(work / "out")},
        "extractor": {"infer": {"segment_batch": 4}},
        "decoder": {"max_bar_token_limit": 512, "temperature": 0.0},
    })

    timer = StageTimer()
    song = work / "song.wav"
    timings = {}

    if stage in ("all", "extract"):
        from etude_tpu.data.extractor import AMTAPC_Extractor
        from etude_tpu.utils.audio import analyze_volume, save_volume_map

        ex = AMTAPC_Extractor(cfg.extractor, model_path=None)
        with timer.span("extract_cold"):
            ex.extract(song, work / "extract.json")
        with timer.span("extract"):
            notes = ex.extract(song, work / "extract.json")
            vol = analyze_volume(song)
            save_volume_map(vol, work / "volume.json")
        timings["extract_notes"] = len(notes)

    if stage in ("all", "structuralize"):
        from etude_tpu.data.beat_analyzer import BeatAnalyzer
        from etude_tpu.data.beat_detector import BeatDetector
        from etude_tpu.data.separation import SourceSeparator

        sep = SourceSeparator(model_path=None)
        det = BeatDetector(cfg.beat_detector, model_path=None)
        with timer.span("structuralize_cold"):
            feats = sep.separate_features(song, return_device=True)
            det.activations(feats)
        with timer.span("separation"):
            feats = sep.separate_features(song, return_device=True)
        with timer.span("beat_detect"):
            res = det.detect(feats, work / "beat_pred.json")
        with timer.span("beat_analyze"):
            analyzer = BeatAnalyzer()
            tempo = analyzer.analyze_predictions(
                res["beat_pred"], res["downbeat_pred"]
            )
            analyzer.save_tempo_data(tempo, work / "tempo.json")
        timings["beats"] = len(res["beat_pred"])
        timings["tempo_regions"] = len(tempo)

    if stage in ("all", "decode"):
        from etude_tpu.data.tokenizer import TinyREMITokenizer, split_sequence_into_bars
        from etude_tpu.data.vocab import Event, Vocab
        from etude_tpu.models.decoder import EtudeDecoderConfig, init_params
        from etude_tpu.models.generate import ATTR_KEYS, GenerationEngine

        vocab = Vocab()
        events = [Event("Bar", "BOS"), Event("Bar", "EOS")]
        for p in range(21, 109):
            events.append(Event("Note", p))
        for pos in range(33):
            events.append(Event("Pos", pos))
        for d in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32):
            events.append(Event("Duration", d))
        vocab.build_from_events([events])

        with timer.span("tokenize"):
            tok = TinyREMITokenizer(tempo_path=work / "tempo.json")
            extract_path = work / "extract.json"
            if not extract_path.exists() or not json.loads(extract_path.read_text() or "[]"):
                # Random-weight extractor may emit nothing; synthesize notes.
                tempo = json.loads((work / "tempo.json").read_text() or "[]")
                span = 240.0
                notes = [
                    {"onset": 0.25 * i, "offset": 0.25 * i + 0.2,
                     "pitch": 48 + (i % 24), "velocity": 80}
                    for i in range(int(span / 0.25))
                ]
                extract_path.write_text(json.dumps(notes))
                tok = TinyREMITokenizer(tempo_path=work / "tempo.json")
            cond_events = tok.encode(extract_path)
            ids = vocab.encode_sequence(cond_events)
            bars = split_sequence_into_bars(ids, vocab.bar_bos_id, vocab.bar_eos_id)
        timings["condition_bars"] = len(bars)

        model_config = EtudeDecoderConfig(vocab_size=max(len(vocab), 256))
        params = init_params(model_config, seed=0)
        engine = GenerationEngine(
            model_config, vocab.bar_bos_id, vocab.bar_eos_id,
            prompt_buckets=(128, 256, 512),
            max_bar_token_limit=cfg.decoder.max_bar_token_limit,
        )
        attrs = [{k: 1 for k in ATTR_KEYS}] * len(bars)
        with timer.span("decode_cold"):
            engine.generate(
                params, bars[: min(len(bars), 12)], attrs[:12],
                temperature=0.0, max_output_tokens=cfg.decoder.max_output_tokens,
            )
        with timer.span("decode"):
            out_bars = engine.generate(
                params, bars, attrs,
                temperature=0.0, max_output_tokens=cfg.decoder.max_output_tokens,
                seed=1,
            )
        timings["generated_tokens"] = sum(len(b) for b in out_bars)

    summary = timer.summary()
    summary.update(timings)
    return summary


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=int, default=240)
    parser.add_argument("--stage", default="all",
                        choices=["all", "extract", "structuralize", "decode"])
    parser.add_argument("--workdir", default="/tmp/etude_bench_pipeline")
    args = parser.parse_args()

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    song = work / "song.wav"
    if not song.exists():
        print(f"synthesizing {args.seconds}s song...", file=sys.stderr)
        synth_song(song, args.seconds)

    t0 = time.perf_counter()
    summary = run_pipeline(work, args.stage)
    summary["total_wall"] = time.perf_counter() - t0
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in summary.items()}))


if __name__ == "__main__":
    main()
