#!/usr/bin/env python
"""Build a tokenized training dataset from the reference's rendered corpus.

The reference ships 100 songs with aligned rendered MIDI versions
(docs/songs: etude_e = extractor/condition side, etude_d = reference decoder
output). Pairing them yields a real distillation dataset for the decoder:
src = condition notes, tgt = the reference decoder's covers, both on the
same origin timeline.

The corpus has no tempo.json, so a beat grid is estimated per song from the
target's onsets (RGC-style grid-period inference scaled into a plausible BPM
range, 4/4 downbeats anchored at the first onset). The grid is crude but
IDENTICAL for src and tgt, so the bar-relative structure the decoder learns
is consistent.

Usage: python scripts/distill_dataset.py --corpus /root/reference/docs/songs \
           --out dataset_distill [--limit N]
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etude_tpu.data.tokenizer import TinyREMITokenizer  # noqa: E402
from etude_tpu.data.vocab import Vocab  # noqa: E402
from etude_tpu.utils.logger import logger  # noqa: E402
from etude_tpu.utils.midi import read_midi_notes  # noqa: E402


def estimate_tempo_grid(notes, min_bpm=70.0, max_bpm=180.0):
    """4/4 grid from note onsets: infer the dominant IOI period, scale it by
    powers of two into the BPM range, anchor downbeats at the first onset."""
    onsets = np.unique([n["onset"] for n in notes])
    if len(onsets) < 16:
        return None
    iois = np.diff(onsets)
    counts = Counter(np.round(iois, 2))
    candidates = [v for v, _ in counts.most_common(8) if v >= 0.05]
    if not candidates:
        return None

    best_tau, best_dev = None, np.inf
    arr = np.array(candidates)
    for tau in arr:
        ratios = arr / tau
        dev = float(np.mean(np.abs(ratios - np.round(ratios))))
        if dev < best_dev:
            best_tau, best_dev = float(tau), dev

    beat = best_tau
    lo, hi = 60.0 / max_bpm, 60.0 / min_bpm
    while beat < lo:
        beat *= 2
    while beat > hi:
        beat /= 2
    bpm = 60.0 / beat

    start = float(onsets[0])
    end = float(max(n["offset"] for n in notes))
    bar = 4 * beat
    n_bars = max(int(np.ceil((end - start) / bar)), 1)
    downbeats = [round(start + i * bar, 6) for i in range(n_bars)]
    return [{
        "time_sig": 4,
        "bpm": round(bpm, 4),
        "start": downbeats[0],
        "downbeats": downbeats,
    }]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--corpus", default="/root/reference/docs/songs")
    parser.add_argument("--out", default="dataset_distill")
    parser.add_argument("--src-version", default="etude_e")
    parser.add_argument("--tgt-version", default="etude_d")
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args(argv)

    corpus = Path(args.corpus)
    out = Path(args.out)
    tokenized = out / "tokenized"
    tokenized.mkdir(parents=True, exist_ok=True)

    with open(corpus / "metadata.json", "r", encoding="utf-8") as f:
        songs = json.load(f)
    if args.limit:
        songs = songs[: args.limit]

    all_src, all_tgt, names = [], [], []
    for meta in songs:
        name = meta.get("dir_name")
        song_dir = corpus / name
        src_mid = song_dir / f"{args.src_version}.mid"
        tgt_mid = song_dir / f"{args.tgt_version}.mid"
        if not (src_mid.exists() and tgt_mid.exists()):
            continue
        try:
            src_notes = read_midi_notes(src_mid)
            tgt_notes = read_midi_notes(tgt_mid)
        except Exception as exc:
            logger.warn(f"{name}: MIDI parse failed: {exc}")
            continue
        if len(src_notes) < 32 or len(tgt_notes) < 32:
            continue
        tempo = estimate_tempo_grid(tgt_notes)
        if tempo is None:
            continue
        src_events = TinyREMITokenizer(tempo_data=tempo).encode(
            src_notes, with_grace_note=True
        )
        tgt_events = TinyREMITokenizer(tempo_data=tempo).encode(
            tgt_notes, with_grace_note=True
        )
        if src_events and tgt_events:
            all_src.append(src_events)
            all_tgt.append(tgt_events)
            names.append(name)
    logger.info(f"tokenized {len(names)} song pairs")
    if not names:
        return 1

    # Always rebuild the vocabulary from the full event set — reusing a
    # vocab built from a smaller corpus would silently map unseen tokens to
    # <UNK> in the saved sequences.
    vocab_path = out / "vocab.json"
    vocab = Vocab()
    vocab.build_from_events(all_src + all_tgt)
    if vocab_path.exists():
        logger.warn(f"overwriting existing vocabulary at {vocab_path}")
    vocab.save(vocab_path)
    logger.info(f"vocab: {len(vocab)} tokens")

    for i in range(len(names)):
        subdir = tokenized / f"{i + 1:04d}"
        subdir.mkdir(parents=True, exist_ok=True)
        vocab.save_id_sequence(all_src[i], subdir / f"{i + 1:04d}_src.npy")
        vocab.save_id_sequence(all_tgt[i], subdir / f"{i + 1:04d}_tgt.npy")
    logger.success(f"dataset written → {tokenized}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
