#!/usr/bin/env python
"""Build a tokenized training dataset from the reference's rendered corpus.

The reference ships 100 songs with aligned rendered MIDI versions
(docs/songs: etude_e = extractor/condition side, etude_d = reference decoder
output). Pairing them yields a real distillation dataset for the decoder:
src = condition notes, tgt = the reference decoder's covers, both on the
same origin timeline.

The corpus has no tempo.json, so a beat grid is estimated per song. Two
estimators:

  * `--grid tracker` (default): render the target MIDI to audio and run the
    REAL structuralize stage — separation features → Beat-Transformer → DBN
    → BeatAnalyzer — with the trained in-repo checkpoints, exactly as
    serving does (reference: etude/data/beat_detector.py:99-144). Grids come
    out with per-region BPM/time-sig/phase instead of a single global 4/4.
  * `--grid rgc`: the round-2 fallback — RGC-style grid-period inference
    from the target's onsets, 4/4, phase anchored at the first onset.

Because the target MIDI was generated bar-by-bar on a grid, its onsets are
quantized to sub-beat slots of the TRUE grid; each candidate grid is scored
by how well the onsets snap to its eighth-note slots, and the better grid
wins per song (tracker failures fall back to rgc automatically). Either way
the grid is IDENTICAL for src and tgt, so the bar-relative structure the
decoder learns is consistent.

Usage: python scripts/distill_dataset.py --corpus /root/reference/docs/songs \
           --out dataset_distill [--limit N] [--grid tracker|rgc]
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


def grid_slot_times(tempo, horizon: float) -> np.ndarray:
    """All eighth-note slot times implied by a tempo map (the tokenizer's
    sub-beat resolution is eighths of a beat; scoring at beat/8 keeps the
    triplet slots within half a slot of a grid line)."""
    slots = []
    for region in tempo:
        downbeats = list(region["downbeats"])
        if not downbeats:
            continue
        beat = 60.0 / region["bpm"]
        ts = region["time_sig"]
        bar = beat * ts
        downbeats.append(downbeats[-1] + bar)
        for a, b in zip(downbeats[:-1], downbeats[1:]):
            n = max(int(round((b - a) / beat)) * 8, 8)
            slots.append(np.linspace(a, b, n, endpoint=False))
    if not slots:
        return np.zeros(0)
    out = np.concatenate(slots)
    return out[out <= horizon + 1.0]


def grid_fit_score(notes, tempo) -> float:
    """Mean onset distance to the nearest grid slot, in SECONDS (lower is
    better). The target MIDI was generated ON a grid, so the true grid
    scores near zero."""
    onsets = np.unique([n["onset"] for n in notes])
    if len(onsets) == 0 or not tempo:
        return np.inf
    slots = grid_slot_times(tempo, horizon=float(onsets[-1]))
    if len(slots) < 8:
        return np.inf
    idx = np.searchsorted(slots, onsets)
    idx = np.clip(idx, 1, len(slots) - 1)
    d = np.minimum(np.abs(onsets - slots[idx - 1]), np.abs(onsets - slots[idx]))
    return float(d.mean())


class TrackerGrid:
    """Render → separation features → Beat-Transformer → DBN → BeatAnalyzer,
    with the trained in-repo checkpoints (lazily constructed: the rgc mode
    must not touch the device)."""

    def __init__(self, repo: Path):
        self.repo = repo
        self._stack = None

    def _build(self):
        from etude_tpu.data.beat_analyzer import BeatAnalyzer
        from etude_tpu.data.beat_detector import BeatDetector
        from etude_tpu.data.separation import SourceSeparator
        from etude_tpu.config.schema import BeatDetectorConfig

        ckpt = self.repo / "checkpoints"
        self._stack = (
            SourceSeparator(model_path=ckpt / "separator" / "latest.ckpt"),
            BeatDetector(BeatDetectorConfig(),
                         model_path=ckpt / "beat_detector" / "latest.ckpt"),
            BeatAnalyzer(),
        )

    def estimate(self, notes, work_wav: Path):
        from etude_tpu.data.synthetic import render_piano
        from etude_tpu.utils.audio import save_wav

        if self._stack is None:
            self._build()
        separator, detector, analyzer = self._stack
        dur = max(n["offset"] for n in notes) + 1.0
        save_wav(work_wav, render_piano(notes, dur, sr=44100), 44100)
        features = separator.separate_features(work_wav, return_device=True)
        pred = detector.detect(features, cleanup_input=False)
        tempo = analyzer.analyze_predictions(
            pred["beat_pred"], pred["downbeat_pred"]
        )
        tempo = [self._refine_region(r) for r in tempo]
        return self._dephase(tempo, notes)

    @staticmethod
    def _dephase(tempo, notes):
        """Remove the audio chain's constant phase bias: STFT windows see
        onset energy up to half a window early, so DBN beat times land a
        few tens of ms before the notes. The median signed deviation of
        note onsets to their nearest eighth-beat slot measures the bias;
        shifting the grid by it keeps the tracker's period, time signature
        and downbeat choice while aligning phase to the material the grid
        will tokenize."""
        if not tempo or not notes:
            return tempo
        onsets = np.unique([n["onset"] for n in notes])
        slots = grid_slot_times(tempo, horizon=float(onsets[-1]))
        if len(slots) < 8:
            return tempo
        idx = np.clip(np.searchsorted(slots, onsets), 1, len(slots) - 1)
        d_lo = onsets - slots[idx - 1]
        d_hi = onsets - slots[idx]
        signed = np.where(np.abs(d_lo) < np.abs(d_hi), d_lo, d_hi)
        shift = float(np.median(signed))
        if not np.isfinite(shift) or abs(shift) > 0.08:
            return tempo
        return [
            dict(r, start=r["start"] + shift,
                 downbeats=[t + shift for t in r["downbeats"]])
            for r in tempo
        ]

    @staticmethod
    def _refine_region(region):
        """Least-squares (phase, bar-period) fit over a stable region's DBN
        downbeats: the tracker's timestamps are quantized to ~23 ms
        activation frames, and within a stable-tempo region the fit removes
        that noise by ~sqrt(n) while keeping the MEASURED phase and
        time signature (which the RGC-period fallback only assumes)."""
        downbeats = np.asarray(region["downbeats"], float)
        if len(downbeats) < 3:
            return region
        i = np.arange(len(downbeats))
        bar, t0 = np.polyfit(i, downbeats, 1)
        if bar <= 0:
            return region
        return {
            "time_sig": region["time_sig"],
            "bpm": 60.0 * region["time_sig"] / bar,
            "start": float(t0),
            "downbeats": (t0 + i * bar).round(6).tolist(),
        }


def arbitrate_grid(tracker_tempo, tracker_score, rgc_tempo, rgc_score):
    """Per-song grid choice shared by corpus build and evaluation. The snap
    score is blind to downbeat PHASE and time signature (any grid with the
    right period snaps), and those are exactly what the tracker MEASURES
    while the RGC fallback assumes 4/4 anchored at the first onset — so the
    tracker wins whenever its snap is in the same league."""
    if tracker_score is None:
        tracker_score = np.inf
    # A non-finite tracker snap must never win: inf <= max(1.5*inf, ...) is
    # True, which would select a degenerate (<8-slot) tracker grid over the
    # fallback whenever BOTH scores are inf.
    if tracker_tempo and np.isfinite(tracker_score) and (
        tracker_score <= max(1.5 * rgc_score, 0.015)
    ):
        return tracker_tempo, "tracker"
    return rgc_tempo, "rgc"


_PIANO_LO, _PIANO_HI = 21, 108


def _transpose_notes(notes, shift: int):
    """Copy of `notes` with pitches shifted; notes leaving the piano range
    are dropped (shift 0 returns the input unchanged)."""
    if shift == 0:
        return notes
    return [
        dict(n, pitch=n["pitch"] + shift)
        for n in notes
        if _PIANO_LO <= n["pitch"] + shift <= _PIANO_HI
    ]


def _phase_shift_tempo(tempo, k_beats: int):
    """Grid variant with every downbeat moved LATER by k beats: identical
    beat times, different bar segmentation — the music re-windowed. Exact
    by construction (the grid's beat phase is unchanged)."""
    out = []
    for r in tempo:
        beat = 60.0 / r["bpm"]
        out.append(dict(r, downbeats=[d + k_beats * beat
                                      for d in r["downbeats"]]))
    return out


def _double_time_tempo(tempo):
    """Grid variant at double tempo: every bar splits in two (old downbeats
    + bar midpoints), grid slots land on the SAME absolute times at twice
    the resolution. Teaches the decoder the half/double-time labelings the
    serving beat tracker legitimately produces."""
    out = []
    for r in tempo:
        beat = 60.0 / r["bpm"]
        downs = []
        dbs = list(r["downbeats"])
        for i, d in enumerate(dbs):
            nxt = dbs[i + 1] if i + 1 < len(dbs) else d + r["time_sig"] * beat
            downs.extend([d, (d + nxt) / 2.0])
        out.append(dict(r, bpm=r["bpm"] * 2.0, downbeats=downs))
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--corpus", default="/root/reference/docs/songs")
    parser.add_argument("--out", default="dataset_distill")
    parser.add_argument("--src-version", default="etude_e")
    parser.add_argument("--tgt-version", default="etude_d")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--grid", choices=["tracker", "rgc"], default="tracker")
    parser.add_argument(
        "--transpose", type=int, default=0, metavar="K",
        help="also emit copies of every pair transposed by ±1..±K semitones "
        "(src and tgt shifted together; timing/attributes are pitch-"
        "invariant, so the augmented pairs are exact)",
    )
    parser.add_argument(
        "--phase-shifts", type=int, default=0, metavar="P",
        help="also emit copies re-barred with downbeats shifted by 1..P "
        "beats (same beat grid, different bar windows — exact)",
    )
    parser.add_argument(
        "--double-time", action="store_true",
        help="also emit copies encoded on the double-tempo grid (same "
        "absolute slot times at 2x resolution — exact; matches the beat "
        "tracker's legitimate octave ambiguity at serving)",
    )
    args = parser.parse_args(argv)

    corpus = Path(args.corpus)
    out = Path(args.out)
    tokenized = out / "tokenized"
    tokenized.mkdir(parents=True, exist_ok=True)

    with open(corpus / "metadata.json", "r", encoding="utf-8") as f:
        songs = json.load(f)
    if args.limit:
        songs = songs[: args.limit]

    tracker = TrackerGrid(Path(__file__).resolve().parent.parent)
    tempo_cache = out / "tempo"
    tempo_cache.mkdir(parents=True, exist_ok=True)
    grid_stats = Counter()

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
        rgc_score = grid_fit_score(tgt_notes, tempo) if tempo else np.inf
        chosen = "rgc"
        if args.grid == "tracker":
            cache_file = tempo_cache / f"{name}.json"
            if cache_file.exists():
                cached = json.loads(cache_file.read_text())
                tracker_tempo, tracker_score = (
                    cached["tempo"], cached["score"]
                )
            else:
                try:
                    tracker_tempo = tracker.estimate(
                        tgt_notes, Path("/tmp/distill_grid.wav")
                    )
                except Exception as exc:
                    logger.warn(f"{name}: tracker grid failed: {exc}")
                    tracker_tempo = []
                tracker_score = grid_fit_score(tgt_notes, tracker_tempo)
                cache_file.write_text(json.dumps(
                    {"tempo": tracker_tempo, "score": tracker_score
                     if np.isfinite(tracker_score) else None}
                ))
            if tracker_score is None:  # cached non-finite scores store None
                tracker_score = np.inf
            tempo, chosen = arbitrate_grid(
                tracker_tempo, tracker_score, tempo, rgc_score
            )
            logger.info(
                f"{name}: grid={chosen} "
                f"(snap tracker {tracker_score if np.isfinite(tracker_score) else 'inf'} vs "
                f"rgc {rgc_score:.4f})"
            )
        grid_stats[chosen] += 1
        if tempo is None or not tempo:
            continue
        shifts = [0] + [
            s * sign
            for s in range(1, args.transpose + 1)
            for sign in (1, -1)
        ]
        grid_variants = [("", tempo)]
        grid_variants += [(f"_p{k}", _phase_shift_tempo(tempo, k))
                          for k in range(1, args.phase_shifts + 1)]
        if args.double_time:
            grid_variants.append(("_x2", _double_time_tempo(tempo)))
        for vtag, vtempo in grid_variants:
            for shift in shifts:
                src_k = _transpose_notes(src_notes, shift)
                tgt_k = _transpose_notes(tgt_notes, shift)
                if len(src_k) < 32 or len(tgt_k) < 32:
                    continue
                src_events = TinyREMITokenizer(tempo_data=vtempo).encode(
                    src_k, with_grace_note=True
                )
                tgt_events = TinyREMITokenizer(tempo_data=vtempo).encode(
                    tgt_k, with_grace_note=True
                )
                if src_events and tgt_events:
                    all_src.append(src_events)
                    all_tgt.append(tgt_events)
                    tag = ("" if shift == 0 else f"_t{shift:+d}") + vtag
                    names.append(name + tag)
    logger.info(
        f"tokenized {len(names)} song pairs "
        f"(grids: {dict(grid_stats)})"
    )
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
