#!/usr/bin/env python
"""Root-cause the two WPD audio-path outliers (CPOP07/09 — VERDICT r4 #7).

Round 3's full-audio-path validation (scripts/validate_wpd_audio_path.py)
agreed with the reference's cached warping paths within Δ0.37 on 4/6 songs
but put CPOP07/09 at Δ1.9/1.7, attributed — without a falsifying
experiment — to "the extractor render is a weak chroma proxy for the real
mix". This script runs that experiment:

  1. LOCALIZE: interpolate both mappings t_cover → t_origin (cached real-
     audio path vs recomputed audio path) on a common cover-time grid and
     report where they disagree (fraction of frames off by >1 s, the worst
     contiguous region, and the residual profile by song quarter). A
     structural failure (intro/outro or a repeated section taking a
     different branch) shows up as one localized region; a weak-signal
     failure shows up as broad drift.
  2. PROXY ABLATION: recompute with origin proxy = render(etude_d.mid)
     (decoder cover on the same origin timeline, much closer in register
     and polyphony to the human cover than the extractor dump) — if the
     outlier collapses, the proxy hypothesis is confirmed and etude_e's
     render is the documented cause.
  3. FEATURE ABLATIONS on the worst song: DLNCO weight alpha ∈ {0.2, 0.5,
     0.8} and tuning estimation off — if one of these moves Δ by >0.5 the
     feature config, not the proxy, is the cause.

Reference bar: etude/data/aligner.py:82-121 (features + MrMsDTW on real
recordings; the caches in docs/songs/*/wp.json are its output).

Usage: python scripts/diagnose_wpd_outliers.py [--songs CPOP07 CPOP09 CPOP01]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from etude_tpu.data.aligner import AudioAligner, _FULL_DTW_MAX_CELLS  # noqa: E402
from etude_tpu.data.synthetic import render_piano  # noqa: E402
from etude_tpu.evaluation.metrics.wpd import WPDCalculator  # noqa: E402
from etude_tpu.ops.chroma import chroma_features, estimate_tuning, optimal_chroma_shift  # noqa: E402
from etude_tpu.ops.dtw import dtw_path, mrms_dtw_path  # noqa: E402
from etude_tpu.utils.logger import logger  # noqa: E402
from etude_tpu.utils.midi import read_midi_notes  # noqa: E402

CORPUS = Path("/root/reference/docs/songs")
FEATURE_RATE = 50


def mapping_on_grid(wp: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """t_cover → t_origin interpolated on `grid` (seconds)."""
    t_cover = wp[0] / FEATURE_RATE
    t_origin = wp[1] / FEATURE_RATE
    order = np.argsort(t_cover, kind="stable")
    return np.interp(grid, t_cover[order], t_origin[order])


def compare_paths(wp_a: np.ndarray, wp_b: np.ndarray) -> dict:
    """Localized disagreement between two cover→origin mappings."""
    t_end = min(wp_a[0].max(), wp_b[0].max()) / FEATURE_RATE
    grid = np.arange(0.0, t_end, 0.5)
    if len(grid) < 8:
        return {"error": "paths too short to compare"}
    diff = mapping_on_grid(wp_a, grid) - mapping_on_grid(wp_b, grid)
    absd = np.abs(diff)
    # Worst contiguous region where |diff| > 1 s.
    bad = absd > 1.0
    worst = {"start_s": None, "end_s": None}
    if bad.any():
        edges = np.flatnonzero(np.diff(np.concatenate(([0], bad.view(np.int8), [0]))))
        runs = edges.reshape(-1, 2)
        longest = runs[np.argmax(runs[:, 1] - runs[:, 0])]
        worst = {"start_s": round(float(grid[longest[0]]), 1),
                 "end_s": round(float(grid[min(longest[1], len(grid) - 1)]), 1)}
    quarters = [round(float(np.median(q)), 2) for q in np.array_split(absd, 4)]
    return {
        "frac_off_gt1s": round(float(bad.mean()), 3),
        "median_abs_s": round(float(np.median(absd)), 2),
        "max_abs_s": round(float(absd.max()), 2),
        "worst_region": worst,
        "median_abs_by_quarter_s": quarters,
    }


def align_with(origin: np.ndarray, cover: np.ndarray, fs: int,
               alpha: float = 0.5, use_tuning: bool = True) -> dict:
    """AudioAligner.compute_warping_path with alpha/tuning exposed."""
    tc = estimate_tuning(cover, fs) if use_tuning else 0.0
    to = estimate_tuning(origin, fs) if use_tuning else 0.0
    chroma_c, onset_c = chroma_features(cover, fs, FEATURE_RATE, tc)
    chroma_o, onset_o = chroma_features(origin, fs, FEATURE_RATE, to)
    shift = optimal_chroma_shift(chroma_c, chroma_o)
    chroma_o = np.roll(chroma_o, shift, axis=1)
    onset_o = np.roll(onset_o, shift, axis=1)
    fn = (mrms_dtw_path
          if chroma_c.shape[0] * chroma_o.shape[0] > _FULL_DTW_MAX_CELLS
          else dtw_path)
    wp = fn(chroma_c, onset_c, chroma_o, onset_o, alpha=alpha)
    return {"wp": wp.astype(int), "pitch_shift": int((-shift % 12 + 6) % 12 - 6),
            "num_frames_cover": chroma_c.shape[0],
            "num_frames_origin": chroma_o.shape[0]}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--songs", nargs="+",
                        default=["CPOP07", "CPOP09", "CPOP01"])
    parser.add_argument("--ablate-song", default="CPOP07")
    parser.add_argument("--out", default="validation/wpd_outliers.json")
    args = parser.parse_args(argv)

    aligner = AudioAligner()
    wpd = WPDCalculator()
    report = {"songs": {}, "ablations": {}}

    for name in args.songs:
        d = CORPUS / name
        cached = aligner._load_from_cache(d, "human")
        cached_wpd = wpd.calculate(cached)["wpd_score"]
        cover_notes = read_midi_notes(d / "human.mid")
        dur_c = max(n["offset"] for n in cover_notes) + 0.5
        cover = render_piano(cover_notes, dur_c, sr=aligner.fs)
        row = {"wpd_cached": round(cached_wpd, 3), "proxies": {}}
        for proxy in ("etude_e", "etude_d"):
            t0 = time.time()
            o_notes = read_midi_notes(d / f"{proxy}.mid")
            origin = render_piano(o_notes, max(n["offset"] for n in o_notes) + 0.5,
                                  sr=aligner.fs)
            res = aligner.compute_warping_path(origin, cover)
            score = wpd.calculate(res)["wpd_score"]
            row["proxies"][proxy] = {
                "wpd": round(score, 3),
                "delta_vs_cached": round(abs(score - cached_wpd), 3),
                "pitch_shift": res["pitch_shift"],
                "vs_cached_path": compare_paths(res["wp"], cached["wp"]),
                "align_seconds": round(time.time() - t0, 1),
            }
            logger.info(f"{name}/{proxy}: WPD {score:.3f} "
                        f"(cached {cached_wpd:.3f}) "
                        f"off>1s {row['proxies'][proxy]['vs_cached_path'].get('frac_off_gt1s')}")
        report["songs"][name] = row

    # Feature ablations on the worst song, etude_e proxy.
    d = CORPUS / args.ablate_song
    cached = aligner._load_from_cache(d, "human")
    cached_wpd = wpd.calculate(cached)["wpd_score"]
    cover_notes = read_midi_notes(d / "human.mid")
    cover = render_piano(cover_notes, max(n["offset"] for n in cover_notes) + 0.5,
                         sr=aligner.fs)
    o_notes = read_midi_notes(d / "etude_e.mid")
    origin = render_piano(o_notes, max(n["offset"] for n in o_notes) + 0.5,
                          sr=aligner.fs)
    for label, kw in [("alpha=0.2", {"alpha": 0.2}),
                      ("alpha=0.8", {"alpha": 0.8}),
                      ("no_tuning", {"use_tuning": False})]:
        res = align_with(origin, cover, aligner.fs, **kw)
        score = wpd.calculate(res)["wpd_score"]
        report["ablations"][label] = {
            "song": args.ablate_song, "wpd": round(score, 3),
            "delta_vs_cached": round(abs(score - cached_wpd), 3),
            "vs_cached_path": compare_paths(res["wp"], cached["wp"]),
        }
        logger.info(f"ablation {label}: WPD {score:.3f} vs cached {cached_wpd:.3f}")

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
