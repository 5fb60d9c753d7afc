#!/usr/bin/env python
"""Generate pseudo-pop beat-training scenes (VERDICT r4 next-round #3).

Round 4 established that the realistic domain the beat stack RESPONDS to is
pseudo-pop mixtures (beat F 0.884 at eval through the separator, vs 0.30 on
solo-piano corpus renders whose grid supervision three training attempts
showed to be ambiguous). This script turns that eval construction into
TRAINING data, in the serving domain:

  corpus MIDI (snap-gated grids, TRAIN split only — the 8-song eval split of
  scripts/eval_separator_pseudopop.py is never touched)
    → random 512-frame window, expressive piano augmentation (onset jitter,
      transposition, velocity scale, note dropout — labels stay on the grid)
    → five pseudo-pop stems (etude_tpu/data/pseudopop.py: formant vocals,
      the piano, chord pad, bass root line, grid-locked drums with timing
      humanization) with per-stem gain augmentation and stem dropout
      (incl. percussion-less scenes)
    → 44.1 kHz mix, int16-quantized (the serving signal chain)
    → the TRAINED separator's feature transform ([5, T, 128] dB-mel —
      exactly what the beat model sees at serving)
    → beat/downbeat activation labels from the KNOWN grid.

Two stages so host rendering (single-core, hours) can overlap other TPU
work, while feature extraction (device-bound, minutes) runs batched later:

  --stage render     host-only: mixtures + labels → <out>/raw/*.npz
  --stage features   device: raw mixes → separator features → shard_*.npz
                     (the gen_beat_scenes.py shard format consumed by
                     scripts/train_aux_synthetic.py beat --scenes-dir)

Reference analog: the reference's Beat-Transformer was trained on demixed
real pop (etude/data/beat_detector.py:47-55); pseudo-pop is this
environment's closest constructible counterpart (no real stems ship here).

Usage:
  python scripts/gen_pseudopop_scenes.py --stage render  [--n-scenes 1600]
  python scripts/gen_pseudopop_scenes.py --stage features
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from etude_tpu.data.pseudopop import MIX_GAINS, STEM_NAMES, build_stems  # noqa: E402
from etude_tpu.data.synthetic import BEAT_FPS  # noqa: E402
from etude_tpu.utils.logger import logger  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from gen_beat_scenes import T_FRAMES, snap_gated_pool, window_labels  # noqa: E402

# Stem dropout probabilities: teach robustness to thin arrangements,
# including percussion-less passages (the procedural scene corpus is 35%
# percussion-less; pseudo-pop scenes drop drums 20% of the time).
DROP_P = {"vocals": 0.25, "piano": 0.10, "guitar": 0.25, "bass": 0.20,
          "drums": 0.20}


def sample_window(rng: np.random.Generator, pool, dur: float):
    """One augmented pseudo-pop window spec: (aug_notes, b_in, d_in, gains,
    drum_jitter, act, bpm) or None when the sampled window is unusable.
    Shared by the beat-scene path below and the separator fine-tune
    (scripts/train_aux_synthetic.py --pseudopop-mix)."""
    song, version, notes, tempo = pool[rng.integers(len(pool))]
    last = max(n["offset"] for n in notes)
    if last < dur + 2.0:
        return None
    t0 = float(rng.uniform(0.0, last - dur - 1.0))

    act, b_in, d_in, bpm = window_labels(tempo, t0, dur, BEAT_FPS)
    if len(b_in) < 10 or not (40.0 <= bpm <= 260.0):
        return None

    win = [n for n in notes
           if n["onset"] < t0 + dur and n["offset"] > t0 and n["onset"] >= t0 - 2.0]
    if len(win) < 16:
        return None

    transpose = int(rng.integers(-5, 7))
    vel_scale = float(rng.uniform(0.75, 1.25))
    sigma = float(rng.uniform(0.0, 0.030))   # expressive onset jitter (s)
    dropout = float(rng.uniform(0.0, 0.15))
    aug = []
    for n in win:
        if rng.random() < dropout:
            continue
        jit = float(np.clip(rng.normal(0.0, sigma), -2 * sigma, 2 * sigma))
        onset = n["onset"] - t0 + jit
        length = n["offset"] - n["onset"]
        aug.append({
            "onset": max(onset, 0.0),
            "offset": max(onset, 0.0) + length,
            "pitch": int(np.clip(n["pitch"] + transpose, 21, 108)),
            "velocity": int(np.clip(round(n["velocity"] * vel_scale), 1, 127)),
        })
    aug = [n for n in aug if n["offset"] > 0.0 and n["onset"] < dur]
    if len(aug) < 12:
        return None

    gains = {}
    for name in STEM_NAMES:
        if rng.random() < DROP_P[name]:
            gains[name] = 0.0
        else:
            gains[name] = MIX_GAINS[name] * float(rng.uniform(0.6, 1.4))
    if sum(1 for g in gains.values() if g > 0) < 2:
        gains["piano"] = MIX_GAINS["piano"]
        gains["drums"] = MIX_GAINS["drums"]
    return aug, b_in, d_in, gains, float(rng.uniform(0.0, 0.012)), act, bpm


def make_scene_raw(rng: np.random.Generator, pool):
    """One augmented pseudo-pop window → (mix int16 [n], act [T,2] f16,
    tempo i32) or None when the sampled window is unusable."""
    dur = T_FRAMES / BEAT_FPS
    spec = sample_window(rng, pool, dur)
    if spec is None:
        return None
    aug, b_in, d_in, gains, drum_jitter, act, bpm = spec

    mix, _stems, _beats = build_stems(
        aug, b_in, d_in, dur + 0.3, sr=44100,
        seed=int(rng.integers(2 ** 31)),
        gains=gains, drum_jitter=drum_jitter, rng=rng,
    )
    if float(np.abs(mix).max()) < 1e-4:
        return None
    # The mix is already int16-quantized by build_stems; store it losslessly.
    mix_i16 = np.round(mix * 32767.0).astype(np.int16)
    return mix_i16, act.astype(np.float16), np.int32(np.clip(round(bpm), 0, 299))


def stage_render(args) -> int:
    from etude_tpu.data.corpus_render import corpus_song_dirs, split_songs

    train_dirs, eval_dirs = split_songs(corpus_song_dirs(Path(args.corpus)))
    logger.info(f"train split: {len(train_dirs)} songs "
                f"(eval split {len(eval_dirs)} excluded)")
    pool = snap_gated_pool(train_dirs, args.snap_gate)
    logger.info(f"snap-gated pool: {len(pool)} (song, version) grids")
    if not pool:
        logger.error("no snap-gated songs; nothing to generate")
        return 1

    raw = Path(args.out) / "raw"
    raw.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    existing = len(list(raw.glob("scene_*.npz")))
    n_done, attempts = existing, 0
    while n_done < args.n_scenes and attempts < args.n_scenes * 12:
        attempts += 1
        scene = make_scene_raw(rng, pool)
        if scene is None:
            continue
        mix_i16, act, tempo = scene
        np.savez_compressed(
            raw / f"scene_{n_done:05d}.npz",
            mix_i16=mix_i16, activations=act, tempo=tempo,
        )
        n_done += 1
        if n_done % 100 == 0:
            logger.info(f"rendered {n_done}/{args.n_scenes}")
    logger.success(f"rendered {n_done} raw scenes to {raw}")
    return 0


def stage_features(args) -> int:
    from etude_tpu.data.separation import SourceSeparator

    raw = Path(args.out) / "raw"
    files = sorted(raw.glob("scene_*.npz"))
    if not files:
        logger.error(f"no raw scenes under {raw}; run --stage render first")
        return 1
    separator = SourceSeparator(
        model_path=REPO / "checkpoints" / "separator" / "latest.ckpt"
    )
    out = Path(args.out)
    xs, acts, tempos, shard_idx = [], [], [], 0
    for i, f in enumerate(files):
        with np.load(f) as z:
            mix = z["mix_i16"].astype(np.float32) / 32767.0
            act, tempo = z["activations"], z["tempo"]
        feats = separator.separate_features(None, wave_sr=(mix, 44100))
        feats = np.asarray(feats, np.float32)[:, :T_FRAMES]
        if feats.shape[1] < T_FRAMES:
            feats = np.pad(
                feats, ((0, 0), (0, T_FRAMES - feats.shape[1]), (0, 0)),
                constant_values=-80.0)
        xs.append(feats.astype(np.float16))
        acts.append(act.astype(np.float16))
        tempos.append(np.int32(tempo))
        if len(xs) == args.shard_size or i == len(files) - 1:
            np.savez_compressed(
                out / f"shard_{shard_idx:04d}.npz",
                x=np.stack(xs), activations=np.stack(acts),
                tempo=np.asarray(tempos, np.int32),
            )
            shard_idx += 1
            xs, acts, tempos = [], [], []
            if shard_idx % 5 == 0:
                logger.info(f"features {i + 1}/{len(files)} "
                            f"({shard_idx} shards)")
    meta = {"n_scenes": len(files), "shards": shard_idx,
            "t_frames": T_FRAMES, "seed": args.seed, "domain": "pseudo-pop",
            "drop_p": DROP_P}
    with open(out / "meta.json", "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2)
    logger.success(f"wrote {shard_idx} shards ({len(files)} scenes) to {out}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", choices=["render", "features"],
                        required=True)
    parser.add_argument("--n-scenes", type=int, default=1600)
    parser.add_argument("--shard-size", type=int, default=64)
    parser.add_argument("--out",
                        default=str(REPO / "outputs" / "pseudopop_scenes"))
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--snap-gate", type=float, default=0.02)
    parser.add_argument("--corpus", default="/root/reference/docs/songs")
    args = parser.parse_args(argv)
    return (stage_render if args.stage == "render" else stage_features)(args)


if __name__ == "__main__":
    sys.exit(main())
