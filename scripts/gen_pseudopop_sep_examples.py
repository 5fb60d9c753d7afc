#!/usr/bin/env python
"""Pre-render pseudo-pop separator training examples (host-only).

The separator's pseudo-pop fine-tune (scripts/train_aux_synthetic.py
separator --pseudopop-mix) renders five-stem audio windows on the fly; on
this single-core host that rendering dominates the training step and
starves the TPU. Same split as the beat-scene generator
(gen_pseudopop_scenes.py): render here on the host — overlapping other TPU
work — and let the fine-tune consume the shards via --pseudopop-cache.

Each example is the separator training contract through the serving STFT
(etude_tpu/data/pseudopop.py separation_example_from_stems):
  mix_mag   [T, F]    int16-quantized mixture magnitude
  stem_mags [5, T, F] clean gain-scaled stem magnitudes

Usage:
  python scripts/gen_pseudopop_sep_examples.py [--n 1200] [--sep-frames 256]
  python scripts/train_aux_synthetic.py separator --pseudopop-mix 0.5 \
      --pseudopop-cache outputs/pseudopop_sep_examples --init-from ...
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from etude_tpu.data import corpus_render as cr  # noqa: E402
from etude_tpu.data.pseudopop import (  # noqa: E402
    build_stems,
    separation_example_from_stems,
)
from etude_tpu.utils.logger import logger  # noqa: E402

from gen_beat_scenes import snap_gated_pool  # noqa: E402
from gen_pseudopop_scenes import sample_window  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1200)
    parser.add_argument("--sep-frames", type=int, default=256)
    parser.add_argument("--shard-size", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--snap-gate", type=float, default=0.02)
    parser.add_argument("--out",
                        default=str(REPO / "outputs" /
                                    "pseudopop_sep_examples"))
    args = parser.parse_args(argv)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    done = sum(
        int(np.load(f, mmap_mode="r")["mix_mag"].shape[0])
        for f in sorted(out.glob("shard_*.npz"))
    ) if list(out.glob("shard_*.npz")) else 0
    if done >= args.n:
        logger.success(f"{done} examples already under {out}")
        return 0

    train_dirs, _ = cr.split_songs(cr.corpus_song_dirs())
    pool = snap_gated_pool(train_dirs, args.snap_gate)
    logger.info(f"pseudo-pop pool: {len(pool)} grids (TRAIN split only)")

    rng = np.random.default_rng(args.seed + done)
    T = args.sep_frames
    dur = (T * 1024) / 44100.0 + 0.05

    mixes, stems_l = [], []
    shard_idx = len(list(out.glob("shard_*.npz")))
    n_new = 0
    while done + n_new < args.n:
        spec = sample_window(rng, pool, dur)
        if spec is None:
            continue
        aug, b_in, d_in, gains, drum_jitter, _act, _bpm = spec
        mix, stems, _ = build_stems(
            aug, b_in, d_in, dur, sr=44100,
            seed=int(rng.integers(2 ** 31)),
            gains=gains, drum_jitter=drum_jitter, rng=rng,
        )
        if float(np.abs(mix).max()) < 1e-4:
            continue
        ex = separation_example_from_stems(mix, stems, T=T)
        mixes.append(ex["mix_mag"].astype(np.float16))
        stems_l.append(ex["stem_mags"].astype(np.float16))
        n_new += 1
        if len(mixes) >= args.shard_size or done + n_new >= args.n:
            np.savez_compressed(
                out / f"shard_{shard_idx:04d}.npz",
                mix_mag=np.stack(mixes), stem_mags=np.stack(stems_l),
            )
            shard_idx += 1
            mixes, stems_l = [], []
            logger.info(f"examples {done + n_new}/{args.n} "
                        f"({shard_idx} shards)")

    with open(out / "meta.json", "w", encoding="utf-8") as f:
        json.dump({"n": done + n_new, "t_frames": T, "seed": args.seed,
                   "domain": "pseudo-pop serving STFT"}, f, indent=2)
    logger.success(f"wrote {done + n_new} examples to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
