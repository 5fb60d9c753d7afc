#!/usr/bin/env python
"""Generate the decoder's OWN free-running covers over the distillation
corpus and save them as per-song `NNNN_hist.npy` rollout files.

Why: the decoder clones the reference per-bar almost exactly when its
history is the teacher's bars (teacher-forced onset F1 0.903) but drifts
free-running (0.43–0.54) — classic exposure bias: training history is
always the teacher's, inference history is the model's own. DAgger-style
fix: roll out the model over every training song (same oracle per-bar
attribute bins the teacher targets were computed with), store the rollouts,
and fine-tune with history Y bars swapped for the rollouts while the
current-bar target (labels) stays the teacher's
(etude_tpu/data/dataset.py hist_suffix). The training input distribution
then matches inference.

Rollouts use the streaming engine batched over songs (greedy, like
eval_distilled's default) — the whole corpus takes minutes instead of the
rebuild engine's hour.

Usage: python scripts/dagger_rollouts.py --run outputs/train_distill/<id> \
           [--dataset-dir dataset_distill] [--batch 16] [--limit N]
"""

from __future__ import annotations

import os

# Must land in os.environ BEFORE jax is imported anywhere in this process.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etude_tpu.data.dataset import (  # noqa: E402
    bin_attribute,
    calculate_bin_edges,
    compute_relative_attributes,
    extract_bar_features,
    split_ids_into_bars,
)
from etude_tpu.data.vocab import Vocab  # noqa: E402
from etude_tpu.models.decoder import EtudeDecoderConfig  # noqa: E402
from etude_tpu.models.generate_stream import StreamingGenerationEngine  # noqa: E402
from etude_tpu.utils.logger import logger  # noqa: E402

_NAME_TO_KEY = {
    "relative_polyphony": "polyphony_bin",
    "relative_rhythmic_intensity": "rhythm_intensity_bin",
    "relative_note_sustain": "sustain_bin",
    "pitch_overlap_ratio": "pitch_overlap_bin",
}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", required=True, help="training run dir")
    parser.add_argument("--dataset-dir", default="dataset_distill")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--stride", type=int, default=1,
                        help="take every k-th song (variants of one base "
                             "song are adjacent in the dataset, so a stride "
                             "covers every base song at 1/k the cost — for "
                             "DAgger re-aggregation passes where fresh-"
                             "rollout coverage beats variant completeness)")
    parser.add_argument("--stride-offset", type=int, default=0,
                        help="with --stride k: start at this index, so "
                             "successive re-aggregation passes (offset 0, "
                             "1, ...) refresh complementary song subsets")
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--force", action="store_true",
                        help="regenerate existing _hist.npy files")
    parser.add_argument("--skip-newer-than", type=str, default=None,
                        help="with --force: keep _hist.npy files newer than "
                             "this file's mtime (resume an interrupted "
                             "regeneration pass without redoing its work)")
    args = parser.parse_args(argv)

    run = Path(args.run)
    dataset_dir = Path(args.dataset_dir)
    vocab = Vocab.load(dataset_dir / "vocab.json")

    from etude_tpu.models.decoder import init_params
    from etude_tpu.utils.training import load_params_only

    config = EtudeDecoderConfig.from_json_file(
        run / "etude_decoder_config.json"
    )
    params = load_params_only(
        run / "model", init_params(config, seed=0, abstract=True)
    )

    # Song list + per-bar oracle attribute bins (dataset-global edges, the
    # same construction as EtudeDataset / eval_distilled --oracle-attrs).
    songs = []
    tokenized = dataset_dir / "tokenized"
    for subdir in sorted(tokenized.iterdir() if tokenized.exists() else []):
        if not (subdir.is_dir() and subdir.name.isdigit()):
            continue
        src_f = subdir / f"{subdir.name}_src.npy"
        tgt_f = subdir / f"{subdir.name}_tgt.npy"
        if not (src_f.exists() and tgt_f.exists()):
            continue
        src_bars = split_ids_into_bars(
            np.load(src_f).astype(int).tolist(),
            vocab.bar_bos_id, vocab.bar_eos_id,
        )
        tgt_bars = split_ids_into_bars(
            np.load(tgt_f).astype(int).tolist(),
            vocab.bar_bos_id, vocab.bar_eos_id,
        )
        attrs = [
            compute_relative_attributes(
                extract_bar_features(sb, vocab), extract_bar_features(tb, vocab)
            )
            for sb, tb in zip(src_bars, tgt_bars)
        ]
        songs.append({
            "dir": subdir,
            "src_bars": src_bars[: len(attrs)],
            "attrs": attrs,
        })
    if not songs:
        logger.error(f"no tokenized songs under {tokenized}")
        return 1

    # Bin edges must be the dataset-GLOBAL edges training uses — compute
    # them over all songs BEFORE applying --limit, so limited runs condition
    # rollouts on the same edges as full runs.
    edges = calculate_bin_edges(
        [a for s in songs for a in s["attrs"]]
    )
    if args.stride > 1:
        songs = songs[args.stride_offset % args.stride :: args.stride]
    if args.limit:
        songs = songs[: args.limit]

    def bin_maps(attr_list):
        return [
            {
                key: bin_attribute(a[name], edges.get(name))
                for name, key in _NAME_TO_KEY.items()
            }
            for a in attr_list
        ]

    engine = StreamingGenerationEngine(
        config,
        bar_bos_id=vocab.bar_bos_id,
        bar_eos_id=vocab.bar_eos_id,
        pad_id=vocab.pad_id,
    )

    fresh_after = (Path(args.skip_newer_than).stat().st_mtime
                   if args.skip_newer_than else None)

    def _needs(s) -> bool:
        hist = s["dir"] / f"{s['dir'].name}_hist.npy"
        if not hist.exists():
            return True
        if not args.force:
            return False
        return fresh_after is None or hist.stat().st_mtime <= fresh_after

    todo = [s for s in songs if _needs(s)]
    # Lockstep batches run to the longest song in the batch; sort by bar
    # count so batches are homogeneous (and shape buckets get reused).
    todo.sort(key=lambda s: len(s["src_bars"]), reverse=True)
    logger.info(f"{len(todo)}/{len(songs)} songs need rollouts")

    done = 0
    for i in range(0, len(todo), args.batch):
        chunk = todo[i: i + args.batch]
        streams = engine.generate_batch(
            params,
            [s["src_bars"] for s in chunk],
            [bin_maps(s["attrs"]) for s in chunk],
            temperature=args.temperature,
            seed=args.seed + i,
        )
        for s, bars in zip(chunk, streams):
            flat = [t for bar in bars for t in bar]
            out = s["dir"] / f"{s['dir'].name}_hist.npy"
            np.save(out, np.asarray(flat, np.int32))
            done += 1
        logger.info(f"rollouts {done}/{len(todo)}")
    logger.success(f"wrote {done} rollout files under {dataset_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
