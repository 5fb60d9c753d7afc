#!/usr/bin/env python
"""Dataset preparation pipeline (CLI surface mirrors the reference
prepare.py): five resumable, idempotent stages —

  1 download   CSV of (piano, pop) YouTube ids → raw/NNNN/{cover,origin}.wav
  2 preprocess HFT transcription of covers; separation + beat grid of origins
  3 align      origin↔cover DTW, WP-Std filter, weakly-aligned cover notes
  4 extract    condition notes from origin audio
  5 tokenize   REMI-encode both sides, build vocab, save id sequences

Every stage skips work whose outputs already exist, so the pipeline resumes
after interruption. Separation and transcription run in-process as XLA
programs (no subprocess handoff).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from etude_tpu.config import EtudeConfig, load_config
from etude_tpu.data.aligner import AudioAligner
from etude_tpu.data.beat_analyzer import BeatAnalyzer
from etude_tpu.data.beat_detector import BeatDetector
from etude_tpu.data.extractor import AMTAPC_Extractor
from etude_tpu.data.hft import HFT_Transformer
from etude_tpu.data.separation import SourceSeparator
from etude_tpu.data.tokenizer import TinyREMITokenizer
from etude_tpu.data.vocab import Vocab
from etude_tpu.utils.download import download_audio_from_url
from etude_tpu.utils.logger import logger
from etude_tpu.utils.preprocess import (
    compute_wp_std,
    create_time_map_from_downbeats,
    weakly_align,
)

STAGES = ("download", "preprocess", "align", "extract", "tokenize")


def run_stage_1_download(config: EtudeConfig) -> None:
    logger.stage("Downloading raw audio")
    import pandas as pd

    csv_path = Path(config.paths.dataset_csv)
    out_dir = Path(config.paths.raw_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if not csv_path.exists():
        logger.error(f"dataset CSV not found: {csv_path}")
        sys.exit(1)

    df = pd.read_csv(csv_path)
    failed = []
    for index, row in df.iterrows():
        song_dir = out_dir / f"{index + 1:04d}"
        song_dir.mkdir(exist_ok=True)
        ok = True
        for column, name in (("piano_ids", "cover.wav"), ("pop_ids", "origin.wav")):
            target = song_dir / name
            if target.exists():
                continue
            url = f"https://www.youtube.com/watch?v={row[column]}"
            ok = download_audio_from_url(url, target) and ok
        if not ok:
            failed.append(song_dir.name)
    if failed:
        logger.warn(f"{len(failed)} downloads failed: {', '.join(failed[:10])}")


def run_stage_2_preprocess(config: EtudeConfig) -> None:
    logger.stage("Preprocessing (transcription + beat grid)")
    raw_dir = Path(config.paths.raw_dir)
    processed_dir = Path(config.paths.processed_dir)
    processed_dir.mkdir(parents=True, exist_ok=True)

    transcriber = HFT_Transformer(config.hft, model_path=config.paths.hft_model)
    separator = SourceSeparator(model_path=config.paths.separator_model)
    detector = BeatDetector(
        config.beat_detector, model_path=config.paths.beat_detector_model
    )
    analyzer = BeatAnalyzer()

    for song_dir in sorted(d for d in raw_dir.iterdir() if d.is_dir()):
        name = song_dir.name
        out_dir = processed_dir / name
        out_dir.mkdir(exist_ok=True)

        cover = song_dir / "cover.wav"
        transcription = out_dir / "transcription.json"
        if transcription.exists():
            logger.skip(f"{name}: transcription.json exists")
        elif not cover.exists():
            logger.warn(f"{name}: cover.wav missing; skipping transcription")
        else:
            try:
                transcriber.transcribe(cover, transcription)
            except Exception as exc:
                logger.error(f"{name}: transcription failed: {exc}")

        origin = song_dir / "origin.wav"
        tempo_path = out_dir / "tempo.json"
        if tempo_path.exists():
            logger.skip(f"{name}: tempo.json exists")
        elif not origin.exists():
            logger.warn(f"{name}: origin.wav missing; skipping beat grid")
        else:
            try:
                features = separator.separate_features(origin)
                beat_pred_path = out_dir / "beat_pred.json"
                detector.detect(features, beat_pred_path)
                tempo = analyzer.analyze(beat_pred_path)
                analyzer.save_tempo_data(tempo, tempo_path)
            except Exception as exc:
                logger.error(f"{name}: beat grid failed: {exc}")


def run_stage_3_align_and_filter(config: EtudeConfig) -> None:
    logger.stage("Align & filter")
    raw_dir = Path(config.paths.raw_dir)
    processed_dir = Path(config.paths.processed_dir)
    synced_dir = Path(config.paths.aligned_dir)
    synced_dir.mkdir(parents=True, exist_ok=True)
    threshold = config.prepare.align.wp_std_threshold

    aligner = AudioAligner()
    metadata = []
    for song_dir in sorted(d for d in processed_dir.iterdir() if d.is_dir()):
        name = song_dir.name
        final_json = synced_dir / name / "cover.json"
        if final_json.exists():
            metadata.append({"dir_name": name, "status": "kept"})
            logger.skip(f"{name}: already aligned")
            continue

        origin = raw_dir / name / "origin.wav"
        cover = raw_dir / name / "cover.wav"
        beat_pred = song_dir / "beat_pred.json"
        transcription = song_dir / "transcription.json"
        if not all(p.exists() for p in (origin, cover, beat_pred, transcription)):
            logger.warn(f"{name}: missing inputs; skipping")
            continue

        align_result = aligner.align(origin, cover, song_dir)
        if not align_result:
            logger.warn(f"{name}: alignment failed")
            continue

        with open(beat_pred, "r", encoding="utf-8") as f:
            downbeats = json.load(f)["downbeat_pred"]
        time_map = create_time_map_from_downbeats(downbeats, align_result)
        wp_std = compute_wp_std(time_map)
        if wp_std > threshold:
            logger.info(f"{name}: filtered (WP-Std {wp_std:.3f} > {threshold})")
            continue

        with open(transcription, "r", encoding="utf-8") as f:
            notes = json.load(f)
        aligned = weakly_align(notes, time_map)
        final_json.parent.mkdir(exist_ok=True)
        with open(final_json, "w", encoding="utf-8") as f:
            json.dump(aligned, f, indent=4)
        metadata.append({"dir_name": name, "status": "kept", "wp_std": wp_std})

    with open(synced_dir / "metadata.json", "w", encoding="utf-8") as f:
        json.dump(metadata, f, indent=4)
    logger.success(f"aligned {len(metadata)} songs")


def run_stage_4_extract(config: EtudeConfig) -> None:
    logger.stage("Extracting condition notes")
    raw_dir = Path(config.paths.raw_dir)
    synced_dir = Path(config.paths.aligned_dir)
    meta_path = synced_dir / "metadata.json"
    if not meta_path.exists():
        logger.error(f"metadata not found: {meta_path} (run stage 3 first)")
        sys.exit(1)
    with open(meta_path, "r", encoding="utf-8") as f:
        songs = json.load(f)

    extractor = AMTAPC_Extractor(
        config.extractor, model_path=config.paths.extractor_model
    )
    for info in songs:
        if info.get("status") != "kept":
            continue
        name = info["dir_name"]
        out_json = synced_dir / name / "extract.json"
        origin = raw_dir / name / "origin.wav"
        if out_json.exists():
            logger.skip(f"{name}: extract.json exists")
            continue
        if not origin.exists():
            logger.warn(f"{name}: origin.wav missing")
            continue
        extractor.extract(origin, out_json)


def run_stage_5_tokenize(config: EtudeConfig) -> None:
    logger.stage("Tokenizing final dataset")
    synced_dir = Path(config.paths.aligned_dir)
    processed_dir = Path(config.paths.processed_dir)
    tokenized_dir = Path(config.paths.tokenized_dir)
    tokenized_dir.mkdir(parents=True, exist_ok=True)
    vocab_path = Path(config.paths.dataset_vocab)
    fmt = config.prepare.tokenize.save_format

    meta_path = synced_dir / "metadata.json"
    if not meta_path.exists():
        logger.error(f"metadata not found: {meta_path}")
        sys.exit(1)
    with open(meta_path, "r", encoding="utf-8") as f:
        songs = json.load(f)

    all_src, all_tgt, names = [], [], []
    for info in songs:
        if info.get("status") != "kept":
            continue
        name = info["dir_name"]
        tempo = processed_dir / name / "tempo.json"
        src = synced_dir / name / "extract.json"
        tgt = synced_dir / name / "cover.json"
        if not all(p.exists() for p in (tempo, src, tgt)):
            logger.warn(f"{name}: missing tokenization inputs")
            continue
        src_events = TinyREMITokenizer(tempo).encode(src, with_grace_note=True)
        tgt_events = TinyREMITokenizer(tempo).encode(tgt, with_grace_note=True)
        if src_events and tgt_events:
            all_src.append(src_events)
            all_tgt.append(tgt_events)
            names.append(name)

    if not names:
        logger.error("no valid song pairs to tokenize")
        sys.exit(1)

    if vocab_path.exists():
        vocab = Vocab.load(vocab_path)
    else:
        vocab = Vocab()
        vocab.build_from_events(all_src + all_tgt)
        vocab.save(vocab_path)
        logger.info(f"vocabulary built: {len(vocab)} tokens → {vocab_path}")

    for i, _name in enumerate(names):
        subdir = tokenized_dir / f"{i + 1:04d}"
        subdir.mkdir(parents=True, exist_ok=True)
        vocab.save_id_sequence(all_src[i], subdir / f"{i + 1:04d}_src.{fmt}", fmt)
        vocab.save_id_sequence(all_tgt[i], subdir / f"{i + 1:04d}_tgt.{fmt}", fmt)
    logger.success(f"tokenized {len(names)} pairs → {tokenized_dir}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Data preparation pipeline")
    parser.add_argument("--config", type=str, default="configs/default.yaml")
    parser.add_argument("--start-from", type=str, choices=STAGES, default="download")
    parser.add_argument("--run-only", type=str, choices=STAGES, default=None)
    parser.add_argument("--allow-random-weights", action="store_true",
                        help="proceed with random init when model checkpoints "
                             "are missing (smoke/testing only)")
    args = parser.parse_args(argv)

    config = load_config(args.config)

    # Missing model checkpoints are a hard error: a dataset prepared with
    # randomly initialized transcription/beat models is silently worthless.
    stage_models = {
        "preprocess": [("hft transcriber", config.paths.hft_model),
                       ("separator", config.paths.separator_model),
                       ("beat detector", config.paths.beat_detector_model)],
        "extract": [("extractor", config.paths.extractor_model)],
    }
    start_idx = STAGES.index(args.start_from)
    will_run = [s for i, s in enumerate(STAGES)
                if i >= start_idx and (not args.run_only or args.run_only == s)]
    missing = [(n, p) for s in will_run for n, p in stage_models.get(s, [])
               if not Path(p).exists()]
    if missing and not args.allow_random_weights:
        for n, p in missing:
            logger.error(f"{n} checkpoint not found: {p}")
        logger.error(
            "refusing to prepare data with randomly initialized models; "
            "train checkpoints first (scripts/train_aux_synthetic.py) or "
            "pass --allow-random-weights to override"
        )
        return 1
    for n, p in missing:
        logger.warn(f"{n}: running with RANDOM weights ({p} missing)")
    runners = {
        "download": run_stage_1_download,
        "preprocess": run_stage_2_preprocess,
        "align": run_stage_3_align_and_filter,
        "extract": run_stage_4_extract,
        "tokenize": run_stage_5_tokenize,
    }
    start = STAGES.index(args.start_from)
    for i, stage in enumerate(STAGES):
        if i < start:
            continue
        if args.run_only and args.run_only != stage:
            continue
        runners[stage](config)
    logger.success("data preparation finished")
    return 0


if __name__ == "__main__":
    sys.exit(main())
