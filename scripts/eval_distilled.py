#!/usr/bin/env python
"""Evaluate a trained decoder by generating covers for reference-corpus songs.

For each song: condition = etude_e.mid notes on the song's beat grid (the
cached tracker grid from scripts/distill_dataset.py when present, else the
RGC-period estimate — the SAME grid used to build the training corpus),
generate with the trained decoder, decode to MIDI, and score RGC / IPE of
our output plus onset-F1 against the distillation target (etude_d.mid).
Prints one JSON line of aggregate means.

Attribute conditioning:
  * default: fixed bins 1/1/1 + overlap 2 (the reference CLI defaults) —
    measures style-prompted behavior;
  * --oracle-attrs: per-bar attribute bins computed from the actual
    (etude_e, etude_d) pair with corpus-global bin edges — the bins the
    distillation training saw, so behavior-cloning fidelity is measured
    without attribute mismatch (reference analog: the TRUE conditioning
    under which etude_d was produced is unknown; the dataset formulas
    etude/data/dataset.py:228-332 are the closest observable stand-in).

Temperature defaults to 0.0 (greedy — the reference inference default,
etude/config/schema.py:222) so distillation match is measured without
sampling noise; pass --temperature 0.8 for the stochastic setting.

Usage: python scripts/eval_distilled.py --run outputs/train_distill/<id> \
           --vocab dataset_distill/vocab.json [--songs 10] [--oracle-attrs]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etude_tpu.data.dataset import (  # noqa: E402
    bin_attribute,
    calculate_bin_edges,
    compute_relative_attributes,
    extract_bar_features,
)
from etude_tpu.data.tokenizer import TinyREMITokenizer, split_sequence_into_bars  # noqa: E402
from etude_tpu.data.vocab import Vocab  # noqa: E402
from etude_tpu.evaluation.metrics import IPECalculator, RGCCalculator, onset_f1  # noqa: E402
from etude_tpu.models.decoder import EtudeDecoderConfig, init_params  # noqa: E402
from etude_tpu.models.generate import GenerationEngine  # noqa: E402
from etude_tpu.utils.logger import logger  # noqa: E402
from etude_tpu.utils.midi import read_midi_notes, write_midi  # noqa: E402
from etude_tpu.utils.training import load_params_only  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from distill_dataset import estimate_tempo_grid  # noqa: E402

# compute_relative_attributes / calculate_bin_edges key → engine attr key.
_NAME_TO_KEY = {
    "relative_polyphony": "polyphony_bin",
    "relative_rhythmic_intensity": "rhythm_intensity_bin",
    "relative_note_sustain": "sustain_bin",
    "pitch_overlap_ratio": "pitch_overlap_bin",
}
_ATTR_NAMES = tuple(_NAME_TO_KEY)


def song_grid(name: str, tgt_notes, dataset_dir: Path):
    """The grid the training corpus used: cached tracker grid if present
    (distill_dataset --grid tracker), else the RGC-period estimate."""
    cache = dataset_dir / "tempo" / f"{name}.json"
    rgc_tempo = estimate_tempo_grid(tgt_notes)
    if cache.exists():
        from distill_dataset import arbitrate_grid

        data = json.loads(cache.read_text())
        tempo = data.get("tempo")
        if tempo:
            rgc_score = _snap_score(tgt_notes, rgc_tempo)
            chosen, _ = arbitrate_grid(
                tempo, data.get("score"), rgc_tempo, rgc_score
            )
            return chosen
    return rgc_tempo


def _snap_score(notes, tempo):
    from distill_dataset import grid_fit_score

    return grid_fit_score(notes, tempo) if tempo else np.inf


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", required=True, help="training run dir")
    parser.add_argument("--vocab", required=True)
    parser.add_argument("--corpus", default="/root/reference/docs/songs")
    parser.add_argument("--dataset-dir", default="dataset_distill")
    parser.add_argument("--songs", type=int, default=10)
    parser.add_argument("--out", default="/tmp/etude_distill/eval")
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--oracle-attrs", action="store_true")
    parser.add_argument("--predicted-attrs", action="store_true",
                        help="per-bar bins from the trained attribute "
                             "predictor (checkpoints/attr_prior, "
                             "scripts/train_attr_prior.py) — the default-"
                             "serving mode without oracle access")
    parser.add_argument("--attr-temperature", type=float, default=0.0,
                        help="sampling temperature for --predicted-attrs "
                             "(0 = argmax)")
    parser.add_argument("--attr-prior-path", default=None)
    parser.add_argument("--engine", choices=["rebuild", "stream"],
                        default="rebuild")
    parser.add_argument("--kv-quant", action="store_true",
                        help="stream engine int8 KV cache (quality gate for "
                             "enabling it in serving/bench)")
    parser.add_argument("--teacher-forced-history", action="store_true",
                        help="history receives the TRUE etude_d bars instead "
                             "of generated ones: per-bar cloning fidelity "
                             "without free-running drift (rebuild engine "
                             "only)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    run = Path(args.run)
    vocab = Vocab.load(args.vocab)
    config = EtudeDecoderConfig.from_json_file(run / "etude_decoder_config.json")
    # A training run dir stores params under model/; the published artifact
    # (checkpoints/decoder, scripts/publish_decoder.py) under latest.ckpt —
    # accept both so A/Bs can run against the exact shipped weights.
    params_dir = run / "model" if (run / "model").exists() else run / "latest.ckpt"
    params = load_params_only(params_dir, init_params(config, seed=0))

    if args.teacher_forced_history and args.engine != "rebuild":
        logger.error("--teacher-forced-history requires --engine rebuild")
        return 1
    if args.engine == "stream":
        from etude_tpu.models.generate_stream import StreamingGenerationEngine

        # prompt_cap 512 = the reference's effective window (max_pos 1024 −
        # its default bar limit 512); without the override the engine derives
        # cap 1024 − 64 = 960 from the eval-speed bar limit. 512 also keeps
        # prompt_keep == cap − 1 (monotone win_start), matching the rebuild
        # engine's 512-token prompt bucket below.
        engine = StreamingGenerationEngine(
            config, vocab.bar_bos_id, vocab.bar_eos_id, pad_id=vocab.pad_id,
            max_bar_token_limit=64, prompt_cap=512, kv_quant=args.kv_quant,
        )
    else:
        engine = GenerationEngine(
            config, vocab.bar_bos_id, vocab.bar_eos_id, pad_id=vocab.pad_id,
            prompt_buckets=(512,), max_bar_token_limit=64,
        )
    attrs_default = {"polyphony_bin": 1, "rhythm_intensity_bin": 1,
                     "sustain_bin": 1, "pitch_overlap_bin": 2}

    corpus = Path(args.corpus)
    dataset_dir = Path(args.dataset_dir)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(corpus / "metadata.json", "r", encoding="utf-8") as f:
        songs = json.load(f)[: args.songs]

    # ---- pass 1: tokenize all songs; collect per-bar attributes ---------
    prepared = []
    all_attrs = []
    for meta in songs:
        name = meta["dir_name"]
        song_dir = corpus / name
        try:
            src_notes = read_midi_notes(song_dir / "etude_e.mid")
            tgt_notes = read_midi_notes(song_dir / "etude_d.mid")
        except Exception:
            continue
        tempo = song_grid(name, tgt_notes, dataset_dir)
        if tempo is None or not tempo:
            continue
        tok = TinyREMITokenizer(tempo_data=tempo)
        src_ids = vocab.encode_sequence(tok.encode(src_notes, with_grace_note=True))
        src_bars = split_sequence_into_bars(
            src_ids, vocab.bar_bos_id, vocab.bar_eos_id
        )
        if not src_bars:
            continue
        entry = {"name": name, "tempo": tempo, "src_bars": src_bars,
                 "tgt_notes": tgt_notes}
        if args.oracle_attrs or args.teacher_forced_history:
            tgt_ids = vocab.encode_sequence(
                TinyREMITokenizer(tempo_data=tempo).encode(
                    tgt_notes, with_grace_note=True
                )
            )
            tgt_bars = split_sequence_into_bars(
                tgt_ids, vocab.bar_bos_id, vocab.bar_eos_id
            )
            entry["tgt_bars"] = tgt_bars
        if args.oracle_attrs:
            n = min(len(src_bars), len(tgt_bars))
            attrs = [
                compute_relative_attributes(
                    extract_bar_features(src_bars[i], vocab),
                    extract_bar_features(tgt_bars[i], vocab),
                )
                for i in range(n)
            ]
            entry["attrs_raw"] = attrs
            all_attrs.extend(attrs)
        prepared.append(entry)

    # Oracle bins must use the edges the distillation TRAINING fit — the
    # dataset-global mean±k·std edges over the full tokenized corpus — not
    # edges refit on the small eval subset (which shift with --songs and
    # re-bin bars differently than training saw them).
    edges = None
    if args.oracle_attrs:
        tokenized = dataset_dir / "tokenized"
        if tokenized.exists():
            from etude_tpu.data.dataset import EtudeDataset

            edges = EtudeDataset(
                tokenized, vocab, max_seq_len=1024
            ).attribute_bin_edges
        else:
            logger.warn(
                f"{tokenized} missing; oracle bin edges fall back to the "
                f"{len(songs)}-song eval subset"
            )
            edges = calculate_bin_edges(all_attrs) if all_attrs else None

    prior = None
    if args.predicted_attrs:
        from etude_tpu.models.attr_prior import AttrPrior

        prior_path = args.attr_prior_path or (
            Path(__file__).resolve().parent.parent / "checkpoints" / "attr_prior"
        )
        prior = AttrPrior.load(prior_path)
        logger.info(f"attribute predictor loaded from {prior_path}")

    rgc, ipe = RGCCalculator(top_k=8), IPECalculator(n_gram=8, n_clusters=16)
    rows = []
    for entry in prepared:
        name, tempo = entry["name"], entry["tempo"]
        bars = entry["src_bars"]
        if prior is not None:
            per_bar = prior.predict_bins(
                bars, vocab, temperature=args.attr_temperature, seed=args.seed
            )
        elif args.oracle_attrs:
            per_bar = []
            for i in range(len(bars)):
                if i < len(entry["attrs_raw"]):
                    raw = entry["attrs_raw"][i]
                    per_bar.append({
                        _NAME_TO_KEY[nm]: bin_attribute(raw[nm], edges.get(nm))
                        for nm in _ATTR_NAMES
                    })
                else:
                    per_bar.append(dict(attrs_default))
        else:
            per_bar = [attrs_default] * len(bars)

        if args.teacher_forced_history:
            generated = engine.generate_batch(
                params, [bars], [per_bar],
                temperature=args.temperature, top_p=0.9, seed=args.seed,
                forced_history_y=[entry["tgt_bars"]],
            )[0]
        else:
            generated = engine.generate(
                params, bars, per_bar,
                temperature=args.temperature, top_p=0.9, seed=args.seed,
            )
        gen_events = [e for bar in generated
                      for e in vocab.decode_sequence_to_events(bar)]
        notes = TinyREMITokenizer(tempo_data=tempo).decode_to_notes(gen_events)
        midi_path = out_dir / f"{name}_ours.mid"
        write_midi(notes, midi_path)

        row = {"song": name, "n_notes": len(notes)}
        r = rgc.calculate(midi_path)
        row["rgc"] = r.get("rgc_score")
        row["ipe"] = ipe.calculate(midi_path).get("ipe_score")
        row["onset_f1_vs_target"] = onset_f1(
            entry["tgt_notes"], notes, tolerance=0.1
        )["f1"]
        rows.append(row)
        logger.info(f"{name}: notes={row['n_notes']} rgc={row['rgc']} "
                    f"ipe={row['ipe']} f1={row['onset_f1_vs_target']:.3f}")

    if not rows:
        return 1

    def mean_of(key):
        vals = [r[key] for r in rows if r.get(key) is not None]
        return float(np.mean(vals)) if vals else None

    agg = {
        "songs": len(rows),
        "mean_rgc": mean_of("rgc"),
        "mean_ipe": mean_of("ipe"),
        "mean_onset_f1_vs_target": mean_of("onset_f1_vs_target"),
        "mean_notes": mean_of("n_notes"),
        "oracle_attrs": bool(args.oracle_attrs),
        "predicted_attrs": bool(args.predicted_attrs),
        "temperature": args.temperature,
        "engine": args.engine,
    }
    print(json.dumps(agg))
    return 0


if __name__ == "__main__":
    sys.exit(main())
