#!/usr/bin/env python
"""Evaluate a trained decoder by generating covers for reference-corpus songs.

For each song: condition = etude_e.mid notes on the estimated beat grid (the
same grid construction as scripts/distill_dataset.py), generate with the
trained decoder (default attributes 1/1/1 + overlap 2), decode to MIDI, and
score RGC / IPE of our output plus onset-F1 against the distillation target
(etude_d.mid). Prints one JSON line of aggregate means.

Usage: python scripts/eval_distilled.py --run /tmp/etude_distill/out/distill \
           --vocab /tmp/etude_distill/dataset/vocab.json [--songs 10]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etude_tpu.data.tokenizer import TinyREMITokenizer, split_sequence_into_bars  # noqa: E402
from etude_tpu.data.vocab import Vocab  # noqa: E402
from etude_tpu.evaluation.metrics import IPECalculator, RGCCalculator, onset_f1  # noqa: E402
from etude_tpu.models.decoder import EtudeDecoderConfig, init_params  # noqa: E402
from etude_tpu.models.generate import ATTR_KEYS, GenerationEngine  # noqa: E402
from etude_tpu.utils.logger import logger  # noqa: E402
from etude_tpu.utils.midi import read_midi_notes, write_midi  # noqa: E402
from etude_tpu.utils.training import load_params_only  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from distill_dataset import estimate_tempo_grid  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", required=True, help="training run dir")
    parser.add_argument("--vocab", required=True)
    parser.add_argument("--corpus", default="/root/reference/docs/songs")
    parser.add_argument("--songs", type=int, default=10)
    parser.add_argument("--out", default="/tmp/etude_distill/eval")
    parser.add_argument("--temperature", type=float, default=0.8)
    args = parser.parse_args(argv)

    run = Path(args.run)
    vocab = Vocab.load(args.vocab)
    config = EtudeDecoderConfig.from_json_file(run / "etude_decoder_config.json")
    params = load_params_only(run / "model", init_params(config, seed=0))

    engine = GenerationEngine(
        config, vocab.bar_bos_id, vocab.bar_eos_id, pad_id=vocab.pad_id,
        prompt_buckets=(512,), max_bar_token_limit=64,
    )
    attrs_default = {"polyphony_bin": 1, "rhythm_intensity_bin": 1,
                     "sustain_bin": 1, "pitch_overlap_bin": 2}

    corpus = Path(args.corpus)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(corpus / "metadata.json", "r", encoding="utf-8") as f:
        songs = json.load(f)[: args.songs]

    rgc, ipe = RGCCalculator(top_k=8), IPECalculator(n_gram=8, n_clusters=16)
    rows = []
    for meta in songs:
        name = meta["dir_name"]
        song_dir = corpus / name
        try:
            src_notes = read_midi_notes(song_dir / "etude_e.mid")
            tgt_notes = read_midi_notes(song_dir / "etude_d.mid")
        except Exception:
            continue
        tempo = estimate_tempo_grid(tgt_notes)
        if tempo is None:
            continue
        tok = TinyREMITokenizer(tempo_data=tempo)
        events = tok.encode(src_notes, with_grace_note=True)
        ids = vocab.encode_sequence(events)
        bars = split_sequence_into_bars(ids, vocab.bar_bos_id, vocab.bar_eos_id)
        if not bars:
            continue

        generated = engine.generate(
            params, bars, [attrs_default] * len(bars),
            temperature=args.temperature, top_p=0.9, seed=0,
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
        row["onset_f1_vs_target"] = onset_f1(tgt_notes, notes, tolerance=0.1)["f1"]
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
    }
    print(json.dumps(agg))
    return 0


if __name__ == "__main__":
    sys.exit(main())
