#!/usr/bin/env python
"""Quantify stream-vs-rebuild generation-engine equivalence (VERDICT #7).

The rebuild engine re-prefills the 4-pair history prompt every bar (exact
reference semantics, /root/reference/etude/models/etude_decoder.py:209-343);
the streaming engine keeps history K/V from when each bar was generated
(documented divergence, etude_tpu/models/generate_stream.py docstring).
Bar 0 is token-exact by test; this script measures whether FULL-SONG outputs
stay equivalent: run scripts/eval_distilled.py once per engine (same songs,
same seed, greedy by default) into two directories, then compare per song:

  * note onset overlap between the two engines' outputs (pitch-exact,
    100 ms tolerance, F1 of one vs the other);
  * note-count ratio;
  * RGC / IPE per engine and their deltas.

Usage: python scripts/eval_engine_parity.py --run outputs/train_distill/<id> \
           --vocab dataset_distill/vocab.json [--songs 10] [--temperature 0]
Prints one JSON aggregate line; per-song rows to stderr via the logger.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etude_tpu.evaluation.metrics import (  # noqa: E402
    IPECalculator,
    RGCCalculator,
    onset_f1,
)
from etude_tpu.utils.logger import logger  # noqa: E402
from etude_tpu.utils.midi import read_midi_notes  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
import eval_distilled  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", required=True)
    parser.add_argument("--vocab", required=True)
    parser.add_argument("--songs", type=int, default=10)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="/tmp/etude_engine_parity")
    parser.add_argument(
        "--reuse", action="store_true",
        help="score existing per-engine output dirs without regenerating",
    )
    args = parser.parse_args(argv)

    out = Path(args.out)
    dirs = {}
    for engine in ("rebuild", "stream"):
        dirs[engine] = out / engine
        if args.reuse and any(dirs[engine].glob("*_ours.mid")):
            continue
        rc = eval_distilled.main([
            "--run", args.run, "--vocab", args.vocab,
            "--songs", str(args.songs), "--engine", engine,
            "--temperature", str(args.temperature),
            "--seed", str(args.seed), "--out", str(dirs[engine]),
        ])
        if rc != 0:
            logger.error(f"eval_distilled failed for engine {engine}")
            return rc

    rgc, ipe = RGCCalculator(top_k=8), IPECalculator(n_gram=8, n_clusters=16)
    rows = []
    for rb_mid in sorted(dirs["rebuild"].glob("*_ours.mid")):
        st_mid = dirs["stream"] / rb_mid.name
        if not st_mid.exists():
            continue
        rb_notes = read_midi_notes(rb_mid)
        st_notes = read_midi_notes(st_mid)
        row = {
            "song": rb_mid.name.replace("_ours.mid", ""),
            "notes_rebuild": len(rb_notes),
            "notes_stream": len(st_notes),
            "cross_f1": onset_f1(rb_notes, st_notes, tolerance=0.1)["f1"],
        }
        for name, path in (("rebuild", rb_mid), ("stream", st_mid)):
            row[f"rgc_{name}"] = rgc.calculate(path).get("rgc_score")
            row[f"ipe_{name}"] = ipe.calculate(path).get("ipe_score")
        rows.append(row)

        def fmt(v, spec):  # metric .get() returns None on degenerate MIDIs
            return format(v, spec) if v is not None else "n/a"

        logger.info(
            f"{row['song']}: cross-F1 {row['cross_f1']:.3f} "
            f"notes {row['notes_rebuild']}/{row['notes_stream']} "
            f"rgc {fmt(row['rgc_rebuild'], '.4f')}/{fmt(row['rgc_stream'], '.4f')} "
            f"ipe {fmt(row['ipe_rebuild'], '.2f')}/{fmt(row['ipe_stream'], '.2f')}"
        )

    if not rows:
        return 1

    def mean_of(key):
        vals = [r[key] for r in rows if r.get(key) is not None]
        return float(np.mean(vals)) if vals else None

    agg = {
        "songs": len(rows),
        "mean_cross_f1": mean_of("cross_f1"),
        "mean_rgc_rebuild": mean_of("rgc_rebuild"),
        "mean_rgc_stream": mean_of("rgc_stream"),
        "mean_ipe_rebuild": mean_of("ipe_rebuild"),
        "mean_ipe_stream": mean_of("ipe_stream"),
        "temperature": args.temperature,
        "seed": args.seed,
        "rows": rows,
    }
    print(json.dumps(agg))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
