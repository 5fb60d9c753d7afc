#!/usr/bin/env python
"""Publish a trained decoder run as the default inference checkpoint.

Copies a train.py run's exported inference weights into checkpoints/decoder
(the config default paths: paths.decoder_model/_config/_vocab), downcasting
float params to f16 for in-repo storage (load_params_only promotes back to
the model dtype at load).

Usage: python scripts/publish_decoder.py --run outputs/train_distill/<run_id> \
           [--out checkpoints/decoder] [--meta '{"corpus": "..."}']
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", required=True, help="training run dir")
    parser.add_argument("--out", default=str(REPO / "checkpoints" / "decoder"))
    parser.add_argument("--meta", default=None,
                        help="extra metadata JSON merged into metadata.json")
    args = parser.parse_args(argv)

    run = Path(args.run)
    for name in ("model", "etude_decoder_config.json", "vocab.json"):
        if not (run / name).exists():
            print(f"missing {run / name} — did training complete?",
                  file=sys.stderr)
            return 1

    from etude_tpu.models.decoder import EtudeDecoderConfig, init_params
    from etude_tpu.utils.logger import logger
    from etude_tpu.utils.training import load_params_only, save_aux_params

    config = EtudeDecoderConfig.from_json_file(run / "etude_decoder_config.json")
    params = load_params_only(run / "model", init_params(config, seed=0))

    metadata = {"source_run": str(run)}
    metrics_path = run / "metrics.jsonl"
    if metrics_path.exists():
        lines = metrics_path.read_text().strip().splitlines()
        if lines:
            last = json.loads(lines[-1])
            metadata.update({
                "epochs": last.get("epoch"),
                "final_loss": last.get("loss"),
                "train_tokens_per_sec": last.get("tokens_per_sec"),
            })
    if args.meta:
        metadata.update(json.loads(args.meta))

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    save_aux_params(out / "latest.ckpt", params, metadata=metadata)
    shutil.copy(run / "etude_decoder_config.json", out / "etude_decoder_config.json")
    shutil.copy(run / "vocab.json", out / "vocab.json")
    logger.success(f"published decoder → {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
