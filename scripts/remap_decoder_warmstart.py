#!/usr/bin/env python
"""Warm-start surgery: re-index a trained decoder checkpoint onto a rebuilt
vocabulary (scripts/distill_dataset.py regenerates vocab.json per dataset, so
IDs shift and new tokens appear — e.g. dataset_distill 116 tokens →
dataset_distill_r4 119).

Writes a params-only model dir + updated config JSON that train.py's
`train.init_from` can consume.

Usage:
  python scripts/remap_decoder_warmstart.py \
      --run outputs/train_distill/dagger2_r3 \
      --old-vocab dataset_distill/vocab.json \
      --new-vocab dataset_distill_r4/vocab.json \
      --out outputs/train_distill/dagger2_r3_remap_r4
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import argparse
import dataclasses
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from etude_tpu.data.vocab import Vocab  # noqa: E402
from etude_tpu.models.decoder import EtudeDecoderConfig, init_params  # noqa: E402
from etude_tpu.utils.logger import logger  # noqa: E402
from etude_tpu.utils.model_loader import remap_decoder_vocab  # noqa: E402
from etude_tpu.utils.training import (  # noqa: E402
    load_params_only,
    save_params_only,
)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", required=True)
    parser.add_argument("--old-vocab", required=True)
    parser.add_argument("--new-vocab", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    run = Path(args.run)
    old_vocab = Vocab.load(args.old_vocab)
    new_vocab = Vocab.load(args.new_vocab)
    config = EtudeDecoderConfig.from_json_file(
        run / "etude_decoder_config.json"
    )
    if config.vocab_size != len(old_vocab):
        logger.warn(
            f"checkpoint vocab_size {config.vocab_size} != old vocab "
            f"{len(old_vocab)}"
        )
    params = load_params_only(
        run / "model", init_params(config, abstract=True), cache=False
    )
    params = remap_decoder_vocab(params, old_vocab, new_vocab)
    config = dataclasses.replace(config, vocab_size=len(new_vocab))
    save_params_only(Path(args.out) / "model", params, config)
    logger.success(
        f"remapped {len(old_vocab)}→{len(new_vocab)} tokens → {args.out}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
