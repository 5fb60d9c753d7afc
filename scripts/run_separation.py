#!/usr/bin/env python
"""Standalone source-separation worker (CLI parity with the reference
scripts/run_separation.py): audio in → (5, time, 128) dB-mel features npy.

Unlike the reference this is NOT required to run in a separate environment —
infer.py/prepare.py call the separator in-process — but the CLI remains for
scripted use and for feature-file compatibility with reference work dirs.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etude_tpu.data.separation import SourceSeparator  # noqa: E402
from etude_tpu.utils.logger import logger  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="5-stem separation → mel feature extraction"
    )
    parser.add_argument("--input", required=True, help="input audio file")
    parser.add_argument("--output", required=True, help="output .npy path")
    parser.add_argument("--model", default=None, help="separator checkpoint")
    parser.add_argument(
        "--backend", default="jax_unet", choices=["jax_unet"],
        help="separation backend (in-graph U-Net)"
    )
    args = parser.parse_args(argv)

    if not Path(args.input).exists():
        logger.error(f"input audio not found: {args.input}")
        return 1

    separator = SourceSeparator(model_path=args.model)
    features = separator.separate_features(args.input, args.output)
    logger.success(f"features {features.shape} → {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
