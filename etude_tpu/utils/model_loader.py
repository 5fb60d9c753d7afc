"""Decoder model loading for inference (reference surface:
etude/utils/model_loader.py — config JSON + weights → ready model)."""

from __future__ import annotations

from pathlib import Path
from typing import Tuple, Union

from .logger import logger
from ..models.decoder import EtudeDecoderConfig, Params, init_params


def load_etude_decoder(
    config_path: Union[str, Path],
    model_path: Union[str, Path],
    seed: int = 0,
) -> Tuple[Params, EtudeDecoderConfig]:
    """Returns (params, config). Falls back to a random initialization with a
    warning when the checkpoint is missing (keeps the pipeline drivable
    before training has produced weights)."""
    config_path, model_path = Path(config_path), Path(model_path)

    if config_path.exists():
        config = EtudeDecoderConfig.from_json_file(config_path)
    else:
        logger.warn(f"decoder config {config_path} not found; using defaults")
        config = EtudeDecoderConfig()

    if model_path.exists() and model_path.suffix in (".pth", ".pt"):
        # Reference torch checkpoint: port the state dict directly.
        import jax

        from .torch_port import load_torch_decoder_checkpoint

        params = jax.device_put(load_torch_decoder_checkpoint(model_path, config))
        logger.info(f"reference torch checkpoint ported from {model_path}")
    elif model_path.exists():
        from .training import load_params_only

        params = load_params_only(
            model_path, init_params(config, seed=seed, abstract=True)
        )
        logger.debug(f"decoder weights loaded from {model_path}")
    else:
        logger.warn(
            f"decoder checkpoint {model_path} not found; using random weights"
        )
        params = init_params(config, seed=seed)
    return params, config
