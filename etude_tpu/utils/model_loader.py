"""Decoder model loading for inference (reference surface:
etude/utils/model_loader.py — config JSON + weights → ready model)."""

from __future__ import annotations

import re
from pathlib import Path
from typing import Tuple, Union

import numpy as np

from .logger import logger
from ..models.decoder import EtudeDecoderConfig, Params, init_params


def _nearest_token_id(token: str, token_to_id: dict) -> int | None:
    """ID of the same-type token with the closest numeric value (e.g. the
    vocab gains Note_103 → borrow Note_102's rows), or None."""
    m = re.match(r"^([A-Za-z]+)_(-?\d+)$", token)
    if not m:
        return None
    type_, value = m.group(1), int(m.group(2))
    best, best_dist = None, None
    for tok, tid in token_to_id.items():
        m2 = re.match(r"^([A-Za-z]+)_(-?\d+)$", tok)
        if not m2 or m2.group(1) != type_:
            continue
        dist = abs(int(m2.group(2)) - value)
        if best_dist is None or dist < best_dist:
            best, best_dist = tid, dist
    return best


def remap_decoder_vocab(params: Params, old_vocab, new_vocab) -> Params:
    """Re-index `word_emb` rows and `lm_head` columns from one vocabulary to
    another (token-string identity), so a trained checkpoint can warm-start
    training against a rebuilt vocab whose IDs shifted or grew.

    Tokens absent from the old vocab inherit the nearest same-type token's
    weights (Note_103 ← Note_102): the model initially treats them as their
    closest semantic neighbour instead of noise.
    """
    old_map = dict(old_vocab.token_to_id)
    new_map = dict(new_vocab.token_to_id)
    old_word = np.asarray(params["word_emb"])
    old_head = np.asarray(params["lm_head"])
    V_new, H = len(new_map), old_word.shape[1]

    word = np.zeros((V_new, H), old_word.dtype)
    head = np.zeros((old_head.shape[0], V_new), old_head.dtype)
    borrowed = []
    for tok, nid in new_map.items():
        oid = old_map.get(tok)
        if oid is None:
            oid = _nearest_token_id(tok, old_map)
            borrowed.append((tok, oid))
        if oid is not None:
            word[nid] = old_word[oid]
            head[:, nid] = old_head[:, oid]
    if borrowed:
        logger.info(
            "vocab remap: borrowed weights for "
            + ", ".join(f"{t}←id{o}" for t, o in borrowed)
        )
    out = dict(params)
    out["word_emb"] = word
    out["lm_head"] = head
    return out


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
