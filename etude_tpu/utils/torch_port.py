"""Reference-checkpoint porting: PyTorch EtudeDecoder state dicts → params.

The reference ships trained decoder weights as torch .pth state dicts
(EtudeDecoder: embeddings + attribute projection + HF GPTNeoXModel backbone +
untied lm_head — etude/models/etude_decoder.py:94-123). This module maps that
layout onto the functional params pytree in models/decoder.py so reference
checkpoints run directly on TPU.

Layout notes:
  * torch Linear stores [out, in]; ours is [in, out] (transposed);
  * GPT-NeoX packs query_key_value per head as [heads, (q,k,v), head_dim]
    — identical to our reshape(B,T,heads,3*head_dim) split, so the packed
    matrix transposes straight across;
  * `_orig_mod.` prefixes (torch.compile artifacts) are stripped, matching
    the reference loader (etude/utils/model_loader.py).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Union

import numpy as np

from ..models.decoder import ATTRIBUTE_ORDER, EtudeDecoderConfig
from .logger import logger

# Reference embedding-module name per attribute (concat order is fixed by
# ATTRIBUTE_ORDER: pitch_overlap, polyphony, sustain, rhythm_intensity).
_ATTR_MODULE = {
    "pitch_overlap": "pitch_overlap_embeddings",
    "polyphony": "polyphony_embeddings",
    "sustain": "note_sustain_embeddings",
    "rhythm_intensity": "rhythm_intensity_embeddings",
}


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def convert_etude_decoder_state_dict(
    state_dict: Mapping[str, Any],
    config: EtudeDecoderConfig,
) -> Dict[str, Any]:
    """Torch EtudeDecoder state dict → models/decoder.py params pytree."""
    sd = {k.replace("_orig_mod.", ""): v for k, v in state_dict.items()}

    def get(name):
        return _to_np(sd[name])

    L = config.num_hidden_layers

    def stack(fmt, transpose=False):
        mats = [get(fmt.format(i)) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats)

    params = {
        "word_emb": get("word_embeddings.weight"),
        "class_emb": get("class_embeddings.weight"),
        "attr_emb": {
            name: get(f"{_ATTR_MODULE[name]}.weight") for name in ATTRIBUTE_ORDER
        },
        "attr_proj": {
            "w": get("attribute_projection.weight").T,
            "b": get("attribute_projection.bias"),
        },
        "layers": {
            "ln1": {
                "scale": stack("transformer.layers.{}.input_layernorm.weight"),
                "bias": stack("transformer.layers.{}.input_layernorm.bias"),
            },
            "ln2": {
                "scale": stack(
                    "transformer.layers.{}.post_attention_layernorm.weight"
                ),
                "bias": stack(
                    "transformer.layers.{}.post_attention_layernorm.bias"
                ),
            },
            "qkv": {
                "w": stack(
                    "transformer.layers.{}.attention.query_key_value.weight",
                    transpose=True,
                ),
                "b": stack("transformer.layers.{}.attention.query_key_value.bias"),
            },
            "attn_out": {
                "w": stack("transformer.layers.{}.attention.dense.weight",
                           transpose=True),
                "b": stack("transformer.layers.{}.attention.dense.bias"),
            },
            "mlp_in": {
                "w": stack("transformer.layers.{}.mlp.dense_h_to_4h.weight",
                           transpose=True),
                "b": stack("transformer.layers.{}.mlp.dense_h_to_4h.bias"),
            },
            "mlp_out": {
                "w": stack("transformer.layers.{}.mlp.dense_4h_to_h.weight",
                           transpose=True),
                "b": stack("transformer.layers.{}.mlp.dense_4h_to_h.bias"),
            },
        },
        "final_ln": {
            "scale": get("transformer.final_layer_norm.weight"),
            "bias": get("transformer.final_layer_norm.bias"),
        },
        "lm_head": get("lm_head.weight").T,
    }

    import jax.numpy as jnp
    import jax

    return jax.tree.map(jnp.asarray, params)


def load_torch_decoder_checkpoint(
    path: Union[str, "Path"],  # noqa: F821
    config: EtudeDecoderConfig,
):
    """Load a reference .pth checkpoint file and convert it."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = payload.get("model_state_dict", payload)
    logger.info(f"converting torch checkpoint ({len(state_dict)} tensors)")
    return convert_etude_decoder_state_dict(state_dict, config)
