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


# =============================================================== AMT / hFT
def convert_amt_state_dict(state_dict: Mapping[str, Any], config) -> Dict[str, Any]:
    """Torch Model_SPEC2MIDI state dict → models/amt.py params pytree.

    Reference layout: etude/models/amt_apc.py — Encoder_SPEC2MIDI
    (conv + tok/pos embeddings + EncoderLayers over the frequency axis) and
    Decoder_SPEC2MIDI (note-query embedding, DecoderLayer_Zero + DecoderLayers
    cross-attending to frequency, EncoderLayers over time, two head sets).
    Each reference EncoderLayer/DecoderLayer applies ONE shared LayerNorm
    instance after every sublayer; our pytree keeps per-sublayer ln slots, so
    the shared tensors are replicated into each slot (functionally identical).
    """
    from ..models.amt import AMTConfig  # noqa: F401 (documentation import)

    sd = {k.replace("_orig_mod.", ""): v for k, v in state_dict.items()}

    def get(name):
        return _to_np(sd[name])

    def lin(prefix):
        return {"w": get(f"{prefix}.weight").T, "b": get(f"{prefix}.bias")}

    def lin_stack(fmt, n):
        ws = [get(fmt.format(i) + ".weight").T for i in range(n)]
        bs = [get(fmt.format(i) + ".bias") for i in range(n)]
        return {"w": np.stack(ws), "b": np.stack(bs)}

    def ln_stack(fmt, n):
        return {
            "scale": np.stack([get(fmt.format(i) + ".weight") for i in range(n)]),
            "bias": np.stack([get(fmt.format(i) + ".bias") for i in range(n)]),
        }

    def attn_stack(fmt, n):
        return {p: lin_stack(fmt + f".fc_{p}", n) for p in ("q", "k", "v", "o")}

    def ff_stack(fmt, n):
        return {"in": lin_stack(fmt + ".fc_1", n),
                "out": lin_stack(fmt + ".fc_2", n)}

    enc = "encoder_spec2midi"
    dec = "decoder_spec2midi"
    n_enc = config.encoder_n_layer
    n_dec = config.decoder_n_layer - 1  # layer_zero separate
    n_time = config.decoder_n_layer

    # Shared post-sublayer LayerNorm per reference layer → both of our slots.
    enc_ln = ln_stack(f"{enc}.layers_freq.{{}}.layer_norm", n_enc)
    dec_ln = ln_stack(f"{dec}.layers_freq.{{}}.layer_norm", n_dec)
    zero_ln = {
        "scale": get(f"{dec}.layer_zero_freq.layer_norm.weight")[None],
        "bias": get(f"{dec}.layer_zero_freq.layer_norm.bias")[None],
    }
    time_ln = ln_stack(f"{dec}.layers_time.{{}}.layer_norm", n_time)

    params = {
        "conv": {
            # torch Conv2d(1→C, (1,K)) weight [C, 1, 1, K] → [C, K].
            "w": get(f"{enc}.conv.weight")[:, 0, 0, :],
            "b": get(f"{enc}.conv.bias"),
        },
        "tok_emb": lin(f"{enc}.tok_embedding_freq"),
        "freq_pos_emb": get(f"{enc}.pos_embedding_freq.weight"),
        "enc_layers": {
            "attn": attn_stack(f"{enc}.layers_freq.{{}}.self_attention", n_enc),
            "ff": ff_stack(f"{enc}.layers_freq.{{}}.positionwise_feedforward", n_enc),
            "ln1": enc_ln,
            "ln2": {k: v.copy() for k, v in enc_ln.items()},
        },
        "note_query": get(f"{dec}.pos_embedding_freq.weight"),
        "dec_zero": {
            "cross": attn_stack(f"{dec}.layer_zero_freq.encoder_attention", 1),
            "ff": ff_stack(f"{dec}.layer_zero_freq.positionwise_feedforward", 1),
            "ln1": zero_ln,
            "ln2": {k: v.copy() for k, v in zero_ln.items()},
        },
        "dec_layers": {
            "self": attn_stack(f"{dec}.layers_freq.{{}}.self_attention", n_dec),
            "cross": attn_stack(f"{dec}.layers_freq.{{}}.encoder_attention", n_dec),
            "ff": ff_stack(f"{dec}.layers_freq.{{}}.positionwise_feedforward", n_dec),
            "ln1": dec_ln,
            "ln2": {k: v.copy() for k, v in dec_ln.items()},
            "ln3": {k: v.copy() for k, v in dec_ln.items()},
        },
        "heads_freq": {
            "onset": lin(f"{dec}.fc_onset_freq"),
            "offset": lin(f"{dec}.fc_offset_freq"),
            "mpe": lin(f"{dec}.fc_mpe_freq"),
            "velocity": lin(f"{dec}.fc_velocity_freq"),
        },
        "time_pos_emb": get(f"{dec}.pos_embedding_time.weight"),
        "time_layers": {
            "attn": attn_stack(f"{dec}.layers_time.{{}}.self_attention", n_time),
            "ff": ff_stack(f"{dec}.layers_time.{{}}.positionwise_feedforward", n_time),
            "ln1": time_ln,
            "ln2": {k: v.copy() for k, v in time_ln.items()},
        },
        "heads_time": {
            "onset": lin(f"{dec}.fc_onset_time"),
            "offset": lin(f"{dec}.fc_offset_time"),
            "mpe": lin(f"{dec}.fc_mpe_time"),
            "velocity": lin(f"{dec}.fc_velocity_time"),
        },
    }

    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


# ========================================================= Beat-Transformer
def convert_beat_state_dict(state_dict: Mapping[str, Any], config) -> Dict[str, Any]:
    """Torch Demixed_DilatedTransformerModel state dict → models/
    beat_transformer.py params pytree (reference:
    etude/models/beat_transformer.py, layers/dilated_transformer_layer.py).

    Conv2d weights go OIHW → HWIO; the dilated layers have no attention
    output projection (reference parity); instrument layers are standard
    torch TransformerEncoderLayers whose packed in_proj splits into q/k/v.
    """
    sd = {k.replace("_orig_mod.", ""): v for k, v in state_dict.items()}

    def get(name):
        return _to_np(sd[name])

    def conv(name):
        return {"w": get(f"{name}.weight").transpose(2, 3, 1, 0),
                "b": get(f"{name}.bias")}

    def lin(name):
        return {"w": get(f"{name}.weight").T, "b": get(f"{name}.bias")}

    def ln(name):
        return {"scale": get(f"{name}.weight"), "bias": get(f"{name}.bias")}

    layers = []
    for idx in range(config.nlayers):
        t = f"Transformer_layers.time_attention_{idx}"
        layer = {
            "q": lin(f"{t}.self_attn.query"),
            "k": lin(f"{t}.self_attn.key"),
            "v": lin(f"{t}.self_attn.value"),
            "er": get(f"{t}.self_attn.Er"),
            "ff1": lin(f"{t}.linear1"),
            "ff2": lin(f"{t}.linear2"),
            "ln1": ln(f"{t}.norm1"),
            "ln2": ln(f"{t}.norm2"),
        }
        if idx in config.instr_layers:
            i = f"Transformer_layers.instr_attention_{idx}"
            in_w = get(f"{i}.self_attn.in_proj_weight")  # [3D, D]
            in_b = get(f"{i}.self_attn.in_proj_bias")    # [3D]
            D = in_w.shape[1]
            wq, wk, wv = in_w[:D], in_w[D:2 * D], in_w[2 * D:]
            bq, bk, bv = in_b[:D], in_b[D:2 * D], in_b[2 * D:]
            layer["instr"] = {
                "q": {"w": wq.T, "b": bq},
                "k": {"w": wk.T, "b": bk},
                "v": {"w": wv.T, "b": bv},
                "o": lin(f"{i}.self_attn.out_proj"),
                "ff1": lin(f"{i}.linear1"),
                "ff2": lin(f"{i}.linear2"),
                "ln1": ln(f"{i}.norm1"),
                "ln2": ln(f"{i}.norm2"),
            }
        layers.append(layer)

    params = {
        "conv1": conv("conv1"),
        "conv2": conv("conv2"),
        "conv3": conv("conv3"),
        "layers": layers,
        "out": lin("out_linear"),
        "out_tempo": lin("out_linear_t"),
    }

    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


# ================================================== pickled hFT model files
def load_hft_pickle_state_dict(path) -> Dict[str, Any]:
    """Extract the state dict from a reference pickled-whole-model file
    (latest.pkl). The reference unpickles into its own module classes
    (etude/models/hft_transformer.py:26-33 CustomUnpickler); we instead
    materialize stub torch.nn.Module subclasses for whatever legacy class
    paths the pickle references — Module state lives in __dict__, so
    state_dict() works without the original source.

    Handles all three whole-model formats a user can hold: raw
    pickle.dump(model) (the reference's CustomUnpickler case — tensors
    embed torch.save blobs via torch.storage._load_from_bytes), torch.save
    zip archives, and pre-1.6 torch.save legacy streams (the latter two go
    through torch.load with a shimmed pickle module so storages restore)."""
    import io
    import pickle

    import torch

    _cache: Dict[str, type] = {}

    class _StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "torch.storage" and name == "_load_from_bytes":
                # Raw-pickled tensors carry an embedded torch.save blob
                # (same special case as the reference's CustomUnpickler).
                return lambda b: torch.load(
                    io.BytesIO(b), map_location="cpu", weights_only=True
                )
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                key = f"{module}.{name}"
                if key not in _cache:
                    _cache[key] = type(name, (torch.nn.Module,), {})
                return _cache[key]

    class _ShimPickleModule:
        """pickle-module facade torch.load accepts: same Unpickler, so
        legacy class paths stub out while torch.load drives storage
        restoration (persistent_load) for both archive formats."""
        Unpickler = _StubUnpickler

        @staticmethod
        def load(f, **kw):
            return _StubUnpickler(f, **kw).load()

        @staticmethod
        def loads(b, **kw):
            return _StubUnpickler(io.BytesIO(b), **kw).load()

    try:
        model = torch.load(
            path, map_location="cpu", weights_only=False,
            pickle_module=_ShimPickleModule,
        )
    except (pickle.UnpicklingError, RuntimeError, EOFError, KeyError):
        # Not a torch.save artifact — a raw pickle.dump(model), the format
        # the reference's own loader expects.
        with open(path, "rb") as f:
            model = _StubUnpickler(f).load()
    if hasattr(model, "state_dict"):
        return model.state_dict()
    if isinstance(model, Mapping):
        return dict(model)
    raise ValueError(f"unsupported pickle payload: {type(model)}")


def load_torch_amt_checkpoint(path, config):
    """Reference AMT-APC/hFT checkpoint (.pth state dict or .pkl whole
    model) → models/amt.py params."""
    p = str(path)
    if p.endswith(".pkl"):
        state_dict = load_hft_pickle_state_dict(p)
    else:
        import torch

        payload = torch.load(p, map_location="cpu", weights_only=True)
        state_dict = payload.get("model_state_dict", payload)
    logger.info(f"converting torch AMT checkpoint ({len(state_dict)} tensors)")
    import jax

    return jax.device_put(convert_amt_state_dict(state_dict, config))


def load_torch_beat_checkpoint(path, config):
    """Reference Beat-Transformer checkpoint → beat_transformer params."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = payload.get(
        "state_dict", payload.get("model_state_dict", payload)
    )
    logger.info(f"converting torch beat checkpoint ({len(state_dict)} tensors)")
    import jax

    return jax.device_put(convert_beat_state_dict(state_dict, config))
