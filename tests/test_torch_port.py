"""Architecture-parity test: our functional decoder vs the reference's exact
backbone (HF GPTNeoXModel in torch) through the checkpoint porting tool.

Builds the reference decoder composition (word + class + projected attribute
embeddings → GPTNeoXModel → untied lm_head) with random torch weights,
converts the state dict with utils/torch_port, and checks logits match —
proving reference checkpoints will run unchanged on the TPU decoder.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from etude_tpu.models.decoder import (  # noqa: E402
    ATTRIBUTE_ORDER,
    EtudeDecoderConfig,
    forward,
)
from etude_tpu.utils.torch_port import convert_etude_decoder_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def torch_reference():
    from transformers import GPTNeoXConfig, GPTNeoXModel

    cfg = EtudeDecoderConfig(
        vocab_size=50, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, attribute_emb_dim=8,
    )
    torch.manual_seed(0)

    word = torch.nn.Embedding(cfg.vocab_size, cfg.hidden_size)
    cls = torch.nn.Embedding(cfg.num_classes, cfg.hidden_size)
    attr_embs = {
        name: torch.nn.Embedding(cfg.num_attribute_bins, cfg.attribute_emb_dim)
        for name in ATTRIBUTE_ORDER
    }
    proj = torch.nn.Linear(4 * cfg.attribute_emb_dim, cfg.hidden_size)
    backbone = GPTNeoXModel(GPTNeoXConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        attention_dropout=0.0, hidden_dropout=0.0,
    ))
    head = torch.nn.Linear(cfg.hidden_size, cfg.vocab_size, bias=False)

    # Reference state-dict layout (etude/models/etude_decoder.py module names).
    module_names = {
        "word_embeddings": word,
        "class_embeddings": cls,
        "pitch_overlap_embeddings": attr_embs["pitch_overlap"],
        "polyphony_embeddings": attr_embs["polyphony"],
        "note_sustain_embeddings": attr_embs["sustain"],
        "rhythm_intensity_embeddings": attr_embs["rhythm_intensity"],
        "attribute_projection": proj,
        "transformer": backbone,
        "lm_head": head,
    }
    state_dict = {}
    for prefix, module in module_names.items():
        for key, value in module.state_dict().items():
            state_dict[f"{prefix}.{key}"] = value

    def torch_forward(ids, class_ids, attrs):
        with torch.no_grad():
            embeds = word(ids) + cls(class_ids) + proj(torch.cat(
                [attr_embs[name](attrs[name]) for name in ATTRIBUTE_ORDER],
                dim=-1,
            ))
            hidden = backbone(inputs_embeds=embeds).last_hidden_state
            return head(hidden).numpy()

    return cfg, state_dict, torch_forward


def test_ported_weights_match_torch_logits(torch_reference):
    cfg, state_dict, torch_forward = torch_reference
    params = convert_etude_decoder_state_dict(state_dict, cfg)

    rng = np.random.default_rng(1)
    B, T = 2, 17
    ids = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int64)
    class_ids = rng.integers(0, 3, (B, T)).astype(np.int64)
    attrs = {
        name: rng.integers(0, 3, (B, T)).astype(np.int64)
        for name in ATTRIBUTE_ORDER
    }

    ref_logits = torch_forward(
        torch.tensor(ids), torch.tensor(class_ids),
        {k: torch.tensor(v) for k, v in attrs.items()},
    )
    our_logits = np.asarray(forward(
        params, cfg,
        jnp.asarray(ids, jnp.int32), jnp.asarray(class_ids, jnp.int32),
        {k: jnp.asarray(v, jnp.int32) for k, v in attrs.items()},
        compute_dtype=jnp.float32,
    ))

    np.testing.assert_allclose(our_logits, ref_logits, rtol=2e-4, atol=2e-4)


def test_port_strips_compile_prefixes(torch_reference):
    cfg, state_dict, _ = torch_reference
    prefixed = {f"_orig_mod.{k}": v for k, v in state_dict.items()}
    params = convert_etude_decoder_state_dict(prefixed, cfg)
    base = convert_etude_decoder_state_dict(state_dict, cfg)
    np.testing.assert_array_equal(
        np.asarray(params["lm_head"]), np.asarray(base["lm_head"])
    )
