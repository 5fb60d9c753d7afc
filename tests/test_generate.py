import numpy as np
import pytest

import jax.numpy as jnp

from etude_tpu.models.decoder import EtudeDecoderConfig, init_params
from etude_tpu.models.generate import ATTR_KEYS, GenerationEngine


@pytest.fixture(scope="module")
def setup():
    config = EtudeDecoderConfig(
        vocab_size=32,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=128,
        attribute_emb_dim=8,
    )
    params = init_params(config, seed=0)
    BOS, EOS = 4, 5
    engine = GenerationEngine(
        config, bar_bos_id=BOS, bar_eos_id=EOS, pad_id=0,
        prompt_buckets=(32, 64), max_bar_token_limit=32,
    )
    return config, params, engine, BOS, EOS


def test_build_prompt_empty_history(setup):
    config, params, engine, BOS, EOS = setup
    x = [BOS, 10, 11, EOS]
    attrs = {k: 2 for k in ATTR_KEYS}
    tokens, classes, attr_lists = engine.build_prompt([], x, attrs)
    # 4 empty (X, Y) pairs of [BOS, EOS] = 16 tokens, then X, then Bar_BOS.
    assert len(tokens) == 16 + len(x) + 1
    assert tokens[-1] == BOS
    assert classes[-1] == 2  # TGT
    # Condition bar carries the *target* attributes.
    assert attr_lists["polyphony_bin"][-2] == 2
    # Empty-history context is neutral (bin 1).
    assert attr_lists["polyphony_bin"][0] == 1


def test_build_prompt_truncation(setup):
    config, params, engine, BOS, EOS = setup
    # Prompt longer than cap (128 - 32 = 96) must be truncated to
    # max_pos * 0.5 - 1 = 63 tokens + BOS opener.
    x = [BOS] + list(range(6, 6 + 150)) + [EOS]
    x = [t % 30 for t in x]
    attrs = {k: 1 for k in ATTR_KEYS}
    tokens, classes, attr_lists = engine.build_prompt([], x, attrs)
    assert len(tokens) == 64
    assert tokens[-1] == BOS
    assert len(classes) == len(tokens)
    for k in ATTR_KEYS:
        assert len(attr_lists[k]) == len(tokens)


def test_generate_song_smoke(setup):
    config, params, engine, BOS, EOS = setup
    x_bars = [[BOS, 10, 11, EOS], [BOS, 12, 13, 14, EOS], [BOS, 15, EOS]]
    attrs = [{k: 1 for k in ATTR_KEYS}] * 3
    bars = engine.generate(params, x_bars, attrs, temperature=0.0, seed=0)
    assert len(bars) == 3
    for bar in bars:
        assert bar[0] == BOS
        assert 1 <= len(bar) <= 1 + engine.max_bar_token_limit
        # Bar either hit EOS or the token limit.
        if len(bar) < 1 + engine.max_bar_token_limit:
            assert bar[-1] == EOS


def test_generate_deterministic_at_temp0(setup):
    config, params, engine, BOS, EOS = setup
    x_bars = [[BOS, 10, 11, EOS], [BOS, 12, EOS]]
    attrs = [{k: 1 for k in ATTR_KEYS}] * 2
    a = engine.generate(params, x_bars, attrs, temperature=0.0, seed=0)
    b = engine.generate(params, x_bars, attrs, temperature=0.0, seed=123)
    assert a == b


def test_generate_batch_streams_independent(setup):
    """A batched 2-stream run must equal two separate single-stream runs."""
    config, params, engine, BOS, EOS = setup
    x1 = [[BOS, 10, 11, EOS], [BOS, 12, EOS]]
    x2 = [[BOS, 20, 21, 22, EOS]]
    attrs1 = [{k: 1 for k in ATTR_KEYS}] * 2
    attrs2 = [{k: 0 for k in ATTR_KEYS}]
    solo1 = engine.generate(params, x1, attrs1, temperature=0.0)
    solo2 = engine.generate(params, x2, attrs2, temperature=0.0)
    both = engine.generate_batch(
        params, [x1, x2], [attrs1, attrs2], temperature=0.0
    )
    assert both[0] == solo1
    assert both[1] == solo2


def test_attribute_sweep_batch(setup):
    """27-combo sweep shape: same X bars, different attribute combos."""
    config, params, engine, BOS, EOS = setup
    x_bars = [[BOS, 10, 11, EOS]]
    combos = []
    for p in range(3):
        for r in range(3):
            for s in range(3):
                combos.append({
                    "polyphony_bin": p, "rhythm_intensity_bin": r,
                    "sustain_bin": s, "pitch_overlap_bin": 2,
                })
    streams = engine.generate_batch(
        params, [x_bars] * 27, [[c] for c in combos], temperature=0.0
    )
    assert len(streams) == 27
    assert all(len(s) == 1 for s in streams)


def test_generate_empty_song(setup):
    config, params, engine, BOS, EOS = setup
    assert engine.generate(params, [], [], temperature=0.0) == []


def test_prompt_cap_override(setup):
    from etude_tpu.models.generate import GenerationEngine

    config, params, _, BOS, EOS = setup
    engine = GenerationEngine(
        config, BOS, EOS, prompt_buckets=(32,), max_bar_token_limit=16,
        prompt_cap=32,
    )
    assert engine.prompt_buckets == [32]
    # A long condition bar truncates into the cap and still generates.
    x = [BOS] + [10] * 100 + [EOS]
    bars = engine.generate(params, [x], [{k: 1 for k in ATTR_KEYS}],
                           temperature=0.0)
    assert len(bars) == 1 and bars[0][0] == BOS
