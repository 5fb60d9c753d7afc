import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etude_tpu.models.decoder import (
    ATTRIBUTE_ORDER,
    EtudeDecoderConfig,
    forward,
    forward_with_cache,
    init_cache,
    init_params,
    loss_fn,
    param_count,
)


@pytest.fixture(scope="module")
def tiny_config():
    return EtudeDecoderConfig(
        vocab_size=64,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        attribute_emb_dim=8,
    )


@pytest.fixture(scope="module")
def tiny_params(tiny_config):
    return init_params(tiny_config, seed=0)


def _random_batch(config, rng, B=2, T=16):
    batch = {
        "input_ids": rng.integers(4, config.vocab_size, (B, T)).astype(np.int32),
        "class_ids": rng.integers(1, 3, (B, T)).astype(np.int32),
        "attention_mask": np.ones((B, T), np.int32),
    }
    for name in ATTRIBUTE_ORDER:
        batch[f"{name}_bin_ids"] = rng.integers(0, 3, (B, T)).astype(np.int32)
    return batch


def test_param_count_full_size():
    config = EtudeDecoderConfig()
    params = init_params(config, seed=0)
    n = param_count(params)
    # Reference decoder is ≈25.5M parameters (SURVEY.md §2.1); ours must be
    # in the same class (embeddings + 8 transformer layers + untied head).
    assert 24e6 < n < 29e6


def test_forward_shapes(tiny_config, tiny_params, rng):
    batch = _random_batch(tiny_config, rng)
    attr_ids = {n: batch[f"{n}_bin_ids"] for n in ATTRIBUTE_ORDER}
    logits = forward(
        tiny_params, tiny_config,
        batch["input_ids"], batch["class_ids"], attr_ids,
        batch["attention_mask"],
    )
    assert logits.shape == (2, 16, tiny_config.vocab_size)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_causality(tiny_config, tiny_params, rng):
    """Changing a future token must not affect earlier logits."""
    batch = _random_batch(tiny_config, rng, B=1, T=12)
    attr_ids = {n: batch[f"{n}_bin_ids"] for n in ATTRIBUTE_ORDER}
    logits_a = forward(
        tiny_params, tiny_config, batch["input_ids"], batch["class_ids"],
        attr_ids, compute_dtype=jnp.float32,
    )
    mutated = batch["input_ids"].copy()
    mutated[0, -1] = (mutated[0, -1] + 7) % tiny_config.vocab_size
    logits_b = forward(
        tiny_params, tiny_config, mutated, batch["class_ids"],
        attr_ids, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(logits_a[0, :-1]), np.asarray(logits_b[0, :-1]),
        rtol=1e-5, atol=1e-5,
    )
    assert not np.allclose(np.asarray(logits_a[0, -1]), np.asarray(logits_b[0, -1]))


def test_attributes_change_output(tiny_config, tiny_params, rng):
    batch = _random_batch(tiny_config, rng, B=1, T=8)
    attr_ids = {n: batch[f"{n}_bin_ids"] for n in ATTRIBUTE_ORDER}
    logits_a = forward(
        tiny_params, tiny_config, batch["input_ids"], batch["class_ids"], attr_ids
    )
    attr_ids2 = dict(attr_ids)
    attr_ids2["polyphony"] = (attr_ids["polyphony"] + 1) % 3
    logits_b = forward(
        tiny_params, tiny_config, batch["input_ids"], batch["class_ids"], attr_ids2
    )
    assert not np.allclose(np.asarray(logits_a), np.asarray(logits_b))


def test_cache_matches_full_forward(tiny_config, tiny_params, rng):
    """Prefill + incremental decode must reproduce the full forward pass."""
    B, T = 1, 10
    batch = _random_batch(tiny_config, rng, B=B, T=T)
    attr_ids = {n: jnp.asarray(batch[f"{n}_bin_ids"]) for n in ATTRIBUTE_ORDER}
    ids = jnp.asarray(batch["input_ids"])
    cls = jnp.asarray(batch["class_ids"])

    full_logits = forward(
        tiny_params, tiny_config, ids, cls, attr_ids, compute_dtype=jnp.float32
    )

    # Prefill on the first 6 tokens, then decode tokens 6..9 one at a time.
    split = 6
    cache = init_cache(tiny_config, B, dtype=jnp.float32)
    positions = jnp.arange(split)[None, :]
    vis = jnp.zeros((B,), jnp.int32)
    pre_logits, cache = forward_with_cache(
        tiny_params, tiny_config, cache,
        ids[:, :split], cls[:, :split],
        {n: attr_ids[n][:, :split] for n in ATTRIBUTE_ORDER},
        write_pos=jnp.int32(0), positions=positions, visible_from=vis,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(pre_logits), np.asarray(full_logits[:, :split]),
        rtol=3e-3, atol=3e-3,
    )

    for t in range(split, T):
        step_logits, cache = forward_with_cache(
            tiny_params, tiny_config, cache,
            ids[:, t:t + 1], cls[:, t:t + 1],
            {n: attr_ids[n][:, t:t + 1] for n in ATTRIBUTE_ORDER},
            write_pos=jnp.int32(t),
            positions=jnp.full((B, 1), t, jnp.int32),
            visible_from=vis,
            compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]),
            rtol=3e-3, atol=3e-3,
        )


def test_left_padding_equivalence(tiny_config, tiny_params, rng):
    """A left-padded prompt must yield the same final logits as unpadded."""
    B, T, pad = 1, 8, 5
    batch = _random_batch(tiny_config, rng, B=B, T=T)
    attr_ids = {n: jnp.asarray(batch[f"{n}_bin_ids"]) for n in ATTRIBUTE_ORDER}
    ids = jnp.asarray(batch["input_ids"])
    cls = jnp.asarray(batch["class_ids"])

    cache = init_cache(tiny_config, B, dtype=jnp.float32)
    logits_ref, _ = forward_with_cache(
        tiny_params, tiny_config, cache, ids, cls, attr_ids,
        write_pos=jnp.int32(0),
        positions=jnp.arange(T)[None, :],
        visible_from=jnp.zeros((B,), jnp.int32),
        compute_dtype=jnp.float32,
    )

    padded_ids = jnp.concatenate([jnp.zeros((B, pad), jnp.int32), ids], axis=1)
    padded_cls = jnp.concatenate([jnp.zeros((B, pad), jnp.int32), cls], axis=1)
    padded_attrs = {
        n: jnp.concatenate([jnp.zeros((B, pad), jnp.int32), attr_ids[n]], axis=1)
        for n in ATTRIBUTE_ORDER
    }
    positions = jnp.maximum(jnp.arange(T + pad)[None, :] - pad, 0)
    cache = init_cache(tiny_config, B, dtype=jnp.float32)
    logits_pad, _ = forward_with_cache(
        tiny_params, tiny_config, cache, padded_ids, padded_cls, padded_attrs,
        write_pos=jnp.int32(0), positions=positions,
        visible_from=jnp.full((B,), pad, jnp.int32),
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(logits_pad[:, pad:]), np.asarray(logits_ref),
        rtol=3e-3, atol=3e-3,
    )


def test_loss_masking(tiny_config, tiny_params, rng):
    batch = _random_batch(tiny_config, rng, B=2, T=12)
    labels = batch["input_ids"].copy().astype(np.int32)
    labels[:, :6] = -100
    batch["labels"] = labels
    loss, metrics = loss_fn(tiny_params, tiny_config, batch)
    assert np.isfinite(float(loss))
    assert int(metrics["n_tokens"]) == 2 * 6
    # All-masked labels → loss uses the n>=1 guard and stays finite.
    batch["labels"] = np.full_like(labels, -100)
    loss2, _ = loss_fn(tiny_params, tiny_config, batch)
    assert np.isfinite(float(loss2)) and float(loss2) == 0.0
