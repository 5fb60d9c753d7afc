import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etude_tpu.ops.sampling import sample_token, top_p_filter


def test_top_p_keeps_nucleus():
    probs = jnp.asarray([[0.5, 0.3, 0.15, 0.05]])
    out = np.asarray(top_p_filter(probs, jnp.float32(0.7)))
    # cum_before: [0, .5, .8, .95] → keep tokens 0 and 1 only.
    assert out[0, 2] == 0.0 and out[0, 3] == 0.0
    np.testing.assert_allclose(out[0, :2], [0.625, 0.375], rtol=1e-6)


def test_top_p_always_keeps_top1():
    probs = jnp.asarray([[0.99, 0.01]])
    out = np.asarray(top_p_filter(probs, jnp.float32(0.1)))
    assert out[0, 0] == pytest.approx(1.0, rel=1e-5) and out[0, 1] == 0.0


def test_temperature_zero_is_argmax():
    logits = jnp.asarray([[0.1, 5.0, 0.2, 0.3]])
    tok = sample_token(logits, jax.random.PRNGKey(0), jnp.float32(0.0), jnp.float32(0.9))
    assert int(tok[0]) == 1


def test_sampling_respects_top_p():
    # Token 3 is outside the 0.9 nucleus; it must never be drawn.
    logits = jnp.log(jnp.asarray([[0.6, 0.25, 0.12, 0.03]]))
    draws = set()
    for i in range(64):
        tok = sample_token(
            logits, jax.random.PRNGKey(i), jnp.float32(1.0), jnp.float32(0.9)
        )
        draws.add(int(tok[0]))
    assert 3 not in draws
    assert {0, 1}.issubset(draws)


def test_sampling_batched_shapes():
    logits = jnp.zeros((5, 16))
    tok = sample_token(logits, jax.random.PRNGKey(0), jnp.float32(1.0), jnp.float32(0.9))
    assert tok.shape == (5,)
