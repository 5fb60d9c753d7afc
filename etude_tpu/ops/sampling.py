"""On-device token sampling.

Reference semantics (etude/models/etude_decoder.py:321-333): temperature
softmax, nucleus (top-p) filtering that keeps the smallest prefix of
descending-probability tokens whose cumulative mass exceeds top_p (the first
token is always kept), renormalization, multinomial draw; temperature == 0
short-circuits to argmax. Here the whole procedure is a traced JAX function
so it runs inside the generation while_loop with no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def top_p_filter(probs: jnp.ndarray, top_p: jnp.ndarray) -> jnp.ndarray:
    """Zero out tokens outside the nucleus; returns renormalized probs.

    Keeps sorted token i iff the cumulative probability strictly before it is
    <= top_p (so the token that crosses the threshold is kept).
    probs: [..., V]; top_p: scalar in (0, 1).
    """
    sort_idx = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, sort_idx, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    cum_before = cum - sorted_probs
    keep_sorted = cum_before <= top_p
    # Scatter the keep mask back to vocabulary order.
    keep = jnp.zeros_like(keep_sorted)
    keep = jnp.put_along_axis(keep, sort_idx, keep_sorted, axis=-1, inplace=False)
    filtered = jnp.where(keep, probs, 0.0)
    total = jnp.sum(filtered, axis=-1, keepdims=True)
    return filtered / jnp.maximum(total, 1e-20)


def sample_token(
    logits: jnp.ndarray,       # [..., V] f32
    rng: jax.Array,
    temperature: jnp.ndarray,  # scalar
    top_p: jnp.ndarray,        # scalar
) -> jnp.ndarray:
    """Draw next-token ids [...] with temperature/top-p; argmax when
    temperature <= 0. Fully traced (no python branching on values)."""
    greedy = jnp.argmax(logits, axis=-1)

    safe_t = jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(logits / safe_t, axis=-1)
    use_top_p = (top_p > 0.0) & (top_p < 1.0)
    probs = jnp.where(use_top_p, top_p_filter(probs, top_p), probs)
    sampled = jax.random.categorical(rng, jnp.log(jnp.maximum(probs, 1e-20)), axis=-1)

    return jnp.where(temperature > 0.0, sampled, greedy)
