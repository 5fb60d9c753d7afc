"""On-device token sampling.

Reference semantics (etude/models/etude_decoder.py:321-333): temperature
softmax, nucleus (top-p) filtering that keeps the smallest prefix of
descending-probability tokens whose cumulative mass exceeds top_p (the first
token is always kept), renormalization, multinomial draw; temperature == 0
short-circuits to argmax. Here the whole procedure is a traced JAX function
so it runs inside the generation while_loop with no host sync.

TPU perf: a full-vocabulary sort per decode step is the dominant sampling
cost. `sample_token` therefore restricts the nucleus to the top
`nucleus_k` tokens via `lax.top_k` (already sorted descending) — exact
whenever the nucleus fits within k, which holds for trained-model
distributions at the default top_p 0.9; set nucleus_k >= vocab for the
unrestricted (full-sort) behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def top_p_filter(probs: jnp.ndarray, top_p: jnp.ndarray) -> jnp.ndarray:
    """Zero out tokens outside the nucleus; returns renormalized probs.

    Keeps sorted token i iff the cumulative probability strictly before it is
    <= top_p (so the token that crosses the threshold is kept).
    probs: [..., V]; top_p: scalar in (0, 1). Full-sort reference path.
    """
    sort_idx = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, sort_idx, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    cum_before = cum - sorted_probs
    keep_sorted = cum_before <= top_p
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
    nucleus_k: int = 256,
) -> jnp.ndarray:
    """Draw next-token ids [...] with temperature/top-p; argmax when
    temperature <= 0. Fully traced (no python branching on values)."""
    greedy = jnp.argmax(logits, axis=-1)

    V = logits.shape[-1]
    k = min(nucleus_k, V)
    safe_t = jnp.maximum(temperature, 1e-6)

    # Top-k logits are sorted descending; softmax within the top-k then
    # apply the nucleus prefix rule there.
    top_logits, top_idx = jax.lax.top_k(logits, k)
    probs = jax.nn.softmax(top_logits / safe_t, axis=-1)
    cum_before = jnp.cumsum(probs, axis=-1) - probs
    use_top_p = (top_p > 0.0) & (top_p < 1.0)
    keep = jnp.where(use_top_p, cum_before <= top_p, jnp.ones_like(probs, bool))
    masked = jnp.where(keep, probs, 0.0)
    draw = jax.random.categorical(
        rng, jnp.log(jnp.maximum(masked, 1e-20)), axis=-1
    )
    sampled = jnp.take_along_axis(top_idx, draw[..., None], axis=-1)[..., 0]

    return jnp.where(temperature > 0.0, sampled, greedy)
