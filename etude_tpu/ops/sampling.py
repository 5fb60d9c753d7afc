"""On-device token sampling.

Reference semantics (etude/models/etude_decoder.py:321-333): temperature
softmax, nucleus (top-p) filtering that keeps the smallest prefix of
descending-probability tokens whose cumulative mass exceeds top_p (the first
token is always kept), renormalization, multinomial draw; temperature == 0
short-circuits to argmax. Here the whole procedure is a traced JAX function
so it runs inside the generation while_loop with no host sync.

TPU perf: a full-vocabulary sort per decode step is the dominant sampling
cost. `sample_token` therefore restricts the nucleus to the top
`nucleus_k` tokens via `lax.top_k` (already sorted descending) while
cumulating TRUE full-softmax mass — exact whenever the nucleus fits within
k, which holds for trained-model distributions at the default top_p 0.9;
set nucleus_k >= vocab for the unrestricted (full-sort) behavior.
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

    # Softmax over the FULL vocabulary (cheap: elementwise over [..., V]),
    # then rank with top_k. The cumulative mass that drives the nucleus rule
    # must be TRUE probability mass: renormalizing within the top-k would
    # shrink the nucleus (each in-k prob inflated by 1/mass_k, cutting the
    # reference's threshold at top_p·mass_k instead of top_p) and break
    # sampling parity with top_p_filter / the reference rule.
    probs_full = jax.nn.softmax(logits / safe_t, axis=-1)
    top_probs, top_idx = jax.lax.top_k(probs_full, k)
    cum_before = jnp.cumsum(top_probs, axis=-1) - top_probs
    # top_p >= 1 disables filtering; top_p <= 0 degenerates to top-1 (the
    # first token's cum_before is 0, matching top_p_filter's prefix rule).
    keep = jnp.where(
        top_p < 1.0,
        cum_before <= jnp.maximum(top_p, 0.0),
        jnp.ones_like(top_probs, bool),
    )
    masked = jnp.where(keep, top_probs, 0.0)
    draw = jax.random.categorical(
        rng, jnp.log(jnp.maximum(masked, 1e-20)), axis=-1
    )
    sampled = jnp.take_along_axis(top_idx, draw[..., None], axis=-1)[..., 0]

    return jnp.where(temperature > 0.0, sampled, greedy)
