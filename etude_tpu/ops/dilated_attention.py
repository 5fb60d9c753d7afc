"""Dilated sparse self-attention for long sequences.

Capability parity with the Beat-Transformer's dilated attention (reference:
etude/models/layers/dilated_transformer_layer.py): each query attends to
attn_len keys at stride 2^layer, with 4 symmetric heads (offsets centered on
the query) and 4 skewed heads (offsets shifted by −2/−1/+1/+2 strides), plus
a learned relative-position bias Er per (head, slot). O(T · attn_len) cost —
the framework's long-sequence mechanism for full-song beat tracking.

TPU-first: keys/values are gathered with precomputed per-head offset index
maps (one `take_along_axis` per tensor) instead of the reference's
pad+roll+stack; out-of-range slots are masked explicitly. The reference's
head-7 key-slice bug (uses head 6's keys, kept there for checkpoint
compatibility) is FIXED here since we train from scratch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Per-head offset shifts (in strides): 4 symmetric + skewed {-2,-1,+1,+2}.
HEAD_SHIFTS = (0, 0, 0, 0, -2, -1, 1, 2)


def head_offsets(n_heads: int, attn_len: int) -> np.ndarray:
    """[n_heads, attn_len] slot offsets in units of the dilation stride."""
    if n_heads != len(HEAD_SHIFTS):
        # Generalize: symmetric heads everywhere if the count differs.
        shifts = [0] * n_heads
    else:
        shifts = HEAD_SHIFTS
    half = attn_len // 2
    return np.stack([
        np.arange(attn_len) + s - half for s in shifts
    ]).astype(np.int32)


def dilated_attention(
    q: jnp.ndarray,   # [B, H, T, d]
    k: jnp.ndarray,   # [B, H, T, d]
    v: jnp.ndarray,   # [B, H, T, d]
    er: jnp.ndarray,  # [H, d, attn_len] relative-position embedding
    dilation: int,
) -> jnp.ndarray:
    """Returns [B, H, T, d] attention output."""
    B, H, T, d = q.shape
    attn_len = er.shape[-1]
    offsets = jnp.asarray(head_offsets(H, attn_len)) * dilation  # [H, A]

    pos = jnp.arange(T)[None, :, None] + offsets[:, None, :]     # [H, T, A]
    valid = (pos >= 0) & (pos < T)
    pos_c = jnp.clip(pos, 0, T - 1)

    # Gather keys/values at the offset positions: [B, H, T, A, d].
    idx = jnp.broadcast_to(pos_c[None, ..., None], (B, H, T, attn_len, d))
    k_g = jnp.take_along_axis(k[:, :, :, None, :], idx, axis=2)
    v_g = jnp.take_along_axis(v[:, :, :, None, :], idx, axis=2)

    scores = jnp.einsum("bhtd,bhtad->bhta", q, k_g)
    rel = jnp.einsum("bhtd,hda->bhta", q, er)
    scores = (scores + rel) / np.sqrt(d)
    scores = jnp.where(valid[None], scores.astype(jnp.float32), -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhta,bhtad->bhtd", probs, v_g)
