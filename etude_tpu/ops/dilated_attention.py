"""Dilated sparse self-attention for long sequences.

Capability parity with the Beat-Transformer's dilated attention (reference:
etude/models/layers/dilated_transformer_layer.py): each query attends to
attn_len keys at stride 2^layer, with 4 symmetric heads (offsets centered on
the query) and 4 skewed heads (offsets shifted by −2/−1/+1/+2 strides), plus
a learned relative-position bias Er per (head, slot). O(T · attn_len) cost —
the framework's long-sequence mechanism for full-song beat tracking.

TPU-first: within a head, every attention slot is the key sequence shifted
by a constant offset, so keys/values are assembled from STATIC shifted
slices of a padded array (pure data movement XLA vectorizes well — no
gather). A Pallas kernel backend (`dilated_attention_pallas`) computes the
same op with the shifted slices taken directly in VMEM; select with
ETUDE_DILATED_BACKEND=pallas. The reference's head-7 key-slice bug (uses
head 6's keys, kept there for checkpoint compatibility) is FIXED here since
we train from scratch.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Per-head offset shifts (in strides): 4 symmetric + skewed {-2,-1,+1,+2}.
HEAD_SHIFTS = (0, 0, 0, 0, -2, -1, 1, 2)


def head_offsets(n_heads: int, attn_len: int) -> np.ndarray:
    """[n_heads, attn_len] slot offsets in units of the dilation stride."""
    if n_heads != len(HEAD_SHIFTS):
        shifts = [0] * n_heads
    else:
        shifts = HEAD_SHIFTS
    half = attn_len // 2
    return np.stack([
        np.arange(attn_len) + s - half for s in shifts
    ]).astype(np.int32)


def _gather_slices(x: jnp.ndarray, offsets: np.ndarray, dilation: int):
    """x [B,H,T,d] → ([B,H,T,A,d] shifted copies, valid mask [H,T,A])."""
    B, H, T, d = x.shape
    A = offsets.shape[1]
    pad = int(np.abs(offsets).max()) * dilation
    x_pad = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    pos = np.arange(T)[None, :, None] + offsets[:, None, :] * dilation  # [H,T,A]
    valid = (pos >= 0) & (pos < T)

    per_head = []
    for h in range(H):
        slots = []
        for m in range(A):
            off = int(offsets[h, m]) * dilation
            slots.append(
                jax.lax.dynamic_slice_in_dim(x_pad[:, h], pad + off, T, axis=1)
            )
        per_head.append(jnp.stack(slots, axis=2))  # [B, T, A, d]
    return jnp.stack(per_head, axis=1), jnp.asarray(valid)


def dilated_attention(
    q: jnp.ndarray,   # [B, H, T, d]
    k: jnp.ndarray,   # [B, H, T, d]
    v: jnp.ndarray,   # [B, H, T, d]
    er: jnp.ndarray,  # [H, d, attn_len] relative-position embedding
    dilation: int,
    head7_bug: bool = False,
) -> jnp.ndarray:
    """Returns [B, H, T, d] attention output.

    head7_bug=True reproduces the reference's training bug (head 7 scores
    against head 6's keys — dilated_transformer_layer.py:52) for exact parity
    when running checkpoints that were TRAINED with it. Off by default."""
    if head7_bug and q.shape[1] == 8:
        k = k.at[:, 7].set(k[:, 6])
    if os.environ.get("ETUDE_DILATED_BACKEND") == "pallas":
        return dilated_attention_pallas(q, k, v, er, dilation)
    B, H, T, d = q.shape
    attn_len = er.shape[-1]
    offsets = head_offsets(H, attn_len)

    k_g, valid = _gather_slices(k, offsets, dilation)
    v_g, _ = _gather_slices(v, offsets, dilation)

    scores = jnp.einsum("bhtd,bhtad->bhta", q, k_g)
    rel = jnp.einsum("bhtd,hda->bhta", q, er)
    scores = (scores + rel) / np.sqrt(d)
    scores = jnp.where(valid[None], scores.astype(jnp.float32), -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhta,bhtad->bhtd", probs, v_g)


# ------------------------------------------------------------------ pallas
def _dilated_kernel(q_ref, k_ref, v_ref, er_ref, out_ref, *, offsets_np,
                    dilation, block_t, pad, n_heads, attn_len, d, T):
    """One (batch*head, T-block) program: shifted-slice attention in VMEM.

    q block: [block_t, d]; k/v: padded full sequences [T + 2*pad, d] for this
    (batch, head); er: [d, attn_len] for this head.
    """
    import jax.lax as lax
    from jax.experimental import pallas as pl

    h = pl.program_id(1) % n_heads
    tb = pl.program_id(0)
    t0 = tb * block_t

    q = q_ref[...]  # [block_t, d]
    er = er_ref[...]  # [d, attn_len]

    row_pos = t0 + lax.broadcasted_iota(jnp.int32, (block_t, 1), 0)[:, 0]

    scores = []
    vals = []
    # offsets vary per head; head index is dynamic → branch over heads with
    # lax.switch on precomputed per-head static offsets.
    def make_head(h_static):
        offs = [int(o) * dilation for o in offsets_np[h_static]]

        def compute(_):
            s_list, v_list = [], []
            for off in offs:
                k_s = k_ref[pl.ds(pad + t0 + off, block_t), :]
                v_s = v_ref[pl.ds(pad + t0 + off, block_t), :]
                s = jnp.sum(q * k_s, axis=-1)  # [block_t]
                key_pos = row_pos + off
                ok = (key_pos >= 0) & (key_pos < T)
                s_list.append(jnp.where(ok, s, -jnp.inf))
                v_list.append(v_s)
            return jnp.stack(s_list, axis=-1), jnp.stack(v_list, axis=1)

        return compute

    scores, vals = lax.switch(h, [make_head(i) for i in range(n_heads)], None)
    rel = q.astype(jnp.float32) @ er.astype(jnp.float32)  # [block_t, attn_len]
    logits = (scores.astype(jnp.float32) + rel) / np.sqrt(d)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.sum(probs[..., None] * vals.astype(jnp.float32), axis=1)
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dilation",))
def dilated_attention_pallas(q, k, v, er, dilation: int):
    """Pallas backend: same semantics as dilated_attention."""
    from jax.experimental import pallas as pl

    B, H, T, d = q.shape
    attn_len = er.shape[-1]
    offsets = head_offsets(H, attn_len)
    pad = int(np.abs(offsets).max()) * dilation
    block_t = min(512, T)
    if T % block_t:
        block_t = T  # fall back to one block when T is not divisible

    qf = q.reshape(B * H, T, d)
    k_pad = jnp.pad(k, ((0, 0), (0, 0), (pad, pad), (0, 0))).reshape(
        B * H, T + 2 * pad, d
    )
    v_pad = jnp.pad(v, ((0, 0), (0, 0), (pad, pad), (0, 0))).reshape(
        B * H, T + 2 * pad, d
    )
    er_full = jnp.broadcast_to(er[None], (B, H, d, attn_len)).reshape(
        B * H, d, attn_len
    )

    kernel = functools.partial(
        _dilated_kernel, offsets_np=offsets, dilation=dilation,
        block_t=block_t, pad=pad, n_heads=H, attn_len=attn_len, d=d, T=T,
    )
    out = pl.pallas_call(
        kernel,
        grid=(T // block_t, B * H),
        in_specs=[
            pl.BlockSpec((None, block_t, d), lambda tb, bh: (bh, tb, 0)),
            pl.BlockSpec((None, T + 2 * pad, d), lambda tb, bh: (bh, 0, 0)),
            pl.BlockSpec((None, T + 2 * pad, d), lambda tb, bh: (bh, 0, 0)),
            pl.BlockSpec((None, d, attn_len), lambda tb, bh: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_t, d), lambda tb, bh: (bh, tb, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, T, d), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(qf, k_pad, v_pad, er_full)
    return out.reshape(B, H, T, d)
