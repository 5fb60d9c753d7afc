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
gather). The reference's head-7 key-slice bug (uses head 6's keys, kept
there for checkpoint compatibility) is FIXED here since we train from
scratch.

`dilated_attention_pallas` is an EXPERIMENTAL Pallas formulation kept for
interpret-mode study only: this stack's TPU compiler rejects it with an
MLIR `tpu.dot_dimension_numbers` parse error on the kernel's batched-dot
shapes (scripts/bench_dilated_attention.py reproduces), so it is NOT wired
into the production path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

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


def dilated_attention_stacked(
    q: jnp.ndarray,   # [B, H, T, d]
    k: jnp.ndarray,   # [B, H, T, d]
    v: jnp.ndarray,   # [B, H, T, d]
    er: jnp.ndarray,  # [H, d, attn_len] relative-position embedding
    dilation: int,
    head7_bug: bool = False,
) -> jnp.ndarray:
    """Reference-shaped formulation materializing [B, H, T, A, d] shifted
    copies. Kept as the numerical oracle for tests: on TPU the (A=5, d=32)
    minor dims tile onto the (16, 128) bf16 layout with ~13x padding waste,
    which made this the dominant cost of the beat forward."""
    if head7_bug and q.shape[1] == 8:
        k = k.at[:, 7].set(k[:, 6])
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


def dilated_attention(
    q: jnp.ndarray,   # [B, H, T, d]
    k: jnp.ndarray,   # [B, H, T, d]
    v: jnp.ndarray,   # [B, H, T, d]
    er: jnp.ndarray,  # [H, d, attn_len] relative-position embedding
    dilation: int,
    head7_bug: bool = False,
) -> jnp.ndarray:
    """Returns [B, H, T, d] attention output.

    TPU-layout-aware formulation: every large intermediate keeps T in the
    MINOR (lane) dimension — q/k/v as [B, H, d, T], scores/probs as
    [A, B, H, T] — so tensors tile the (sublane, lane) layout with no
    padding blowup. Per (head, slot) the score is an elementwise
    multiply-reduce of q against a STATIC shifted slice of k (pure data
    movement + VPU work; no [*, A, d] materialization anywhere). The
    [B,H,T,A,d] formulation this replaces inflated ~13x under TPU tiling
    and dominated the whole beat forward.

    head7_bug=True reproduces the reference's training bug (head 7 scores
    against head 6's keys — dilated_transformer_layer.py:52) for exact
    parity when running checkpoints that were TRAINED with it."""
    if head7_bug and q.shape[1] == 8:
        k = k.at[:, 7].set(k[:, 6])
    B, H, T, d = q.shape
    attn_len = er.shape[-1]
    offsets = head_offsets(H, attn_len)
    pad = int(np.abs(offsets).max()) * dilation

    # [B, H, d, T]: minor dim T tiles cleanly at any song length.
    qt = jnp.transpose(q, (0, 1, 3, 2))
    kt = jnp.pad(jnp.transpose(k, (0, 1, 3, 2)),
                 ((0, 0), (0, 0), (0, 0), (pad, pad)))
    vt = jnp.pad(jnp.transpose(v, (0, 1, 3, 2)),
                 ((0, 0), (0, 0), (0, 0), (pad, pad)))

    # Heads sharing an offset row form contiguous GROUPS (4 symmetric heads
    # + one per skew); slicing per (group, slot) instead of per (head, slot)
    # keeps every elementwise op full-head-width and shrinks the op graph
    # ~4x (the per-head version made XLA:CPU compile times explode at the
    # beat model's 9 layers).
    groups = []  # (h_start, h_end) with identical offset rows
    h0 = 0
    for h in range(1, H + 1):
        if h == H or not np.array_equal(offsets[h], offsets[h0]):
            groups.append((h0, h))
            h0 = h

    def slot_gather(src, a):
        """Assemble the slot-a shifted key/value rows for ALL heads:
        [B, H, d, T] from per-group slices of the padded [B, H, d, T+2p]."""
        parts = []
        for (g0, g1) in groups:
            off = int(offsets[g0, a]) * dilation
            parts.append(jax.lax.dynamic_slice_in_dim(
                src[:, g0:g1], pad + off, T, axis=3
            ))
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    score_rows = []
    for a in range(attn_len):
        k_a = slot_gather(kt, a)                          # [B, H, d, T]
        score_rows.append(jnp.sum(qt * k_a, axis=2))      # [B, H, T]
    scores = jnp.stack(score_rows, axis=0)                # [A, B, H, T]

    # Validity is fully static: [A, 1, H, T] numpy constant.
    t_np = np.arange(T)
    key_pos = t_np[None, None] + offsets.T[:, :, None] * dilation  # [A, H, T]
    valid = jnp.asarray(((key_pos >= 0) & (key_pos < T))[:, None])

    # Relative-position bias: [B, H, T, d] x [H, d, A] → [A, B, H, T].
    rel = jnp.einsum("bhtd,hda->abht", q, er)

    logits = (scores + rel).astype(jnp.float32) / np.sqrt(d)
    logits = jnp.where(valid, logits, -jnp.inf)
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    probs = (e / jnp.sum(e, axis=0, keepdims=True)).astype(q.dtype)  # [A,B,H,T]

    # Output accumulation per slot: probs_a · shifted v → [B, H, d, T].
    acc = jnp.zeros((B, H, d, T), q.dtype)
    for a in range(attn_len):
        v_a = slot_gather(vt, a)                          # [B, H, d, T]
        acc = acc + probs[a][:, :, None, :] * v_a
    return jnp.transpose(acc, (0, 1, 3, 2))               # [B, H, T, d]


# ------------------------------------------------------------------ pallas
def _dilated_kernel(q_ref, k_ref, v_ref, er_ref, sel_ref, out_ref, *,
                    dilation, block_t, pad, n_heads, attn_len, n_union,
                    d, T):
    """One (T-block, batch) program: all heads in VMEM, no control flow.

    Per-head slot offsets are handled WITHOUT branching: scores/values are
    computed for the UNION of shifted key rows (9 static shifts at stride
    `dilation` for the 4-symmetric + {-2,-1,+1,+2}-skewed head family), then
    each head picks its attn_len slots through a static 0/1 selection tensor
    — dense matmuls and elementwise ops only, the shapes XLA:TPU-Pallas
    tiles well. Block shapes: q [H, block_t, d]; k/v [H, T+2*pad, d];
    er [H, d, attn_len]; sel [H, n_union, attn_len].
    """
    import jax.lax as lax

    tb = pl.program_id(0)
    t0 = tb * block_t

    q = q_ref[...].astype(jnp.float32)      # [H, bt, d]
    er = er_ref[...].astype(jnp.float32)    # [H, d, A]
    sel = sel_ref[...].astype(jnp.float32)  # [H, U, A]

    half = n_union // 2
    row_pos = t0 + lax.broadcasted_iota(jnp.int32, (block_t,), 0)

    s_rows, v_rows, ok_rows = [], [], []
    for u in range(n_union):
        off = (u - half) * dilation
        k_u = k_ref[:, pl.dslice(pad + t0 + off, block_t), :].astype(jnp.float32)
        v_u = v_ref[:, pl.dslice(pad + t0 + off, block_t), :].astype(jnp.float32)
        s_rows.append(jnp.sum(q * k_u, axis=-1))          # [H, bt]
        v_rows.append(v_u)                                # [H, bt, d]
        key_pos = row_pos + off
        ok_rows.append((key_pos >= 0) & (key_pos < T))    # [bt]

    s_union = jnp.stack(s_rows, axis=-1)                  # [H, bt, U]
    ok_union = jnp.stack(ok_rows, axis=-1)[None]          # [1, bt, U]
    s_union = jnp.where(ok_union, s_union, -1e30)

    # Static per-head slot selection: [H, bt, U] x [H, U, A] → [H, bt, A].
    scores = jnp.einsum("hbu,hua->hba", s_union, sel)
    # -inf propagation through the one-hot select: selected masked slots stay
    # masked (sel rows are one-hot so the product keeps the -1e30).
    rel = jnp.einsum("hbd,hda->hba", q, er)
    logits = (scores + rel) / np.sqrt(d)
    probs = jax.nn.softmax(logits, axis=-1)               # [H, bt, A]

    v_union = jnp.stack(v_rows, axis=2)                   # [H, bt, U, d]
    probs_u = jnp.einsum("hba,hua->hbu", probs, sel)      # [H, bt, U]
    out = jnp.einsum("hbu,hbud->hbd", probs_u, v_union)
    out_ref[...] = out.astype(out_ref.dtype)


def _selection_tensor(offsets: np.ndarray, dilation: int) -> Tuple[np.ndarray, int]:
    """One-hot [H, U, A] mapping union shift rows to per-head slots."""
    H, A = offsets.shape
    half = int(np.abs(offsets).max())
    U = 2 * half + 1
    sel = np.zeros((H, U, A), np.float32)
    for h in range(H):
        for a in range(A):
            sel[h, offsets[h, a] + half, a] = 1.0
    return sel, U


@functools.partial(jax.jit, static_argnames=("dilation",))
def dilated_attention_pallas(q, k, v, er, dilation: int):
    """Pallas backend: same semantics as dilated_attention."""
    B, H, T, d = q.shape
    attn_len = er.shape[-1]
    offsets = head_offsets(H, attn_len)
    sel, n_union = _selection_tensor(offsets, dilation)
    pad = (n_union // 2) * dilation
    block_t = min(512, T)
    if T % block_t:
        block_t = T  # fall back to one block when T is not divisible

    k_pad = jnp.pad(k, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    v_pad = jnp.pad(v, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    sel_j = jnp.asarray(sel)

    kernel = functools.partial(
        _dilated_kernel, dilation=dilation, block_t=block_t, pad=pad,
        n_heads=H, attn_len=attn_len, n_union=n_union, d=d, T=T,
    )
    out = pl.pallas_call(
        kernel,
        grid=(T // block_t, B),
        in_specs=[
            pl.BlockSpec((None, H, block_t, d), lambda tb, b: (b, 0, tb, 0)),
            pl.BlockSpec((None, H, T + 2 * pad, d), lambda tb, b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, T + 2 * pad, d), lambda tb, b: (b, 0, 0, 0)),
            pl.BlockSpec((H, d, attn_len), lambda tb, b: (0, 0, 0)),
            pl.BlockSpec((H, sel.shape[1], attn_len), lambda tb, b: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, H, block_t, d), lambda tb, b: (b, 0, tb, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, T, d), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(q, k_pad, v_pad, er, sel_j)
    return out
