"""Whole-song on-device generation with a persistent sliding-window KV cache.

The bucketed engine (models/generate.py) re-prefills every bar's full prompt
(history pairs + current condition bar) — the reference's own inefficiency
(etude/models/etude_decoder.py:294-315), inherited by round 1. This engine
makes the observation that every bar's prompt is a contiguous SUFFIX of one
continuous token stream

    [E,E,...,E] X_0 Y_0 X_1 Y_1 ... X_i Y_i ...
     n_ctx empty pairs (seeded once)

so the whole song decodes as ONE jit-compiled program holding a KV cache in
HBM:

  * per bar, only the new condition tokens X_i are prefix-encoded (≈50–150
    tokens) instead of the full ≈512-token prompt;
  * the decode loop runs bar after bar with NO host round trips;
  * the reference's empty-history padding for the first bars emerges
    naturally from the sliding window over the seeded empty pairs;
  * the truncation rule (keep the trailing max_pos·overlap tokens when the
    prompt exceeds the cap) becomes a window-start adjustment.

Rotary attention scores depend only on RELATIVE positions, so attending from
a continuous stream reproduces the per-bar-rebuilt prompt's scores for
identical window content. Semantics differ from the rebuild engine in two
documented ways: (1) a history token's K/V is computed once, under the
window it was generated in, rather than recomputed under each later bar's
(shifted) window — tokens keep the context they were generated under, the
window shape the model sees is unchanged; (2) when prompt_keep <
prompt_cap − 1 (non-default overlap/cap settings), positions physically
dropped by a hard truncation stay dead even if a later bar's window opens
early enough to reach them, where the rebuild engine would reconstruct them
from host history (with prompt_keep == prompt_cap − 1, the default
derivation, win_start is monotone and this case never arises). Use the
rebuild engine where exact reference logit reproduction is required.

Cache layout (the round-3 redesign; the round-2 ring buffer scaled every
decode step's cost with the ring size). The buffer has two regions:

    [0, hist)                 compacted history window — slot j of stream b
                              holds the token at global position
                              win_start[b] + j
    [hist, hist + X + 1 + max_new)
                              this bar's events at SHARED slot offsets: the
                              X condition tokens, the Bar_BOS, then one slot
                              per decode step

Every write is a `dynamic_update_slice` at a slot offset SHARED by all
streams (per-stream state lives in `slot_pos`, the global position each slot
holds for each stream, −1 = dead/junk). This keeps writes O(B·H·D) per step
— a true in-place DUS — instead of the ring design's read-modify-write over
the whole cache (and instead of a per-stream-index scatter, which XLA:TPU
lowers to a scalar-core loop). At each bar start the live window
[win_start, cur) is compacted into the history region with one one-hot
matmul (MXU work, once per bar, amortized over the bar's decode steps).

Visibility is position-based, unchanged: key slot s of stream b is visible
to a query at position q iff win_start[b] <= slot_pos[b, s] <= q. Parked
streams (past their Bar_EOS) and condition-padding slots write slot_pos −1,
so their K/V junk is never attended.

Global positions exceed the rotary table, so phases are computed on the fly
with a split-position scheme (hi·4096 + lo, hi-phases folded mod 2π in f64
on the host) that keeps f32 trig arguments small at any song length.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import SRC_CLASS_ID, TGT_CLASS_ID
from ..ops.sampling import sample_token
from ..utils.logger import logger
from .decoder import (
    ATTRIBUTE_ORDER,
    EtudeDecoderConfig,
    Params,
    _layer_norm,
    _rotate_half,
    embed_class_attrs,
    embed_inputs,
)
from .generate import ATTR_KEYS, _ATTR_KEY_TO_NAME

_POS_SPLIT = 4096  # positions = hi * 4096 + lo; hi phases folded mod 2π


@functools.lru_cache(maxsize=8)
def _phase_tables(rotary_dim: int, rotary_base: float, max_hi: int):
    """(hi_phase [max_hi, rot/2] f32 folded mod 2π, inv_freq [rot/2] f32).

    Cached as NUMPY arrays: caching jnp arrays here would capture a tracer
    the first time this runs inside a jit trace and leak it into later
    traces."""
    inv_freq = 1.0 / (
        rotary_base ** (np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim)
    )
    hi = np.arange(max_hi, dtype=np.float64)[:, None] * _POS_SPLIT * inv_freq[None]
    hi_phase = np.mod(hi, 2 * np.pi).astype(np.float32)
    return hi_phase, inv_freq.astype(np.float32)


def _rotary_at(positions: jnp.ndarray, config: EtudeDecoderConfig,
               max_hi: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [..., rotary_dim] at arbitrary (large) integer positions."""
    hi_phase_np, inv_freq_np = _phase_tables(
        config.rotary_dim, config.rotary_base, max_hi
    )
    hi_phase, inv_freq = jnp.asarray(hi_phase_np), jnp.asarray(inv_freq_np)
    hi = positions // _POS_SPLIT
    lo = (positions % _POS_SPLIT).astype(jnp.float32)
    phase = hi_phase[hi] + lo[..., None] * inv_freq  # [..., rot/2]
    emb = jnp.concatenate([phase, phase], axis=-1)   # [..., rot]
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rotary_pos(x, cos, sin, rotary_dim):
    x_rot, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    x_rot = x_rot * cos + _rotate_half(x_rot) * sin
    return jnp.concatenate([x_rot, x_pass], axis=-1)


def init_stream_cache(config: EtudeDecoderConfig, batch: int,
                      cache_len: int, dtype=jnp.bfloat16,
                      quant: bool = False):
    """Two-region window cache (see module docstring); cache_len = hist
    region + bar region.

    K/V layout is [L, B, H, D, C] — the slot axis LAST so it lands in the
    TPU lane dimension. The decode step is HBM-bound on the cache read, and
    with the naive [.., C, H, D] layout the minor dims (H=8, D=64) tile onto
    the (sublane, lane) grid with 4–8× padding waste (measured ~0.69 µs per
    slot per step ≈ 6% of HBM bandwidth on ideal bytes). With C minor the
    tiles are dense in the long axis and the read streams at full width.

    quant=True stores K/V as int8 with one f32 scale per (layer, stream,
    head, slot) — amax/127 symmetric quantization. int8 halves the cache
    read; the score and context dots run int8×int8 → s32 with the scales
    applied outside the contractions (per-slot scales factor out of the
    D / C sums)."""
    L, H, D = (config.num_hidden_layers, config.num_attention_heads,
               config.head_dim)
    shape = (L, batch, H, D, cache_len)
    cache = {
        "k": jnp.zeros(shape, jnp.int8 if quant else dtype),
        "v": jnp.zeros(shape, jnp.int8 if quant else dtype),
        # Global stream position held in each slot; -1 = dead/never visible.
        "slot_pos": jnp.full((batch, cache_len), -1, jnp.int32),
    }
    if quant:
        cache["k_scale"] = jnp.zeros((L, batch, H, cache_len), jnp.float32)
        cache["v_scale"] = jnp.zeros((L, batch, H, cache_len), jnp.float32)
    return cache


def _quantize_kv(x: jnp.ndarray):
    """[B,S,H,D] f32 → (int8 values, f32 scales [B,S,H]) with amax/127
    symmetric per-(token, head) scaling."""
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = amax / 127.0
    q = jnp.round(x / jnp.maximum(scale[..., None], 1e-8))
    return q.astype(jnp.int8), scale


def compact_window(cache, win_start: jnp.ndarray, cur: jnp.ndarray,
                   hist: int):
    """Gather each stream's live window [win_start, cur) to the front of the
    history region and clear the bar region.

    Implemented as a one-hot matmul over the slot axis (dense MXU work; a
    per-stream gather would hit TPU's slow batched-index path). Runs once per
    bar, amortized over the bar's decode steps."""
    C = cache["slot_pos"].shape[1]
    j = jnp.arange(hist, dtype=jnp.int32)
    target_pos = win_start[:, None] + j[None]                    # [B, hist]
    live = target_pos < cur[:, None]
    match = (cache["slot_pos"][:, None, :] == target_pos[:, :, None]) & (
        live[:, :, None]
    )                                                            # [B, hist, C]
    # A target position with NO source slot (it was physically dropped by an
    # earlier, further-forward truncation: win_start regressed, which happens
    # whenever prompt_keep < prompt_cap - 1) must stay dead — marking it live
    # would expose zero-K/V phantom keys to every later softmax.
    live = live & jnp.any(match, axis=2)

    def gather(arr, spec):  # slot axis is last ('c' → 'j'); bar zeroed
        if arr.dtype == jnp.int8:
            # 0/1 matrix: the int8 contraction is exact; results stay in
            # int8 range because each output slot matches at most one input.
            hist_part = jnp.einsum(
                spec, match.astype(jnp.int8), arr,
                preferred_element_type=jnp.int32,
            ).astype(jnp.int8)
        else:
            hist_part = jnp.einsum(spec, match.astype(arr.dtype), arr)
        pad_shape = list(hist_part.shape)
        pad_shape[-1] = C - hist
        return jnp.concatenate(
            [hist_part, jnp.zeros(pad_shape, arr.dtype)], axis=-1
        )

    new_slot_pos = jnp.concatenate(
        [jnp.where(live, target_pos, -1),
         jnp.full((cache["slot_pos"].shape[0], C - hist), -1, jnp.int32)],
        axis=1,
    )
    out = {
        "k": gather(cache["k"], "bjc,lbhdc->lbhdj"),
        "v": gather(cache["v"], "bjc,lbhdc->lbhdj"),
        "slot_pos": new_slot_pos,
    }
    for key in ("k_scale", "v_scale"):
        if key in cache:
            out[key] = gather(cache[key], "bjc,lbhc->lbhj")
    return out


def stream_chunk(
    params: Params,
    config: EtudeDecoderConfig,
    cache,
    input_ids: jnp.ndarray,      # [B, S]
    class_ids: jnp.ndarray,      # [B, S]
    attr_ids: Dict[str, jnp.ndarray],
    start_pos: jnp.ndarray,      # [B] global position of token 0
    win_start: jnp.ndarray,      # [B] first visible global position
    slot_offset,                 # scalar int32: tokens land in slots
                                 # [slot_offset, slot_offset + S)
    valid_len: Optional[jnp.ndarray] = None,  # [B] tokens s >= valid_len[b]
                                              # write slot_pos -1 (junk)
    max_hi: int = 16,
    compute_dtype=jnp.bfloat16,
    hist_read: Optional[int] = None,  # static: with `hist`, the attention
                                      # reads only slots [0, hist_read) ∪
                                      # [hist, C) — exact whenever every
                                      # live history slot is < hist_read
                                      # (the caller guarantees it); cuts
                                      # the HBM-bound cache read
    hist: Optional[int] = None,
    embed_extra: Optional[jnp.ndarray] = None,  # [B, S, hidden] precomputed
                                      # class+attribute embedding sum — the
                                      # decode loop hoists it (constant per
                                      # bar), skipping the gathers + proj
                                      # matmul every step
):
    """Encode S new tokens of the stream against the window cache.

    Token s of every stream is written to slot slot_offset + s — the slot
    index is SHARED across streams, so each write is one dynamic_update_slice
    (in-place inside the surrounding while_loop). Per-stream facts (the
    global position a slot holds, or -1 for condition padding / parked
    streams) live in slot_pos and gate visibility. Returns (logits, cache).
    """
    B, S = input_ids.shape
    n_heads, head_dim = config.num_attention_heads, config.head_dim
    eps = config.layer_norm_eps

    if embed_extra is None:
        h = embed_inputs(
            params, config, input_ids, class_ids, attr_ids, compute_dtype
        )
    else:
        h = (params["word_emb"][input_ids] + embed_extra).astype(compute_dtype)

    positions = start_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None]  # [B,S]
    cos, sin = _rotary_at(positions, config, max_hi)

    if valid_len is None:
        pos_vals = positions
    else:
        pos_vals = jnp.where(
            jnp.arange(S, dtype=jnp.int32)[None] < valid_len[:, None],
            positions, -1,
        )
    new_slot_pos = jax.lax.dynamic_update_slice(
        cache["slot_pos"], pos_vals, (0, slot_offset)
    )

    C = cache["k"].shape[-1]
    quant = "k_scale" in cache

    def bias_for(regions):
        # Attention bias [B, 1, S, R]: visible iff win_start <= key_pos <=
        # query_pos (slot_pos == -1 never visible since win_start >= 0).
        key_pos = jnp.concatenate(
            [new_slot_pos[:, lo:hi] for lo, hi in regions], axis=1
        )[:, None, None, :]
        q_pos = positions[:, None, :, None]
        visible = (key_pos >= win_start[:, None, None, None]) & (
            key_pos <= q_pos
        )
        return jnp.where(visible, 0.0, -1e9).astype(jnp.float32)

    # The read regions (and hence the bias) are identical for every layer:
    # compute the bias ONCE here, not per layer.
    if quant or hist_read is None or hist is None or hist_read >= hist:
        read_regions = ((0, C),)
    else:
        read_regions = ((0, hist_read), (hist, C))
    bias = bias_for(read_regions)

    # Python loop over layers with STATIC layer indices. A lax.scan carrying
    # the stacked [L, ...] cache as xs/ys rebuilds the whole stacked
    # array every call (each layer's slice is read, updated and
    # re-stacked into a fresh ys buffer) — measured ~3x the pure attention-
    # read traffic per decode step. Static indexing keeps the cache threaded
    # linearly, so the only cache traffic is the (l, slot) DUS write and the
    # attention read; layer param slices are loop-invariant and hoisted.
    new_k, new_v = cache["k"], cache["v"]
    new_ks = cache.get("k_scale")
    new_vs = cache.get("v_scale")
    for layer_idx in range(config.num_hidden_layers):
        layer = jax.tree.map(lambda a: a[layer_idx], params["layers"])
        x = h
        a_in = _layer_norm(x, layer["ln1"]["scale"], layer["ln1"]["bias"], eps)
        qkv = a_in @ layer["qkv"]["w"].astype(compute_dtype) + layer["qkv"]["b"].astype(compute_dtype)
        qkv = qkv.reshape(B, S, n_heads, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _apply_rotary_pos(q.astype(jnp.float32), cos, sin, config.rotary_dim)
        k = _apply_rotary_pos(k.astype(jnp.float32), cos, sin, config.rotary_dim)

        # Write layout: cache is [L, B, H, D, C] (slot axis in lanes).
        if quant:
            k_w, ks_w = _quantize_kv(k)
            v_w, vs_w = _quantize_kv(v.astype(jnp.float32))
            new_ks = jax.lax.dynamic_update_slice(
                new_ks, ks_w.transpose(0, 2, 1)[None],
                (layer_idx, 0, 0, slot_offset),
            )
            new_vs = jax.lax.dynamic_update_slice(
                new_vs, vs_w.transpose(0, 2, 1)[None],
                (layer_idx, 0, 0, slot_offset),
            )
        else:
            k_w = k.astype(new_k.dtype)
            v_w = v.astype(new_v.dtype)
        new_k = jax.lax.dynamic_update_slice(
            new_k, k_w.transpose(0, 2, 3, 1)[None],
            (layer_idx, 0, 0, 0, slot_offset),
        )
        new_v = jax.lax.dynamic_update_slice(
            new_v, v_w.transpose(0, 2, 3, 1)[None],
            (layer_idx, 0, 0, 0, slot_offset),
        )

        if quant:
            # Per-slot scales factor out of the D-contraction: the score dot
            # runs int8×int8 → s32 (halved HBM read), scales applied to the
            # s32 result.
            q_q, q_s = _quantize_kv(q)
            s32 = jnp.einsum(
                "bqhd,bhdc->bhqc", q_q, new_k[layer_idx],
                preferred_element_type=jnp.int32,
            )
            scores = (
                s32.astype(jnp.float32)
                * q_s.transpose(0, 2, 1)[:, :, :, None]
                * new_ks[layer_idx][:, :, None, :]
            ) / np.sqrt(head_dim)
            probs = jax.nn.softmax(scores + bias, axis=-1)
        else:
            # Read-only attention over static slot regions: with hist_read
            # set, the dead tail of the history region is neither read nor
            # scored. NOTE: the region choice must be STATIC — wrapping
            # this block (or the whole decode loop) in lax.cond/switch
            # benched SLOWER than the full read, the branch boundary
            # copying the captured cache buffers every step/bar.
            k_l, v_l = new_k[layer_idx], new_v[layer_idx]
            q_c = q.astype(compute_dtype)

            scores = jnp.concatenate([
                jnp.einsum(
                    "bqhd,bhdc->bhqc", q_c,
                    jax.lax.slice_in_dim(
                        k_l, lo, hi, axis=3
                    ).astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                for lo, hi in read_regions
            ], axis=-1) / np.sqrt(head_dim)
            probs = jax.nn.softmax(scores + bias, axis=-1)
            ctx = 0.0
            r0 = 0
            for lo, hi in read_regions:
                ctx = ctx + jnp.einsum(
                    "bhqc,bhdc->bqhd",
                    probs[..., r0:r0 + hi - lo].astype(compute_dtype),
                    jax.lax.slice_in_dim(
                        v_l, lo, hi, axis=3
                    ).astype(compute_dtype),
                )
                r0 += hi - lo
        w_o = layer["attn_out"]["w"].astype(compute_dtype).reshape(
            n_heads, head_dim, -1
        )
        if quant:
            # Fold the V slot scales into the probabilities, quantize the
            # result per (stream, head, query) and contract int8×int8.
            pv = probs * new_vs[layer_idx][:, :, None, :]
            p_amax = jnp.max(pv, axis=-1)
            p_scale = p_amax / 127.0
            p_q = jnp.round(
                pv / jnp.maximum(p_scale[..., None], 1e-12)
            ).astype(jnp.int8)
            c32 = jnp.einsum(
                "bhqc,bhdc->bqhd", p_q, new_v[layer_idx],
                preferred_element_type=jnp.int32,
            )
            ctx = (
                c32.astype(jnp.float32)
                * p_scale.transpose(0, 2, 1)[..., None]
            ).astype(compute_dtype)
        attn_out = jnp.einsum(
            "bqhd,hde->bqe", ctx, w_o
        ) + layer["attn_out"]["b"].astype(compute_dtype)

        m_in = _layer_norm(x, layer["ln2"]["scale"], layer["ln2"]["bias"], eps)
        m = m_in @ layer["mlp_in"]["w"].astype(compute_dtype) + layer["mlp_in"]["b"].astype(compute_dtype)
        m = jax.nn.gelu(m, approximate=False)
        mlp_out = m @ layer["mlp_out"]["w"].astype(compute_dtype) + layer["mlp_out"]["b"].astype(compute_dtype)
        h = x + attn_out + mlp_out

    h = _layer_norm(h, params["final_ln"]["scale"], params["final_ln"]["bias"], eps)
    logits = h.astype(jnp.float32) @ params["lm_head"].astype(jnp.float32)
    new_cache = {"k": new_k, "v": new_v, "slot_pos": new_slot_pos}
    if quant:
        new_cache["k_scale"] = new_ks
        new_cache["v_scale"] = new_vs
    return logits, new_cache


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "n_ctx", "max_new_tokens", "hist",
        "bar_bos_id", "bar_eos_id", "pad_id", "prompt_cap", "prompt_keep",
        "max_hi", "kv_quant", "hist_read",
    ),
)
def generate_song_stream(
    params: Params,
    config: EtudeDecoderConfig,
    x_tokens: jnp.ndarray,       # [B, N_BARS, X] int32, right-padded
    x_lens: jnp.ndarray,         # [B, N_BARS] int32
    x_attrs: Dict[str, jnp.ndarray],   # each [B, N_BARS] int32
    n_bars: jnp.ndarray,         # scalar int32 (dynamic trip count)
    max_output_tokens: jnp.ndarray,  # scalar int32 global budget
    rng: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    *,
    n_ctx: int,
    max_new_tokens: int,
    hist: int,
    bar_bos_id: int,
    bar_eos_id: int,
    pad_id: int,
    prompt_cap: int,
    prompt_keep: int,
    max_hi: int,
    kv_quant: bool = False,
    hist_read: Optional[int] = None,  # static: see stream_chunk — the
                                      # engine derives it from the packed
                                      # bar lengths (window never exceeds
                                      # prompt_cap − 1 − min bar length)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate every bar of a song in one on-device program.

    Returns (y_tokens [B, N_BARS, max_new_tokens], y_counts [B, N_BARS]);
    each bar's tokens exclude the Bar_BOS opener and include the Bar_EOS.
    """
    B, N_BARS, X = x_tokens.shape
    cache_len = hist + X + 1 + max_new_tokens

    # Pre-cast the matmul weights to bf16 ONCE, outside the bar/step loops:
    # stream_chunk casts them at use anyway (same numerics), but doing it
    # here keeps the while_loop body reading 2-byte buffers — the f32
    # master weights would otherwise be re-read (and re-cast) every decode
    # step (~50 MB/step of avoidable HBM traffic). LayerNorm params and the
    # LM head are consumed in f32 and stay untouched.
    params = dict(params)
    params["layers"] = {
        name: (block if name in ("ln1", "ln2") else
               jax.tree.map(lambda a: a.astype(jnp.bfloat16), block))
        for name, block in params["layers"].items()
    }

    cache = init_stream_cache(config, B, cache_len, quant=kv_quant)

    # ---- seed: n_ctx empty (X, Y) pairs — the reference's empty-history
    # padding (etude_decoder.py:263-276) emerges from the sliding window.
    # Written straight into the history region (slot j = position j, already
    # compact).
    seed_len = 4 * n_ctx
    pair = [bar_bos_id, bar_eos_id]
    seed_ids = jnp.asarray(pair * (2 * n_ctx), jnp.int32)[None].repeat(B, 0)
    seed_cls = jnp.asarray(
        ([SRC_CLASS_ID] * 2 + [TGT_CLASS_ID] * 2) * n_ctx, jnp.int32
    )[None].repeat(B, 0)
    seed_attrs = {
        name: jnp.ones((B, seed_len), jnp.int32) for name in ATTRIBUTE_ORDER
    }
    zero = jnp.zeros((B,), jnp.int32)
    _, cache = stream_chunk(
        params, config, cache, seed_ids, seed_cls, seed_attrs,
        start_pos=zero, win_start=zero, slot_offset=jnp.int32(0),
        max_hi=max_hi,
    )

    # Pair starts for pairs [i, i + n_ctx] (window for bar i opens at the
    # first of these): seeded pair j starts at 4j; pair n_ctx (= X_0) at 4n.
    pair_starts0 = jnp.asarray(
        [4 * j for j in range(n_ctx + 1)], jnp.int32
    )[None].repeat(B, 0)

    y_tokens0 = jnp.full((B, N_BARS, max_new_tokens), pad_id, jnp.int32)
    y_counts0 = jnp.zeros((B, N_BARS), jnp.int32)
    cur0 = jnp.full((B,), seed_len, jnp.int32)

    def bar_body(state):
        (i, cur, pair_starts, cache, y_tokens, y_counts, rng) = state

        x_i = jax.lax.dynamic_index_in_dim(x_tokens, i, axis=1, keepdims=False)
        len_i = jax.lax.dynamic_index_in_dim(x_lens, i, axis=1, keepdims=False)
        attrs_i = {
            name: jax.lax.dynamic_index_in_dim(a, i, axis=1, keepdims=False)
            for name, a in x_attrs.items()
        }

        # Window start: last n_ctx pairs, tightened by the truncation rule
        # (prompt = window + X_i; if longer than cap-1 keep the trailing
        # prompt_keep tokens — generate.py build_prompt semantics).
        win_start = pair_starts[:, 0]
        x_end = cur + len_i
        prompt_len = x_end - win_start
        win_start = jnp.where(
            prompt_len > prompt_cap - 1, x_end - prompt_keep, win_start
        )

        # ---- slide the live window to the front of the history region.
        cache = compact_window(cache, win_start, cur, hist)

        # ---- encode the new condition tokens (the bar's only "prefill").
        attr_seq = {
            name: jnp.broadcast_to(a[:, None], (B, X)) for name, a in attrs_i.items()
        }
        cls_seq = jnp.full((B, X), SRC_CLASS_ID, jnp.int32)
        _, cache_x = stream_chunk(
            params, config, cache, x_i, cls_seq, attr_seq,
            start_pos=cur, win_start=win_start,
            slot_offset=jnp.int32(hist), valid_len=len_i, max_hi=max_hi,
            hist_read=hist_read, hist=hist,
        )

        # ---- Bar_BOS opener (target class, target attrs) → first logits.
        bos = jnp.full((B, 1), bar_bos_id, jnp.int32)
        cls1 = jnp.full((B, 1), TGT_CLASS_ID, jnp.int32)
        attr1 = {name: a[:, None] for name, a in attrs_i.items()}
        logits, cache_y = stream_chunk(
            params, config, cache_x, bos, cls1, attr1,
            start_pos=x_end, win_start=win_start,
            slot_offset=jnp.int32(hist + X), max_hi=max_hi,
            hist_read=hist_read, hist=hist,
        )
        last_logits = logits[:, 0]

        done0 = jnp.zeros((B,), bool)
        counts0 = jnp.zeros((B,), jnp.int32)
        bar_out0 = jnp.full((B, max_new_tokens), pad_id, jnp.int32)

        # Decode-loop hoist (preserves stream_chunk numerics exactly):
        # class/attr ids are constant across the bar → precompute their
        # embedding sum once instead of re-gathering + projecting per step.
        # (An incremental bias carry — one DUS/step instead of rebuilding
        # the [B, C] position comparisons — was also benched: within noise
        # of the rebuild at B=16; the extra carried buffer was not worth
        # the complexity and was removed.)
        extra1 = embed_class_attrs(params, cls1, attr1)  # [B, 1, hidden] f32

        def cond(s):
            step, _, _, done, _, _, _ = s
            return (step < max_new_tokens) & (~jnp.all(done))

        def make_body(hist_read):
            def body(s):
                step, last_logits, cache, done, bar_out, counts, rng = s
                rng, sub = jax.random.split(rng)
                tok = sample_token(
                    last_logits, sub, temperature, top_p
                ).astype(jnp.int32)
                tok = jnp.where(done, pad_id, tok)
                bar_out = jax.lax.dynamic_update_slice(
                    bar_out, tok[:, None], (0, step)
                )
                counts = counts + jnp.where(done, 0, 1)
                done_next = done | (tok == bar_eos_id)

                # Parked streams' positions do not advance; their slot gets
                # slot_pos -1 (valid_len 0) so the junk K/V is never
                # visible.
                pos = x_end + 1 + step
                logits, cache = stream_chunk(
                    params, config, cache, tok[:, None], cls1, attr1,
                    start_pos=pos, win_start=win_start,
                    slot_offset=jnp.int32(hist + X + 1) + step,
                    valid_len=jnp.where(done, 0, 1),
                    max_hi=max_hi,
                    hist_read=hist_read, hist=hist,
                    embed_extra=extra1,
                )
                return (step + 1, logits[:, 0], cache, done_next, bar_out,
                        counts, rng)
            return body

        rng, sub = jax.random.split(rng)
        state = (jnp.int32(0), last_logits, cache_y, done0, bar_out0,
                 counts0, sub)
        # ONE plain while_loop. DYNAMIC read narrowing was tried three
        # ways and all benched SLOWER at B=16 than the full-width read,
        # despite a 2.3x faster step in isolation at the narrow width:
        # lax.switch around the loop, a per-step lax.switch around only
        # the read+softmax+ctx block, and a chain of gated while_loops all
        # broke XLA's in-place aliasing of the carried cache (branch/loop
        # boundaries copy the [L,B,H,D,C] buffers). The loop stays
        # branch-free; the only read narrowing is the STATIC `hist_read`
        # bound the engine derives at pack time.
        state = jax.lax.while_loop(cond, make_body(hist_read), state)
        _, _, cache, _, bar_out, counts, _ = state

        y_tokens = jax.lax.dynamic_update_slice(
            y_tokens, bar_out[:, None, :], (0, i, 0)
        )
        y_counts = jax.lax.dynamic_update_slice(
            y_counts, counts[:, None], (0, i)
        )

        cur = x_end + 1 + counts       # X_i + BOS + generated tokens
        pair_starts = jnp.concatenate(
            [pair_starts[:, 1:], cur[:, None]], axis=1
        )
        return (i + 1, cur, pair_starts, cache, y_tokens, y_counts, rng)

    def bar_cond(state):
        i, _, _, _, _, y_counts, _ = state
        # Device-side enforcement of the global budget (the host applies the
        # same rule per stream when unpacking: the bar that CROSSES the
        # budget is kept, later bars dropped). Without this the program
        # would decode every remaining bar just for the host to discard it.
        any_under = jnp.any(jnp.sum(y_counts, axis=1) < max_output_tokens)
        return (i < n_bars) & any_under

    state = (jnp.int32(0), cur0, pair_starts0, cache, y_tokens0, y_counts0, rng)
    _, _, _, _, y_tokens, y_counts, _ = jax.lax.while_loop(
        bar_cond, bar_body, state
    )
    return y_tokens, y_counts


def _round_up(n: int, multiple: int) -> int:
    return max(((n + multiple - 1) // multiple) * multiple, multiple)


class StreamingGenerationEngine:
    """Host wrapper: packs a song's condition bars once, runs ONE on-device
    program for the entire generation, and unpacks bars.

    Prompt-window semantics (history pairs, empty-bar padding, truncation,
    attribute/class streams) mirror generate.GenerationEngine; see the module
    docstring for the one divergence (history K/V computed once, streaming).
    """

    def __init__(
        self,
        config: EtudeDecoderConfig,
        bar_bos_id: int,
        bar_eos_id: int,
        pad_id: int = 0,
        max_bar_token_limit: int = 512,
        context_overlap_ratio: float = 0.5,
        prompt_cap: Optional[int] = None,
        x_len_buckets: Sequence[int] = (64, 128, 192, 320),
        bars_bucket: int = 32,
        kv_quant: bool = False,
    ):
        self.config = config
        self.kv_quant = kv_quant
        self.bar_bos_id = bar_bos_id
        self.bar_eos_id = bar_eos_id
        self.pad_id = pad_id
        self.max_bar_token_limit = min(
            max_bar_token_limit, config.max_position_embeddings
        )
        derived_cap = max(
            config.max_position_embeddings - self.max_bar_token_limit, 1
        )
        self.prompt_cap = min(prompt_cap, derived_cap) if prompt_cap else derived_cap
        keep = int(config.max_position_embeddings * context_overlap_ratio) - 1
        self.prompt_keep = max(min(keep, self.prompt_cap - 1), 1)
        self.x_len_buckets = sorted(x_len_buckets)
        self.bars_bucket = bars_bucket

    def generate(self, params, all_x_bars, target_attributes_per_bar, **kw):
        streams = self.generate_batch(
            params, [all_x_bars], [target_attributes_per_bar], **kw
        )
        return streams[0]

    def generate_batch(
        self,
        params: Params,
        x_bars_per_stream: List[List[List[int]]],
        attrs_per_stream: List[List[Dict[str, int]]],
        *,
        temperature: float = 0.0,
        top_p: float = 0.9,
        max_output_tokens: int = 25600,
        seed: int = 0,
        progress: bool = False,
        mesh=None,
        data_axis: str = "data",
    ) -> List[List[List[int]]]:
        """`mesh`: optional jax.sharding.Mesh — streams are sharded over its
        `data_axis` (params replicated), scaling batched serving (e.g. the
        27-attribute sweep) across chips. Every per-stream op in the engine
        is batch-parallel, so XLA partitions the whole song program with no
        cross-device collectives beyond the initial broadcast."""
        n_requested = len(x_bars_per_stream)
        if n_requested == 0:
            return []
        if mesh is not None:
            n_dp = mesh.shape[data_axis]
            pad_streams = (-n_requested) % n_dp
            if pad_streams:
                empty = [[self.bar_bos_id, self.bar_eos_id]]
                x_bars_per_stream = list(x_bars_per_stream) + [empty] * pad_streams
                attrs_per_stream = list(attrs_per_stream) + [
                    [{k: 1 for k in ATTR_KEYS}]
                ] * pad_streams
        B = len(x_bars_per_stream)
        num_bars = max(len(s) for s in x_bars_per_stream)
        if num_bars == 0:
            return [[] for _ in range(n_requested)]
        n_ctx = self.config.context_num_past_xy_pairs

        max_x = max(
            (len(bar) for s in x_bars_per_stream for bar in s), default=2
        )
        # Condition bars longer than the prompt budget would be truncated by
        # the window rule anyway; cap the buffer at the prompt cap.
        max_x = min(max_x, self.prompt_cap)
        X = next((b for b in self.x_len_buckets if max_x <= b),
                 _round_up(max_x, 64))
        N_BARS = _round_up(num_bars, self.bars_bucket)

        x_tokens = np.full((B, N_BARS, X), self.pad_id, np.int32)
        x_lens = np.zeros((B, N_BARS), np.int32)
        x_attrs = {
            name: np.ones((B, N_BARS), np.int32) for name in ATTRIBUTE_ORDER
        }
        empty_bar = [self.bar_bos_id, self.bar_eos_id]
        for b in range(B):
            stream = x_bars_per_stream[b]
            for i in range(N_BARS):
                bar = stream[i] if i < len(stream) else empty_bar
                bar = bar[-X:]  # over-long bars keep their tail (window rule)
                x_tokens[b, i, : len(bar)] = bar
                x_lens[b, i] = len(bar)
                attrs = (
                    attrs_per_stream[b][i]
                    if i < len(stream)
                    else {k: 1 for k in ATTR_KEYS}
                )
                for key in ATTR_KEYS:
                    x_attrs[_ATTR_KEY_TO_NAME[key]][b, i] = attrs[key]

        # Stream length bound → rotary hi-table size.
        max_pos = (
            4 * n_ctx
            + N_BARS * (X + 1 + self.max_bar_token_limit)
        )
        max_hi = int(max_pos // _POS_SPLIT) + 2

        # History region: the compacted live window [win_start, cur) never
        # exceeds prompt_cap positions (the truncation rule bounds
        # x_end - win_start by prompt_cap - 1; seeding adds 4·n_ctx).
        hist = max(self.prompt_cap, 4 * n_ctx)

        # STATIC attention-read bound for the history region: for bar i,
        # window_len = prompt_len − len_i and prompt_len ≤ prompt_cap − 1
        # (with or without truncation), so window_len ≤ prompt_cap − 1 −
        # min(len_i) over every bar that will run (only bars [0, num_bars)
        # run — bucket padding must not weaken the bound; per-stream empty
        # padding bars inside that range weaken it automatically). Slots at
        # or beyond the bound are always dead — the decode step skips
        # reading them with zero control flow (stream_chunk hist_read).
        # Engaged only when it saves ≥ a quarter of the history read
        # (measured: the two-region structure — extra einsums, sliced
        # reads — costs more than a small saving buys; a weak bound
        # benched 14.0k → 10.3k tok/s at B=16). 128-aligned for tiling.
        min_len = int(x_lens[:, :num_bars].min()) if x_lens.size else 2
        bound = max(self.prompt_cap - 1 - min_len, 4 * n_ctx)
        hist_read = -(-bound // 128) * 128
        if hist_read > (3 * hist) // 4:
            hist_read = None

        if progress:
            logger.info(
                f"streaming generation: {num_bars} bars "
                f"(buckets: X={X}, bars={N_BARS}) in one device program"
                + (f", {B} streams over {mesh.shape[data_axis]} devices"
                   if mesh is not None else "")
            )
        x_tokens_j = jnp.asarray(x_tokens)
        x_lens_j = jnp.asarray(x_lens)
        x_attrs_j = {k: jnp.asarray(v) for k, v in x_attrs.items()}
        params_j = params
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def shard(a):  # stream axis over the mesh's data axis
                spec = P(data_axis, *([None] * (a.ndim - 1)))
                return jax.device_put(a, NamedSharding(mesh, spec))

            x_tokens_j = shard(x_tokens_j)
            x_lens_j = shard(x_lens_j)
            x_attrs_j = {k: shard(v) for k, v in x_attrs_j.items()}
            repl = NamedSharding(mesh, P())
            params_j = jax.device_put(params, repl)
        y_tokens, y_counts = generate_song_stream(
            params_j, self.config,
            x_tokens_j, x_lens_j,
            x_attrs_j,
            jnp.int32(num_bars),
            jnp.int32(max_output_tokens),
            jax.random.PRNGKey(seed),
            jnp.float32(temperature), jnp.float32(top_p),
            n_ctx=n_ctx,
            max_new_tokens=self.max_bar_token_limit,
            hist=hist,
            bar_bos_id=self.bar_bos_id,
            bar_eos_id=self.bar_eos_id,
            pad_id=self.pad_id,
            prompt_cap=self.prompt_cap,
            prompt_keep=self.prompt_keep,
            max_hi=max_hi,
            kv_quant=self.kv_quant,
            hist_read=hist_read,
        )
        y_tokens = np.asarray(y_tokens)
        y_counts = np.asarray(y_counts)

        outputs: List[List[List[int]]] = [[] for _ in range(n_requested)]
        for b in range(n_requested):  # mesh-padding streams are dropped
            total = 0
            for i in range(len(x_bars_per_stream[b])):
                # Matches the rebuild engine's budget rule: the bar that
                # crosses max_output_tokens is kept, later bars are dropped.
                if total >= max_output_tokens:
                    logger.warn(
                        f"stream {b}: max_output_tokens reached at bar {i}"
                    )
                    break
                bar = [self.bar_bos_id] + y_tokens[b, i, : y_counts[b, i]].tolist()
                total += len(bar) - 1
                outputs[b].append(bar)
        return outputs
