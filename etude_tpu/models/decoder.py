"""EtudeDecoder: attribute-conditioned causal LM for the Decode stage.

Capability parity with the reference decoder (etude/models/etude_decoder.py):
input embedding = word + class + projected concat of four attribute
embeddings; GPT-NeoX-style backbone (parallel attention+MLP residual, rotary
position embeddings on a fraction of head dims, untied LM head); cross-entropy
loss with -100 label masking.

TPU-first design departures from the reference:
  * pure functional params pytree — no module framework in the hot path;
  * all transformer layers stored as stacked [L, ...] arrays and executed with
    `lax.scan`, so XLA compiles ONE layer body regardless of depth;
  * bf16 matmul compute path (MXU native) with f32 accumulation/logits;
  * forward supports an explicit KV cache (see models/generate.py) so the
    whole autoregressive bar loop runs on device under one jit.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# Attribute order is part of the data contract (concatenation order of the
# attribute embeddings before projection).
ATTRIBUTE_ORDER = ("pitch_overlap", "polyphony", "sustain", "rhythm_intensity")


@dataclasses.dataclass(frozen=True)
class EtudeDecoderConfig:
    vocab_size: int = 3000
    pad_token_id: int = 0
    hidden_size: int = 512
    num_hidden_layers: int = 8
    num_attention_heads: int = 8
    intermediate_size: int = 2048
    max_position_embeddings: int = 1024

    num_classes: int = 3
    pad_class_id: int = 0
    attribute_pad_id: int = 0
    context_num_past_xy_pairs: int = 4
    num_attribute_bins: int = 3
    attribute_emb_dim: int = 64

    rotary_pct: float = 0.25
    rotary_base: float = 10000.0
    layer_norm_eps: float = 1e-5
    initializer_range: float = 0.02

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.rotary_pct)

    # ---- JSON round trip (accepts reference decoder-config files) -------
    def to_json_file(self, path: Union[str, Path]) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def from_json_file(cls, path: Union[str, Path]) -> "EtudeDecoderConfig":
        with open(path, "r", encoding="utf-8") as f:
            data = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in known})


Params = Dict[str, Any]


# ------------------------------------------------------------------ init
def init_params(config: EtudeDecoderConfig, seed: int = 0,
                abstract: bool = False) -> Params:
    """Initialize the parameter pytree (f32 master weights).

    Layer parameters are stacked along a leading [L] axis for lax.scan.
    abstract=True returns the same tree with jax.ShapeDtypeStruct leaves —
    no host materialization, no device upload (the ~100 MB random init costs
    ~1 s through a remote tunnel; checkpoint loaders only need the template).
    """
    rng = np.random.default_rng(seed)
    std = config.initializer_range
    H, L = config.hidden_size, config.num_hidden_layers
    I, V = config.intermediate_size, config.vocab_size
    A = config.attribute_emb_dim

    if abstract:
        def normal(*shape):
            return jax.ShapeDtypeStruct(shape, jnp.float32)

        zeros = ones = normal
    else:
        def normal(*shape):
            return rng.normal(0.0, std, size=shape).astype(np.float32)

        def zeros(*shape):
            return np.zeros(shape, np.float32)

        def ones(*shape):
            return np.ones(shape, np.float32)

    word_emb = normal(V, H)
    class_emb = normal(config.num_classes, H)
    attr_emb = {name: normal(config.num_attribute_bins, A)
                for name in ATTRIBUTE_ORDER}
    if not abstract:
        word_emb[config.pad_token_id] = 0.0
        class_emb[config.pad_class_id] = 0.0
        for e in attr_emb.values():
            e[config.attribute_pad_id] = 0.0

    params = {
        "word_emb": word_emb,
        "class_emb": class_emb,
        "attr_emb": attr_emb,
        "attr_proj": {"w": normal(len(ATTRIBUTE_ORDER) * A, H), "b": zeros(H)},
        "layers": {
            "ln1": {"scale": ones(L, H), "bias": zeros(L, H)},
            "ln2": {"scale": ones(L, H), "bias": zeros(L, H)},
            "qkv": {"w": normal(L, H, 3 * H), "b": zeros(L, 3 * H)},
            "attn_out": {"w": normal(L, H, H), "b": zeros(L, H)},
            "mlp_in": {"w": normal(L, H, I), "b": zeros(L, I)},
            "mlp_out": {"w": normal(L, I, H), "b": zeros(L, H)},
        },
        "final_ln": {"scale": ones(H), "bias": zeros(H)},
        "lm_head": normal(H, V),
    }
    if abstract:
        return params
    return jax.tree.map(jnp.asarray, params)


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ------------------------------------------------------------- primitives
def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (normed * scale + bias).astype(x.dtype)


def rotary_tables(config: EtudeDecoderConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables of shape [max_pos, rotary_dim] (half-duplicated layout,
    matching the rotate-half convention)."""
    rot = config.rotary_dim
    inv_freq = 1.0 / (
        config.rotary_base ** (np.arange(0, rot, 2, dtype=np.float32) / rot)
    )
    t = np.arange(config.max_position_embeddings, dtype=np.float32)
    freqs = np.outer(t, inv_freq)  # [T, rot/2]
    emb = np.concatenate([freqs, freqs], axis=-1)  # [T, rot]
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                  rotary_dim: int) -> jnp.ndarray:
    """Apply rotary embedding to the first rotary_dim dims of each head.

    x: [..., T, n_heads, head_dim]; cos/sin: [T, rotary_dim] or
    [B, T, rotary_dim] (per-batch positions for left-padded prompts).
    """
    x_rot, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
    cos = cos[..., None, :]  # [..., T, 1, rot]
    sin = sin[..., None, :]
    x_rot = x_rot * cos + _rotate_half(x_rot) * sin
    return jnp.concatenate([x_rot, x_pass], axis=-1)


# ---------------------------------------------------------------- embedding
def embed_inputs(
    params: Params,
    config: EtudeDecoderConfig,
    input_ids: jnp.ndarray,       # [B, T] int32
    class_ids: jnp.ndarray,       # [B, T] int32
    attr_ids: Dict[str, jnp.ndarray],  # each [B, T] int32, keys ATTRIBUTE_ORDER
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Summed input embedding: word + class + projected attributes."""
    word = params["word_emb"][input_ids]
    return (word + embed_class_attrs(params, class_ids, attr_ids)).astype(
        compute_dtype
    )


def embed_class_attrs(
    params: Params,
    class_ids: jnp.ndarray,            # [B, T] int32
    attr_ids: Dict[str, jnp.ndarray],  # each [B, T] int32
) -> jnp.ndarray:
    """Class + projected-attribute part of the input embedding ([B, T, h]
    f32). Split out so generation loops can hoist it: class and attribute
    ids are constant across a bar's decode steps."""
    cls = params["class_emb"][class_ids]
    attrs = jnp.concatenate(
        [params["attr_emb"][name][attr_ids[name]] for name in ATTRIBUTE_ORDER],
        axis=-1,
    )
    return cls + attrs @ params["attr_proj"]["w"] + params["attr_proj"]["b"]


# ------------------------------------------------------------------ forward
def forward(
    params: Params,
    config: EtudeDecoderConfig,
    input_ids: jnp.ndarray,
    class_ids: jnp.ndarray,
    attr_ids: Dict[str, jnp.ndarray],
    attention_mask: Optional[jnp.ndarray] = None,  # [B, T] 1=valid
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
) -> jnp.ndarray:
    """Full-sequence forward (training / prefill-free path) → f32 logits.

    remat=True checkpoints each transformer layer: activations inside the
    layer are recomputed in the backward pass instead of saved — trades a
    second forward's FLOPs for O(L·B·T·H) less HBM, and keeps the SPMD
    partitioner off the per-layer residual stack (whose saved intermediates
    otherwise trigger involuntary rematerialization on sharded meshes).
    """
    B, T = input_ids.shape
    h = embed_inputs(params, config, input_ids, class_ids, attr_ids, compute_dtype)

    cos_t, sin_t = rotary_tables(config)
    cos, sin = cos_t[:T], sin_t[:T]

    # Additive attention bias [B, 1, T, T]: causal + padding.
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))
    mask = causal[None, None]
    if attention_mask is not None:
        mask = jnp.logical_and(mask, attention_mask[:, None, None, :].astype(bool))
    bias = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)

    n_heads, head_dim = config.num_attention_heads, config.head_dim
    eps = config.layer_norm_eps

    def layer_body(h, layer):
        x = h
        # --- attention branch (pre-LN) ---
        a_in = _layer_norm(x, layer["ln1"]["scale"], layer["ln1"]["bias"], eps)
        qkv = a_in @ layer["qkv"]["w"].astype(compute_dtype) + layer["qkv"]["b"].astype(compute_dtype)
        qkv = qkv.reshape(B, T, n_heads, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # Rotary in f32 for phase accuracy; QK matmul back in compute dtype
        # with f32 accumulation (f32 matmuls are several times slower on MXU).
        q = _apply_rotary(q.astype(jnp.float32), cos, sin, config.rotary_dim)
        k = _apply_rotary(k.astype(jnp.float32), cos, sin, config.rotary_dim)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q.astype(compute_dtype), k.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) / np.sqrt(head_dim)
        probs = jax.nn.softmax(scores + bias, axis=-1).astype(compute_dtype)
        # Two-step context-merge + output projection with an explicit [B,Q,h,d]
        # intermediate: the single fused 3-operand einsum forced the SPMD
        # partitioner into involuntary full rematerialization on batch-sharded
        # meshes (transpose of the [B,h,Q,d] dot output).
        w_o = layer["attn_out"]["w"].astype(compute_dtype).reshape(
            n_heads, head_dim, -1
        )
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        attn_out = jnp.einsum(
            "bqhd,hde->bqe", ctx, w_o
        ) + layer["attn_out"]["b"].astype(compute_dtype)
        # --- MLP branch (parallel residual, GPT-NeoX style) ---
        m_in = _layer_norm(x, layer["ln2"]["scale"], layer["ln2"]["bias"], eps)
        m = m_in @ layer["mlp_in"]["w"].astype(compute_dtype) + layer["mlp_in"]["b"].astype(compute_dtype)
        m = jax.nn.gelu(m, approximate=False)
        mlp_out = m @ layer["mlp_out"]["w"].astype(compute_dtype) + layer["mlp_out"]["b"].astype(compute_dtype)
        return x + attn_out + mlp_out, None

    body = jax.checkpoint(layer_body) if remat else layer_body
    h, _ = jax.lax.scan(body, h, params["layers"])

    h = _layer_norm(h, params["final_ln"]["scale"], params["final_ln"]["bias"], eps)
    logits = h.astype(jnp.float32) @ params["lm_head"].astype(jnp.float32)
    return logits


def loss_fn(
    params: Params,
    config: EtudeDecoderConfig,
    batch: Dict[str, jnp.ndarray],
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Mean cross-entropy over labels != -100 (reference loss semantics).

    Expects batch keys: input_ids, class_ids, labels, attention_mask, and
    {name}_bin_ids for each attribute.
    """
    attr_ids = {name: batch[f"{name}_bin_ids"] for name in ATTRIBUTE_ORDER}
    logits = forward(
        params, config,
        batch["input_ids"], batch["class_ids"], attr_ids,
        attention_mask=batch.get("attention_mask"),
        compute_dtype=compute_dtype,
        remat=remat,
    )
    labels = batch["labels"]
    valid = labels != -100
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.maximum(valid.sum(), 1)
    loss = -(token_ll * valid).sum() / n_valid
    metrics = {
        "loss": loss,
        "n_tokens": n_valid,
        "accuracy": ((jnp.argmax(logits, -1) == labels) & valid).sum() / n_valid,
    }
    return loss, metrics


# --------------------------------------------------------------- KV cache
def init_cache(
    config: EtudeDecoderConfig, batch: int, dtype=jnp.bfloat16,
    length: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Preallocated KV cache: [L, B, length, n_heads, head_dim] per k/v.

    `length` defaults to max_position_embeddings; generation sizes it to the
    prompt bucket + generation window so small-bucket bars pay proportionally
    less attention work per decode step."""
    shape = (
        config.num_hidden_layers,
        batch,
        length or config.max_position_embeddings,
        config.num_attention_heads,
        config.head_dim,
    )
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def forward_with_cache(
    params: Params,
    config: EtudeDecoderConfig,
    cache: Dict[str, jnp.ndarray],
    input_ids: jnp.ndarray,            # [B, S]
    class_ids: jnp.ndarray,            # [B, S]
    attr_ids: Dict[str, jnp.ndarray],  # [B, S]
    write_pos: jnp.ndarray,            # scalar int32: cache slot of token 0
    positions: jnp.ndarray,            # [B, S] logical positions (rotary)
    visible_from: jnp.ndarray,         # [B] first visible cache slot
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Forward over a chunk of S new tokens against a KV cache.

    Used for both prefill (S = padded prompt length, write_pos = 0) and
    single-token decode (S = 1, write_pos = current slot). Prompts are
    LEFT-padded so every batch element's last prompt token sits at the same
    slot: query at slot p attends to cache slots [visible_from[b], p], and
    `positions` carries per-element logical positions (0-based at the first
    real token) for rotary. Returns (f32 logits [B, S, V], updated cache).
    """
    B, S = input_ids.shape
    T_max = cache["k"].shape[2]
    n_heads, head_dim = config.num_attention_heads, config.head_dim
    eps = config.layer_norm_eps

    h = embed_inputs(params, config, input_ids, class_ids, attr_ids, compute_dtype)

    cos_t, sin_t = rotary_tables(config)
    cos = jnp.take(cos_t, positions, axis=0)  # [B, S, rot]
    sin = jnp.take(sin_t, positions, axis=0)

    # Attention bias [B, 1, S, T_max]: key slot t visible to query at slot
    # (write_pos + s) iff visible_from[b] <= t <= write_pos + s.
    key_slots = jnp.arange(T_max)[None, None, None, :]
    query_slots = (write_pos + jnp.arange(S))[None, None, :, None]
    visible = (key_slots <= query_slots) & (
        key_slots >= visible_from[:, None, None, None]
    )
    bias = jnp.where(visible, 0.0, -1e9).astype(jnp.float32)

    def layer_body(h, inputs):
        layer, k_cache, v_cache = inputs
        x = h
        a_in = _layer_norm(x, layer["ln1"]["scale"], layer["ln1"]["bias"], eps)
        qkv = a_in @ layer["qkv"]["w"].astype(compute_dtype) + layer["qkv"]["b"].astype(compute_dtype)
        qkv = qkv.reshape(B, S, n_heads, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _apply_rotary(q.astype(jnp.float32), cos, sin, config.rotary_dim)
        k = _apply_rotary(k.astype(jnp.float32), cos, sin, config.rotary_dim)

        # Insert new K/V into the cache at write_pos.
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype), (0, write_pos, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype), (0, write_pos, 0, 0)
        )

        scores = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q.astype(compute_dtype), k_cache.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) / np.sqrt(head_dim)
        probs = jax.nn.softmax(scores + bias, axis=-1).astype(compute_dtype)
        w_o = layer["attn_out"]["w"].astype(compute_dtype).reshape(
            n_heads, head_dim, -1
        )
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v_cache.astype(compute_dtype))
        attn_out = jnp.einsum(
            "bqhd,hde->bqe", ctx, w_o
        ) + layer["attn_out"]["b"].astype(compute_dtype)

        m_in = _layer_norm(x, layer["ln2"]["scale"], layer["ln2"]["bias"], eps)
        m = m_in @ layer["mlp_in"]["w"].astype(compute_dtype) + layer["mlp_in"]["b"].astype(compute_dtype)
        m = jax.nn.gelu(m, approximate=False)
        mlp_out = m @ layer["mlp_out"]["w"].astype(compute_dtype) + layer["mlp_out"]["b"].astype(compute_dtype)
        return x + attn_out + mlp_out, (k_cache, v_cache)

    # Unrolling the layer scan lets XLA fuse across layers in the
    # latency-bound single-token decode step (S == 1).
    unroll = config.num_hidden_layers if S == 1 else 1
    h, (new_k, new_v) = jax.lax.scan(
        layer_body, h, (params["layers"], cache["k"], cache["v"]), unroll=unroll
    )
    h = _layer_norm(h, params["final_ln"]["scale"], params["final_ln"]["bias"], eps)
    logits = h.astype(jnp.float32) @ params["lm_head"].astype(jnp.float32)
    return logits, {"k": new_k, "v": new_v}
