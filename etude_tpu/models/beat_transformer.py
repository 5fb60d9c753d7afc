"""Demixed dilated-transformer beat/downbeat activation model.

Capability parity with the reference Beat-Transformer (etude/models/
beat_transformer.py): a 3-stage conv/maxpool front-end collapsing 128 mel
bins to a dmodel-channel sequence per stem, 9 pre-LN dilated-attention layers
over time (dilation 2^layer) with standard instrument-axis attention layers
interleaved at depths 3-5, a (beat, downbeat) activation head averaged over
the 5 stems, and an auxiliary 300-class tempo head fed by the summed
attention-branch skips.

TPU-first: functional params pytree; the conv front-end uses
lax.conv_general_dilated / reduce_window; dilated attention is the gather-
based op in ops/dilated_attention.py (no pad+roll+stack); layers are
explicit (dilation differs per layer, and instrument attention interleaves,
so a python loop over 9 layers is traced once into a single XLA program).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dilated_attention import dilated_attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BeatTransformerConfig:
    attn_len: int = 5
    instr: int = 5
    ntoken: int = 2
    dmodel: int = 256
    nhead: int = 8
    d_hid: int = 1024
    nlayers: int = 9
    mel_bins: int = 128
    n_tempi: int = 300
    # Instrument-axis attention is interleaved at these layer indices.
    instr_layers: Tuple[int, ...] = (3, 4, 5)
    # Reproduce the reference's head-7 key-slice training bug
    # (dilated_transformer_layer.py:52) — required for exact parity when
    # running ported reference checkpoints, off for from-scratch training.
    compat_head7_bug: bool = False


def init_params(config: BeatTransformerConfig, seed: int = 0, std: float = 0.02) -> Params:
    rng = np.random.default_rng(seed)
    D, Hid = config.dmodel, config.d_hid

    def normal(*shape):
        return rng.normal(0.0, std, size=shape).astype(np.float32)

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    def ones(*shape):
        return np.ones(shape, np.float32)

    def linear(i, o):
        return {"w": normal(i, o), "b": zeros(o)}

    def ln():
        return {"scale": ones(D), "bias": zeros(D)}

    layers = []
    for idx in range(config.nlayers):
        layer = {
            "q": linear(D, D), "k": linear(D, D), "v": linear(D, D),
            "er": normal(config.nhead, D // config.nhead, config.attn_len),
            "ff1": linear(D, Hid), "ff2": linear(Hid, D),
            "ln1": ln(), "ln2": ln(),
        }
        if idx in config.instr_layers:
            layer["instr"] = {
                "q": linear(D, D), "k": linear(D, D), "v": linear(D, D),
                "o": linear(D, D),
                "ff1": linear(D, Hid), "ff2": linear(Hid, D),
                "ln1": ln(), "ln2": ln(),
            }
        layers.append(layer)

    params = {
        # Conv front-end: (5,3)x32 → pool3 → (1,12)x64 → pool3 → (3,6)xD → pool3.
        "conv1": {"w": normal(5, 3, 1, 32), "b": zeros(32)},
        "conv2": {"w": normal(1, 12, 32, 64), "b": zeros(64)},
        "conv3": {"w": normal(3, 6, 64, D), "b": zeros(D)},
        "layers": layers,
        "out": linear(D, config.ntoken),
        "out_tempo": linear(D, config.n_tempi),
    }
    return jax.tree.map(jnp.asarray, params)


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(
        x.dtype
    )


def _lin(x, p, dtype):
    return x @ p["w"].astype(dtype) + p["b"].astype(dtype)


def _conv_frontend(params, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """[N, T, mel] → [N, T, dmodel] (NHWC convs + width max-pools + relu)."""
    h = x[..., None]  # [N, T, mel, 1]

    def conv(h, p, pad_h):
        return jax.lax.conv_general_dilated(
            h, p["w"].astype(dtype),
            window_strides=(1, 1),
            padding=((pad_h, pad_h), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"].astype(dtype)

    def pool3(h):
        return jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 1, 3, 1), window_strides=(1, 1, 3, 1),
            padding="VALID",
        )

    h = jax.nn.relu(pool3(conv(h, params["conv1"], pad_h=2)))   # mel 126→42
    h = jax.nn.relu(pool3(conv(h, params["conv2"], pad_h=0)))   # 31→10
    h = jax.nn.relu(pool3(conv(h, params["conv3"], pad_h=1)))   # 5→1
    return h[:, :, 0, :]  # [N, T, D]


def forward(
    params: Params,
    config: BeatTransformerConfig,
    x: jnp.ndarray,            # [B, instr, T, mel_bins]
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (activation logits [B, T, ntoken], tempo logits [B, n_tempi])."""
    B, instr, T, mel = x.shape
    D, H = config.dmodel, config.nhead
    d = D // H
    dtype = compute_dtype

    h = _conv_frontend(params, x.reshape(B * instr, T, mel).astype(dtype), dtype)

    skips = []
    for idx, layer in enumerate(params["layers"]):
        # --- dilated time attention (pre-LN) -------------------------
        a_in = _ln(h, layer["ln1"])
        q = _lin(a_in, layer["q"], dtype).reshape(-1, T, H, d).transpose(0, 2, 1, 3)
        k = _lin(a_in, layer["k"], dtype).reshape(-1, T, H, d).transpose(0, 2, 1, 3)
        v = _lin(a_in, layer["v"], dtype).reshape(-1, T, H, d).transpose(0, 2, 1, 3)
        attn = dilated_attention(q, k, v, layer["er"].astype(dtype), 2 ** idx,
                                 head7_bug=config.compat_head7_bug)
        sa = attn.transpose(0, 2, 1, 3).reshape(-1, T, D)
        h = h + sa
        ff = _lin(jax.nn.gelu(_lin(_ln(h, layer["ln2"]), layer["ff1"], dtype),
                              approximate=False), layer["ff2"], dtype)
        h = h + ff
        # Tempo-branch skip: the attention output, averaged over stems.
        skips.append(sa.reshape(B, instr, T, D).mean(axis=1))

        # --- instrument attention at layers 3-5 ----------------------
        if idx in config.instr_layers:
            p = layer["instr"]
            hi = h.reshape(B, instr, T, D).transpose(0, 2, 1, 3).reshape(-1, instr, D)
            a_in = _ln(hi, p["ln1"])
            qi = _lin(a_in, p["q"], dtype).reshape(-1, instr, H, d).transpose(0, 2, 1, 3)
            ki = _lin(a_in, p["k"], dtype).reshape(-1, instr, H, d).transpose(0, 2, 1, 3)
            vi = _lin(a_in, p["v"], dtype).reshape(-1, instr, H, d).transpose(0, 2, 1, 3)
            scores = jnp.einsum("nhqd,nhkd->nhqk", qi, ki).astype(jnp.float32)
            probs = jax.nn.softmax(scores / np.sqrt(d), axis=-1).astype(dtype)
            ctx = jnp.einsum("nhqk,nhkd->nhqd", probs, vi)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(-1, instr, D)
            hi = hi + _lin(ctx, p["o"], dtype)
            ffi = _lin(jax.nn.relu(_lin(_ln(hi, p["ln2"]), p["ff1"], dtype)),
                       p["ff2"], dtype)
            hi = hi + ffi
            h = hi.reshape(B, T, instr, D).transpose(0, 2, 1, 3).reshape(-1, T, D)

    h = jax.nn.relu(h).reshape(B, instr, T, D).mean(axis=1)
    act = _lin(h.astype(jnp.float32), jax.tree.map(lambda a: a.astype(jnp.float32),
                                                   params["out"]), jnp.float32)

    t = jax.nn.relu(sum(skips)).mean(axis=1)  # [B, D]
    tempo = _lin(t.astype(jnp.float32),
                 jax.tree.map(lambda a: a.astype(jnp.float32), params["out_tempo"]),
                 jnp.float32)
    return act, tempo


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ------------------------------------------------------------------ training
def loss_fn(
    params: Params,
    config: BeatTransformerConfig,
    batch: Dict[str, jnp.ndarray],
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Beat-Transformer objective: BCE on the (beat, downbeat) activation
    logits plus cross-entropy on the auxiliary tempo head.

    batch: x [B, instr, T, mel]; activations [B, T, 2] in [0,1];
    tempo [B] int class labels (< n_tempi); optional mask [B, T].
    """
    act_logits, tempo_logits = forward(params, config, batch["x"], compute_dtype)

    mask = batch.get("mask")
    target = batch["activations"]
    logp = jax.nn.log_sigmoid(act_logits)
    log1mp = jax.nn.log_sigmoid(-act_logits)
    bce = -(target * logp + (1 - target) * log1mp)  # [B, T, 2]
    if mask is not None:
        bce = bce * mask[..., None]
        denom = jnp.maximum(mask.sum() * 2, 1)
        act_loss = bce.sum() / denom
    else:
        act_loss = bce.mean()

    tempo_logp = jax.nn.log_softmax(tempo_logits, axis=-1)
    tempo_loss = -jnp.mean(
        jnp.take_along_axis(tempo_logp, batch["tempo"][:, None], axis=-1)
    )
    loss = act_loss + tempo_loss
    return loss, {"loss": loss, "act_bce": act_loss, "tempo_ce": tempo_loss}
