"""hFT-style automatic music transcription model (the Extract stage's core).

Capability parity with the reference's hierarchical frequency-time
transcription model (etude/models/amt_apc.py, itself from Sony's
hFT-Transformer): a conv+linear token embedding over per-frame spectrogram
windows, a self-attention encoder over the 256 frequency bins, a decoder that
cross-attends 88 note queries to the frequency axis ("CAfreq") producing
first-stage heads, then self-attends over the time axis ("SAtime") producing
refined second-stage heads. Heads: onset/offset/frame(MPE) sigmoids and a
128-way velocity classifier, per (frame, note).

TPU-first design:
  * pure params-pytree model; repeated layers stacked along [L] and run with
    `lax.scan` (one compiled layer body);
  * the window-conv → flatten → token-embedding chain is linear end to end,
    so it is folded into a single 1 x n_proc convolution with H output
    features (no windowing gather, no [B,T,nbin,C*n_out] im2col blowup);
  * whole songs are processed as one batched [segments, ...] forward instead
    of the reference's serial batch-1 loop (etude/data/extractor.py:227).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class AMTConfig:
    n_margin: int = 32
    n_frame: int = 512           # frames per segment (128 for the HFT preset)
    n_bin: int = 256
    cnn_channel: int = 4
    cnn_kernel: int = 5
    hid_dim: int = 256
    encoder_n_layer: int = 3
    encoder_n_head: int = 4
    decoder_n_layer: int = 3
    decoder_n_head: int = 4
    pf_dim: int = 512
    n_note: int = 88
    n_velocity: int = 128

    @property
    def n_proc(self) -> int:
        return 2 * self.n_margin + 1

    @property
    def conv_out(self) -> int:
        return self.n_proc - (self.cnn_kernel - 1)

    @property
    def cnn_dim(self) -> int:
        return self.cnn_channel * self.conv_out


# ---------------------------------------------------------------------- init
def init_params(config: AMTConfig, seed: int = 0, std: float = 0.02) -> Params:
    rng = np.random.default_rng(seed)
    H, P = config.hid_dim, config.pf_dim

    def normal(*shape):
        return rng.normal(0.0, std, size=shape).astype(np.float32)

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    def ones(*shape):
        return np.ones(shape, np.float32)

    def attn(n):
        return {
            "q": {"w": normal(n, H, H), "b": zeros(n, H)},
            "k": {"w": normal(n, H, H), "b": zeros(n, H)},
            "v": {"w": normal(n, H, H), "b": zeros(n, H)},
            "o": {"w": normal(n, H, H), "b": zeros(n, H)},
        }

    def ff(n):
        return {
            "in": {"w": normal(n, H, P), "b": zeros(n, P)},
            "out": {"w": normal(n, P, H), "b": zeros(n, H)},
        }

    def lns(n, count):
        return [{"scale": ones(n, H), "bias": zeros(n, H)} for _ in range(count)]

    def enc_stack(n):
        ln = lns(n, 2)
        return {"attn": attn(n), "ff": ff(n), "ln1": ln[0], "ln2": ln[1]}

    n_enc = config.encoder_n_layer
    n_dec = config.decoder_n_layer - 1  # layer_zero is separate
    head = lambda out: {"w": normal(H, out), "b": zeros(out)}  # noqa: E731

    params = {
        "conv": {
            "w": normal(config.cnn_channel, config.cnn_kernel),
            "b": zeros(config.cnn_channel),
        },
        "tok_emb": {"w": normal(config.cnn_dim, H), "b": zeros(H)},
        "freq_pos_emb": normal(config.n_bin, H),
        "enc_layers": enc_stack(n_enc),
        "note_query": normal(config.n_note, H),
        "dec_zero": {
            "cross": attn(1), "ff": ff(1), "ln1": lns(1, 2)[0], "ln2": lns(1, 2)[1]
        },
        "dec_layers": {
            "self": attn(n_dec), "cross": attn(n_dec), "ff": ff(n_dec),
            "ln1": lns(n_dec, 3)[0], "ln2": lns(n_dec, 3)[1], "ln3": lns(n_dec, 3)[2],
        },
        "heads_freq": {
            "onset": head(1), "offset": head(1), "mpe": head(1),
            "velocity": head(config.n_velocity),
        },
        "time_pos_emb": normal(config.n_frame, H),
        "time_layers": enc_stack(config.decoder_n_layer),
        "heads_time": {
            "onset": head(1), "offset": head(1), "mpe": head(1),
            "velocity": head(config.n_velocity),
        },
    }
    return jax.tree.map(jnp.asarray, params)


# ----------------------------------------------------------------- building
def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(
        x.dtype
    )


def _mha(q_in, kv_in, p, n_heads, dtype):
    """Multi-head attention (softmax in f32, matmuls in `dtype`)."""
    *lead, Lq, H = q_in.shape
    Lk = kv_in.shape[-2]
    d = H // n_heads

    def proj(x, w):
        return x @ w["w"].astype(dtype) + w["b"].astype(dtype)

    q = proj(q_in, p["q"]).reshape(*lead, Lq, n_heads, d)
    k = proj(kv_in, p["k"]).reshape(*lead, Lk, n_heads, d)
    v = proj(kv_in, p["v"]).reshape(*lead, Lk, n_heads, d)
    scores = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32)
    probs = jax.nn.softmax(scores / np.sqrt(d), axis=-1).astype(dtype)
    ctx = jnp.einsum("...hqk,...khd->...qhd", probs, v).reshape(*lead, Lq, H)
    return proj(ctx, p["o"])


def _ffwd(x, p, dtype):
    h = jax.nn.relu(x @ p["in"]["w"].astype(dtype) + p["in"]["b"].astype(dtype))
    return h @ p["out"]["w"].astype(dtype) + p["out"]["b"].astype(dtype)


def _enc_layer(x, layer, n_heads, dtype):
    """Post-LN self-attention encoder layer."""
    x = _ln(x + _mha(x, x, layer["attn"], n_heads, dtype), layer["ln1"])
    x = _ln(x + _ffwd(x, layer["ff"], dtype), layer["ln2"])
    return x


def forward(
    params: Params,
    config: AMTConfig,
    spec: jnp.ndarray,            # [B, n_bin, n_margin + n_frame + n_margin]
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Returns both head sets:
    {onset,offset,mpe}_{freq,time}: [B, n_frame, n_note] sigmoids,
    velocity_{freq,time}: [B, n_frame, n_note, n_velocity] logits.

    remat=True checkpoints every transformer layer body (training only): the
    per-layer attention/FF intermediates over B*T frequency rows and B*88
    time rows dominate HBM in the backward pass — without remat a batch-4
    512-frame training step wants ~50 GB.
    """
    ckpt = jax.checkpoint if remat else (lambda f: f)
    B = spec.shape[0]
    T, nbin, H = config.n_frame, config.n_bin, config.hid_dim
    C, K, n_out = config.cnn_channel, config.cnn_kernel, config.conv_out
    n_proc = config.n_proc
    dtype = compute_dtype

    # Fused spectral front-end. The reference chain — window conv (1 x K,
    # C channels) over per-frame spectral windows, flatten to C*n_out, then
    # the token-embedding linear (amt_apc.py:65-110) — is linear end to end,
    # so it collapses into ONE 1 x n_proc convolution with H output features:
    #   x[b,τ,f,h] = Σ_u spec[b,f,τ+u] · Wf[u,h] + bf[h]
    #   Wf[u,h]    = Σ_c Σ_{t+o=u} kern[c,t] · W_emb[(c,o),h]
    # This removes the [B,T,nbin,n_proc] windowing gather and the
    # [B,T,nbin,C*n_out] feature materialization (~0.5 GB per segment batch
    # under TPU tiling) and halves the front-end matmul FLOPs. Wf is tiny
    # (n_proc x H) and folded in f32 each call.
    kern = params["conv"]["w"].astype(jnp.float32)                 # [C, K]
    w_emb = params["tok_emb"]["w"].astype(jnp.float32).reshape(C, n_out, H)
    wf = jnp.zeros((n_proc, H), jnp.float32)
    for t in range(K):
        wf = wf.at[t:t + n_out].add(
            jnp.einsum("c,coh->oh", kern[:, t], w_emb)
        )
    bias_f = (
        jnp.einsum("c,coh->h", params["conv"]["b"].astype(jnp.float32), w_emb)
        + params["tok_emb"]["b"].astype(jnp.float32)
    )
    # [B, 1, nbin, T + n_proc - 1] ⊛ [H, 1, 1, n_proc] → [B, H, nbin, T].
    x = jax.lax.conv_general_dilated(
        spec[:, None].astype(dtype),
        jnp.transpose(wf, (1, 0))[:, None, None, :].astype(dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    x = jnp.transpose(x, (0, 3, 2, 1)).astype(dtype) + bias_f.astype(dtype)
    x = x * np.sqrt(H) + params["freq_pos_emb"].astype(dtype)[None, None]

    # Frequency self-attention encoder over the bin axis.
    x = x.reshape(B * T, nbin, H)

    def enc_body(h, layer):
        return _enc_layer(h, layer, config.encoder_n_head, dtype), None

    x, _ = jax.lax.scan(ckpt(enc_body), x, params["enc_layers"])
    enc = x  # [B*T, n_bin, H]

    # --- CAfreq: 88 note queries cross-attend to the frequency axis ------
    q = jnp.broadcast_to(
        params["note_query"].astype(dtype)[None], (B * T, config.n_note, H)
    )
    z = params["dec_zero"]
    zero = jax.tree.map(lambda a: a[0], {"cross": z["cross"], "ff": z["ff"],
                                         "ln1": z["ln1"], "ln2": z["ln2"]})
    q = _ln(q + _mha(q, enc, zero["cross"], config.decoder_n_head, dtype), zero["ln1"])
    q = _ln(q + _ffwd(q, zero["ff"], dtype), zero["ln2"])

    def dec_body(h, layer):
        h = _ln(h + _mha(h, h, layer["self"], config.decoder_n_head, dtype),
                layer["ln1"])
        h = _ln(h + _mha(h, enc, layer["cross"], config.decoder_n_head, dtype),
                layer["ln2"])
        h = _ln(h + _ffwd(h, layer["ff"], dtype), layer["ln3"])
        return h, None

    q, _ = jax.lax.scan(ckpt(dec_body), q, params["dec_layers"])
    midi_freq = q  # [B*T, n_note, H]

    def apply_heads(h, heads, lead_shape):
        hf = h.astype(jnp.float32)
        out = {}
        for name in ("onset", "offset", "mpe"):
            w = heads[name]
            out[name] = jax.nn.sigmoid(
                (hf @ w["w"] + w["b"])[..., 0].reshape(lead_shape)
            )
        w = heads["velocity"]
        out["velocity"] = (hf @ w["w"] + w["b"]).reshape(
            *lead_shape, config.n_velocity
        )
        return out

    heads_a = apply_heads(midi_freq, params["heads_freq"], (B, T, config.n_note))

    # --- SAtime: per-note self-attention over the time axis --------------
    y = midi_freq.reshape(B, T, config.n_note, H)
    y = jnp.transpose(y, (0, 2, 1, 3)).reshape(B * config.n_note, T, H)
    y = y * np.sqrt(H) + params["time_pos_emb"].astype(dtype)[None, :T]

    def time_body(h, layer):
        return _enc_layer(h, layer, config.decoder_n_head, dtype), None

    y, _ = jax.lax.scan(ckpt(time_body), y, params["time_layers"])

    y_btn = jnp.transpose(
        y.reshape(B, config.n_note, T, H), (0, 2, 1, 3)
    )  # [B, T, n_note, H]
    heads_b = apply_heads(
        y_btn.reshape(B * T, config.n_note, H), params["heads_time"],
        (B, T, config.n_note),
    )

    return {
        "onset_freq": heads_a["onset"], "offset_freq": heads_a["offset"],
        "mpe_freq": heads_a["mpe"], "velocity_freq": heads_a["velocity"],
        "onset_time": heads_b["onset"], "offset_time": heads_b["offset"],
        "mpe_time": heads_b["mpe"], "velocity_time": heads_b["velocity"],
    }


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ------------------------------------------------------------------ training
def loss_fn(
    params: Params,
    config: AMTConfig,
    batch: Dict[str, jnp.ndarray],
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    pos_weights: Optional[Dict[str, float]] = None,
    head_scales: Optional[Dict[str, float]] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """hFT training objective: binary cross-entropy on the onset/offset/MPE
    heads plus cross-entropy on the 128-way velocity classifier, summed over
    BOTH branches (the time branch refines the freq branch, so both are
    supervised — hFT-Transformer recipe).

    batch: spec [B, n_bin, margin+T+margin]; targets onset/offset/mpe
    [B, T, n_note] in [0,1]; velocity [B, T, n_note] int labels.

    pos_weights: optional positive-class BCE weights per head ("onset",
    "offset", "mpe"). Onset targets are ~0.05% positive; on small corpora /
    short runs, unweighted BCE collapses to the all-zeros solution before
    any onset signal emerges. Values may be Python floats or traced scalars
    (annealing schedules pass them through the batch) — a weight that ends
    at 1.0 leaves the final model CALIBRATED for the reference's 0.5
    peak-picking threshold. Default None = reference (unweighted) loss.

    "velocity" / "velocity_silent" weight the velocity CE at sounding vs
    silent cells. velocity_silent=0 confines the CE to sounding cells: the
    argmax at onset peaks (the only cells the picker reads,
    ops/peakpick.py:145) then carries a real velocity instead of the
    majority silence class, which the ignore_zero policy would drop.

    head_scales: per-head multipliers on the LOSS TERMS (both classes —
    unlike pos_weights this preserves each head's calibrated optimum while
    changing its gradient share on the shared trunk). The velocity CE's
    natural scale (~ln 128 per branch) otherwise out-weighs a converged
    onset BCE (~0.02) by 2-3 orders of magnitude, and the trunk learns
    sustained-note features instead of onset transients.
    """
    out = forward(params, config, batch["spec"], compute_dtype, remat=remat)
    pos_weights = pos_weights or {}
    head_scales = head_scales or {}

    def bce(pred, target, pos_w):
        pred = jnp.clip(pred, 1e-7, 1 - 1e-7)
        return -jnp.mean(
            pos_w * target * jnp.log(pred) + (1 - target) * jnp.log(1 - pred)
        )

    loss = 0.0
    metrics: Dict[str, jnp.ndarray] = {}
    for branch in ("freq", "time"):
        for head in ("onset", "offset", "mpe"):
            l = bce(out[f"{head}_{branch}"], batch[head],
                    pos_weights.get(head, 1.0))
            metrics[f"{head}_{branch}_bce"] = l
            loss = loss + head_scales.get(head, 1.0) * l
        logits = out[f"velocity_{branch}"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        vel_ll = jnp.take_along_axis(
            logp, batch["velocity"][..., None], axis=-1
        )[..., 0]
        vw = pos_weights.get("velocity", 1.0)
        sw = pos_weights.get("velocity_silent", 1.0)
        w = jnp.where(batch["velocity"] > 0, vw, sw)
        l = -(vel_ll * w).sum() / jnp.maximum(w.sum(), 1e-6)
        metrics[f"velocity_{branch}_ce"] = l
        loss = loss + head_scales.get("velocity", 1.0) * l
    metrics["loss"] = loss
    return loss, metrics
