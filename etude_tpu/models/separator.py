"""In-graph source separation: gated (GLU) double-conv masking U-Net.

Replaces the reference's out-of-process separators (Spleeter in a dedicated
conda env / Demucs, launched as a subprocess writing .npy files —
infer.py:113-141, scripts/run_separation.py) with a JAX U-Net that runs in
the same XLA program as the rest of the Structuralize stage. Given a
magnitude spectrogram it predicts per-stem ratio masks (5 stems: vocals,
drums, bass, piano, other — the Spleeter stem contract) that sum to one
across stems per TF bin.

TPU-first design:
  * a single shared encoder + one decoder head emitting all stems (instead
    of Spleeter's five independent U-Nets); NHWC convs on the MXU, bf16;
  * each stage is a stride-2 conv + a refining conv, both GLU-gated (the
    Demucs gating recipe) — double the receptive-field growth per param of
    a single plain conv;
  * the model operates on the ≤ fmax band (`freq_bins` spectrogram rows):
    every downstream consumer reads 30–11000 Hz mel features, and the slaney
    filterbank carries ZERO weight above that band, so bins beyond it get a
    uniform 1/num_stems mask instead of model capacity;
  * the downstream beat features are computed directly from the masked power
    spectrogram (no iSTFT → STFT round trip).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

STEM_NAMES = ("vocals", "drums", "bass", "piano", "other")


@dataclasses.dataclass(frozen=True)
class SeparatorConfig:
    num_stems: int = 5
    base_channels: int = 24
    depth: int = 5            # number of stride-2 encoder stages
    kernel: int = 5
    freq_bins: int = 1024     # model band (bins ≥ mel fmax get uniform masks)
    channel_cap: int = 192    # growth 2x per stage, capped


def _stage_channels(config: SeparatorConfig) -> List[int]:
    return [
        min(config.base_channels * (2 ** i), config.channel_cap)
        for i in range(config.depth)
    ]


def init_params(config: SeparatorConfig, seed: int = 0, std: float = 0.02) -> Params:
    rng = np.random.default_rng(seed)
    k = config.kernel

    def conv(ci, co, norm=True):
        p = {"w": rng.normal(0.0, std, size=(k, k, ci, co)).astype(np.float32),
             "b": np.zeros(co, np.float32)}
        if norm:
            # GroupNorm over the conv output (pre-GLU): without it the net
            # settles into static per-stem spectral-profile masks and stops
            # learning input-dependent routing.
            p["gn_scale"] = np.ones(co, np.float32)
            p["gn_bias"] = np.zeros(co, np.float32)
        return p

    chans = _stage_channels(config)
    enc, dec = [], []
    ch = 1
    for co in chans:
        # GLU convs emit 2*co channels (value + gate halves).
        enc.append({"down": conv(ch, 2 * co), "ref": conv(co, 2 * co)})
        ch = co
    for i in reversed(range(config.depth)):
        co = chans[i - 1] if i > 0 else config.base_channels
        skip_ch = chans[i - 1] if i > 0 else 1
        dec.append({
            "up": conv(ch, 2 * ch),
            "merge": conv(ch + skip_ch, 2 * co),
        })
        ch = co
    params = {
        "enc": enc,
        "dec": dec,
        "mask_head": conv(ch, config.num_stems, norm=False),
    }
    return jax.tree.map(jnp.asarray, params)


def _conv(h, p, stride=1, dtype=jnp.bfloat16, groups: int = 8):
    k = p["w"].shape[0]
    pad = k // 2
    out = jax.lax.conv_general_dilated(
        h, p["w"].astype(dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(dtype)
    if "gn_scale" in p:
        B, T, F, C = out.shape
        # Largest divisor of C that is <= groups: non-default channel widths
        # (e.g. C=12, groups=8) would otherwise fail the reshape below.
        g = next(d for d in range(min(groups, C), 0, -1) if C % d == 0)
        x = out.astype(jnp.float32).reshape(B, T, F, g, C // g)
        mean = x.mean(axis=(1, 2, 4), keepdims=True)
        var = x.var(axis=(1, 2, 4), keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        out = (
            x.reshape(B, T, F, C) * p["gn_scale"] + p["gn_bias"]
        ).astype(dtype)
    return out


def _glu(h):
    a, b = jnp.split(h, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def _upsample2(h):
    B, T, F, C = h.shape
    h = jnp.broadcast_to(h[:, :, None, :, None, :], (B, T, 2, F, 2, C))
    return h.reshape(B, 2 * T, 2 * F, C)


def forward(
    params: Params,
    config: SeparatorConfig,
    mag: jnp.ndarray,           # [B, T, F] magnitude (or log-magnitude)
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Returns per-stem ratio masks [B, num_stems, T, F] (softmax over stems).

    The U-Net sees only the first min(F, freq_bins) spectrogram rows; rows
    above the band come back as uniform 1/num_stems masks (they carry no
    weight in the downstream ≤ fmax mel filterbank).
    """
    B, T, F = mag.shape
    band = min(F, config.freq_bins)
    mult = 2 ** config.depth
    pad_t = (-T) % mult
    pad_f = (-band) % mult
    h = jnp.pad(mag[:, :, :band], ((0, 0), (0, pad_t), (0, pad_f)))[
        ..., None
    ].astype(compute_dtype)

    skips = []
    for p in params["enc"]:
        skips.append(h)
        h = _glu(_conv(h, p["down"], stride=2, dtype=compute_dtype))
        h = _glu(_conv(h, p["ref"], dtype=compute_dtype))

    for p, skip in zip(params["dec"], reversed(skips)):
        h = _upsample2(h)
        h = _glu(_conv(h, p["up"], dtype=compute_dtype))
        h = jnp.concatenate([h, skip], axis=-1)
        h = _glu(_conv(h, p["merge"], dtype=compute_dtype))

    logits = _conv(h, params["mask_head"], dtype=compute_dtype).astype(jnp.float32)
    masks = jax.nn.softmax(logits, axis=-1)  # ratio masks across stems
    masks = jnp.transpose(masks, (0, 3, 1, 2))[:, :, :T, :band]
    if band < F:
        uniform = jnp.full(
            (B, config.num_stems, T, F - band), 1.0 / config.num_stems,
            masks.dtype,
        )
        masks = jnp.concatenate([masks, uniform], axis=-1)
    return masks


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ------------------------------------------------------------------ training
def loss_fn(
    params: Params,
    config: SeparatorConfig,
    batch: Dict[str, jnp.ndarray],
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Masking objective: L1 between mask-applied mixture magnitude and each
    stem's target magnitude (the Spleeter training recipe), over the model
    band only (bins above it are not the model's responsibility).

    batch: mix_mag [B, T, F]; stem_mags [B, num_stems, T, F].
    """
    band = min(batch["mix_mag"].shape[-1], config.freq_bins)
    mix = batch["mix_mag"][..., :band]
    stems = batch["stem_mags"][..., :band]
    masks = forward(params, config, jnp.log1p(mix), compute_dtype)
    est = masks * mix[:, None]
    return jnp.mean(jnp.abs(est - stems))
