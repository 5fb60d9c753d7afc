"""In-graph source separation: spectrogram-masking U-Net.

Replaces the reference's out-of-process separators (Spleeter in a dedicated
conda env / Demucs, launched as a subprocess writing .npy files —
infer.py:113-141, scripts/run_separation.py) with a JAX U-Net that runs in
the same XLA program as the rest of the Structuralize stage. Given a
magnitude spectrogram it predicts per-stem ratio masks (5 stems: vocals,
drums, bass, piano, other — the Spleeter stem contract) that sum to one
across stems per TF bin.

TPU-first: a single shared encoder + one decoder head emitting all stems
(instead of Spleeter's five independent U-Nets), NHWC convs with
stride-2 down/up sampling, bf16 compute. The downstream beat features are
computed directly from the masked power spectrogram (no iSTFT → STFT round
trip).
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
    depth: int = 4            # number of stride-2 encoder stages
    kernel: int = 5
    freq_bins: int = 2048     # input F padded/cropped to this (n_fft//2)


def init_params(config: SeparatorConfig, seed: int = 0, std: float = 0.02) -> Params:
    rng = np.random.default_rng(seed)
    k = config.kernel

    def normal(*shape):
        return rng.normal(0.0, std, size=shape).astype(np.float32)

    def conv(ci, co):
        return {"w": normal(k, k, ci, co), "b": np.zeros(co, np.float32)}

    enc, dec = [], []
    ch = 1
    chans: List[int] = []
    for i in range(config.depth):
        co = config.base_channels * (2 ** i)
        enc.append(conv(ch, co))
        chans.append(co)
        ch = co
    for i in reversed(range(config.depth)):
        co = chans[i - 1] if i > 0 else config.base_channels
        # Input: upsampled features + skip connection.
        ci = ch + (chans[i - 1] if i > 0 else 1)
        dec.append({"up": conv(ch, ch), "merge": conv(ci, co)})
        ch = co
    params = {
        "enc": enc,
        "dec": dec,
        "mask_head": conv(ch, config.num_stems),
    }
    return jax.tree.map(jnp.asarray, params)


def _conv(h, p, stride=1, dtype=jnp.bfloat16):
    k = p["w"].shape[0]
    pad = k // 2
    return jax.lax.conv_general_dilated(
        h, p["w"].astype(dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(dtype)


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
    """Returns per-stem ratio masks [B, num_stems, T, F] (softmax over stems)."""
    B, T, F = mag.shape
    mult = 2 ** config.depth
    pad_t = (-T) % mult
    pad_f = (-F) % mult
    h = jnp.pad(mag, ((0, 0), (0, pad_t), (0, pad_f)))[..., None].astype(compute_dtype)
    x0 = h

    skips = []
    for p in params["enc"]:
        skips.append(h)
        h = jax.nn.leaky_relu(_conv(h, p, stride=2, dtype=compute_dtype), 0.2)

    for p, skip in zip(params["dec"], reversed(skips)):
        h = _upsample2(h)
        h = jax.nn.leaky_relu(_conv(h, p["up"], dtype=compute_dtype), 0.2)
        h = jnp.concatenate([h, skip], axis=-1)
        h = jax.nn.leaky_relu(_conv(h, p["merge"], dtype=compute_dtype), 0.2)

    logits = _conv(h, params["mask_head"], dtype=compute_dtype).astype(jnp.float32)
    masks = jax.nn.softmax(logits, axis=-1)  # ratio masks across stems
    masks = jnp.transpose(masks, (0, 3, 1, 2))  # [B, S, T(+pad), F(+pad)]
    return masks[:, :, :T, :F]


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
    stem's target magnitude (the Spleeter training recipe).

    batch: mix_mag [B, T, F]; stem_mags [B, num_stems, T, F].
    """
    masks = forward(params, config, jnp.log1p(batch["mix_mag"]), compute_dtype)
    est = masks * batch["mix_mag"][:, None]
    return jnp.mean(jnp.abs(est - batch["stem_mags"]))
