"""Fused single-pass decode attention (S=1) as a Pallas TPU kernel.

The streaming generation engine's decode step is HBM-bound on the KV cache
read (reference hot loop: etude/models/etude_decoder.py:299-343; our
redesign: models/generate_stream.py). The XLA formulation reads K for the
score matvec and V for the context matvec as two separate passes with an
f32 softmax materialized between them; this kernel fuses the whole
read→softmax→read chain so each KV byte is streamed HBM→VMEM exactly once
per step and the probabilities never leave VMEM.

Toolchain constraint: this stack's Mosaic compiler rejects BATCHED dots
inside Pallas kernels (MLIR `tpu.dot_dimension_numbers` parse error — see
ops/dilated_attention.py). Every dot here is strictly 2-D: the grid runs
over (B·H) flattened query heads, and each grid point computes

    s[1, C] = q[1, D] · K[D, C]          (MXU matvec)
    p       = softmax(s/sqrt(D) + bias)  (VPU, in VMEM)
    o[1, D] = p[1, C] · V[D, C]ᵀ         (MXU matvec, contracting C)

Block shapes keep C in the lane dimension (matching the stream cache's
slot-minor layout — models/generate_stream.py init_stream_cache, since
round 4 a fused [.., 2D, C] K+V buffer), so the stream is dense in the
long axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    # Blocks: q (1,1,D), k (1,D,C), v (1,D,C), bias (1,1,C), o (1,1,D).
    D = q_ref.shape[-1]
    q = q_ref[0].astype(jnp.bfloat16)                      # [1, D]
    k = k_ref[0]                                           # [D, C]
    s = jnp.dot(q, k, preferred_element_type=jnp.float32)  # [1, C]
    s = s * (1.0 / np.sqrt(D)) + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [1, D]
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_pallas(
    q: jnp.ndarray,      # [B, 1, H, D] (any float dtype)
    k: jnp.ndarray,      # [B, H, D, C] bf16
    v: jnp.ndarray,      # [B, H, D, C] bf16
    bias: jnp.ndarray,   # [B, 1, 1, C] f32 additive visibility bias
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns ctx [B, 1, H, D] matching the XLA two-einsum formulation
    (f32 softmax, bf16 probability/context contraction)."""
    B, _, H, D = q.shape
    C = k.shape[-1]
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, 1, D)
    kf = k.reshape(B * H, D, C)
    vf = v.reshape(B * H, D, C)
    bf = bias.reshape(B, 1, C)

    out = pl.pallas_call(
        _kernel,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda i: (i // H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, 1, D), jnp.bfloat16),
        interpret=interpret,
    )(qf, kf, vf, bf)
    return out.reshape(B, H, 1, D).transpose(0, 2, 1, 3)
