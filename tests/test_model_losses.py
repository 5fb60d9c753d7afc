"""Every model family is trainable: loss functions produce finite gradients
and a few optimizer steps reduce the loss on a fixed batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax


def _overfit(loss_fn, params, steps=12, lr=3e-3):
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    losses = []
    for _ in range(steps):
        loss, grads = grad_fn(params)
        assert np.isfinite(float(loss))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    return losses


def test_amt_loss_trains():
    from etude_tpu.models.amt import AMTConfig, init_params, loss_fn

    config = AMTConfig(
        n_margin=2, n_frame=8, n_bin=16, cnn_channel=2, cnn_kernel=3,
        hid_dim=16, encoder_n_layer=1, encoder_n_head=2, decoder_n_layer=2,
        decoder_n_head=2, pf_dim=32, n_note=6, n_velocity=4,
    )
    rng = np.random.default_rng(0)
    batch = {
        "spec": jnp.asarray(rng.normal(size=(2, 16, 12)).astype(np.float32)),
        "onset": jnp.asarray((rng.uniform(size=(2, 8, 6)) > 0.9).astype(np.float32)),
        "offset": jnp.asarray((rng.uniform(size=(2, 8, 6)) > 0.9).astype(np.float32)),
        "mpe": jnp.asarray((rng.uniform(size=(2, 8, 6)) > 0.7).astype(np.float32)),
        "velocity": jnp.asarray(rng.integers(0, 4, (2, 8, 6)).astype(np.int32)),
    }
    losses = _overfit(
        lambda p: loss_fn(p, config, batch, compute_dtype=jnp.float32)[0],
        init_params(config, seed=0),
    )
    assert losses[-1] < losses[0]


def test_beat_loss_trains():
    from etude_tpu.models.beat_transformer import (
        BeatTransformerConfig, init_params, loss_fn,
    )

    config = BeatTransformerConfig(
        attn_len=5, instr=2, ntoken=2, dmodel=16, nhead=8, d_hid=32,
        nlayers=2, mel_bins=128, n_tempi=10, instr_layers=(1,),
    )
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(2, 2, 32, 128)).astype(np.float32)),
        "activations": jnp.asarray(
            (rng.uniform(size=(2, 32, 2)) > 0.8).astype(np.float32)
        ),
        "tempo": jnp.asarray(rng.integers(0, 10, (2,)).astype(np.int32)),
        "mask": jnp.ones((2, 32), jnp.float32),
    }
    losses = _overfit(
        lambda p: loss_fn(p, config, batch, compute_dtype=jnp.float32)[0],
        init_params(config, seed=0),
    )
    assert losses[-1] < losses[0]


def test_separator_loss_trains():
    from etude_tpu.models.separator import SeparatorConfig, init_params, loss_fn

    config = SeparatorConfig(num_stems=3, base_channels=2, depth=2)
    rng = np.random.default_rng(0)
    mix = rng.uniform(size=(2, 16, 20)).astype(np.float32)
    stems = rng.uniform(size=(2, 3, 16, 20)).astype(np.float32) * mix[:, None]
    batch = {"mix_mag": jnp.asarray(mix), "stem_mags": jnp.asarray(stems)}
    losses = _overfit(
        lambda p: loss_fn(p, config, batch, compute_dtype=jnp.float32),
        init_params(config, seed=0),
    )
    assert losses[-1] < losses[0]
