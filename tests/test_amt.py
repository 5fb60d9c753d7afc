import numpy as np
import pytest

import jax.numpy as jnp

from etude_tpu.models.amt import AMTConfig, forward, init_params, param_count


@pytest.fixture(scope="module")
def tiny():
    config = AMTConfig(
        n_margin=4, n_frame=16, n_bin=32, cnn_channel=2, cnn_kernel=3,
        hid_dim=32, encoder_n_layer=2, encoder_n_head=4, decoder_n_layer=2,
        decoder_n_head=4, pf_dim=64, n_note=12, n_velocity=8,
    )
    return config, init_params(config, seed=0)


def test_output_shapes(tiny):
    config, params = tiny
    B = 2
    spec = np.random.default_rng(0).normal(
        size=(B, config.n_bin, 2 * config.n_margin + config.n_frame)
    ).astype(np.float32)
    out = forward(params, config, jnp.asarray(spec), compute_dtype=jnp.float32)
    for branch in ("freq", "time"):
        assert out[f"onset_{branch}"].shape == (B, config.n_frame, config.n_note)
        assert out[f"velocity_{branch}"].shape == (
            B, config.n_frame, config.n_note, config.n_velocity
        )
        a = np.asarray(out[f"onset_{branch}"])
        assert np.all((a >= 0) & (a <= 1))  # sigmoid heads


def test_batch_invariance(tiny):
    """Batched segments must equal per-segment forwards (segment batching
    replaces the reference's serial loop; results must not change)."""
    config, params = tiny
    rng = np.random.default_rng(1)
    spec = rng.normal(
        size=(2, config.n_bin, 2 * config.n_margin + config.n_frame)
    ).astype(np.float32)
    both = forward(params, config, jnp.asarray(spec), compute_dtype=jnp.float32)
    solo0 = forward(params, config, jnp.asarray(spec[:1]), compute_dtype=jnp.float32)
    solo1 = forward(params, config, jnp.asarray(spec[1:]), compute_dtype=jnp.float32)
    for key in ("onset_time", "mpe_freq", "offset_time"):
        np.testing.assert_allclose(
            np.asarray(both[key][0]), np.asarray(solo0[key][0]), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(both[key][1]), np.asarray(solo1[key][0]), rtol=2e-4, atol=2e-4
        )


def test_full_size_param_count():
    config = AMTConfig()
    params = init_params(config, seed=0)
    n = param_count(params)
    # hFT-class model: ~5M params (3-layer enc + 3-layer dec + heads @ hid 256).
    assert 3e6 < n < 10e6


def test_margin_frames_influence_output(tiny):
    """Context margins must affect predictions (windowed token embedding)."""
    config, params = tiny
    rng = np.random.default_rng(2)
    spec = rng.normal(
        size=(1, config.n_bin, 2 * config.n_margin + config.n_frame)
    ).astype(np.float32)
    out1 = forward(params, config, jnp.asarray(spec), compute_dtype=jnp.float32)
    spec2 = spec.copy()
    spec2[:, :, 0] += 10.0  # only a margin frame changes
    out2 = forward(params, config, jnp.asarray(spec2), compute_dtype=jnp.float32)
    assert not np.allclose(
        np.asarray(out1["onset_time"]), np.asarray(out2["onset_time"])
    )
