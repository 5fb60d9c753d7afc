import numpy as np
import pytest

import jax.numpy as jnp

from etude_tpu.ops.mel import (
    hz_to_mel_htk,
    log_mel_spectrogram,
    mel_filterbank,
    mel_to_hz_htk,
)


def test_mel_scale_roundtrip():
    freqs = np.array([0.0, 440.0, 1000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz_htk(hz_to_mel_htk(freqs)), freqs, rtol=1e-6)
    assert hz_to_mel_htk(1000.0) == pytest.approx(999.99, abs=0.2)


def test_filterbank_shape_and_coverage():
    fb = mel_filterbank(sr=16000, n_fft=2048, n_mels=256)
    assert fb.shape == (1025, 256)
    assert np.all(fb >= 0)
    # Every filter has some support.
    assert np.all(fb.sum(axis=0) > 0)
    # Slaney norm: filter areas are approximately equalized in Hz terms.
    areas = fb.sum(axis=0)
    assert areas.max() / areas.min() < 30


def test_logmel_shape_and_hop():
    sr, n = 16000, 16000
    wave = np.random.default_rng(0).normal(size=n).astype(np.float32)
    out = np.asarray(log_mel_spectrogram(jnp.asarray(wave), sr=sr))
    # Centered framing: n // hop + 1 frames.
    assert out.shape == (n // 256 + 1, 256)
    assert np.all(np.isfinite(out))


def test_logmel_sine_peak_location():
    """A pure tone's energy must land on the mel bin containing its freq."""
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    freq = 440.0
    wave = np.sin(2 * np.pi * freq * t).astype(np.float32)
    out = np.asarray(log_mel_spectrogram(jnp.asarray(wave), sr=sr))
    mean_spec = out.mean(axis=0)
    peak_mel = int(np.argmax(mean_spec))

    # Expected mel bin: position of 440 Hz among the 256 HTK mel centers.
    mel_pts = np.linspace(hz_to_mel_htk(0), hz_to_mel_htk(sr / 2), 256 + 2)
    centers = mel_to_hz_htk(mel_pts[1:-1])
    expected = int(np.argmin(np.abs(centers - freq)))
    assert abs(peak_mel - expected) <= 2


def test_logmel_silence_is_log_offset():
    wave = np.zeros(4096, np.float32)
    out = np.asarray(log_mel_spectrogram(jnp.asarray(wave), log_offset=1e-8))
    np.testing.assert_allclose(out, np.log(1e-8), rtol=1e-5)


def test_host_mel_matches_device_mel():
    """log_mel_spectrogram_host (numpy, for host-side data generation) must
    agree with the on-device program bin for bin."""
    from etude_tpu.ops.mel import log_mel_spectrogram_host

    rng = np.random.default_rng(0)
    wave = rng.normal(0, 0.2, 16000 * 2 + 123).astype(np.float32)
    dev = np.asarray(log_mel_spectrogram(
        jnp.asarray(wave), sr=16000, n_fft=2048, hop=256,
        win_length=2048, n_mels=256, log_offset=1e-8,
    ))
    host = log_mel_spectrogram_host(
        wave, sr=16000, n_fft=2048, hop=256,
        win_length=2048, n_mels=256, log_offset=1e-8,
    )
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, atol=1e-3)
