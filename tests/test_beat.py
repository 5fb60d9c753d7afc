import numpy as np
import pytest

import jax.numpy as jnp

from etude_tpu.models.beat_transformer import (
    BeatTransformerConfig,
    forward,
    init_params,
    param_count,
)
from etude_tpu.ops.dbn import DBNBeatTracker, DBNDownBeatTracker
from etude_tpu.ops.dilated_attention import dilated_attention, head_offsets


# ------------------------------------------------------- dilated attention
def test_head_offsets_layout():
    off = head_offsets(8, 5)
    assert off.shape == (8, 5)
    np.testing.assert_array_equal(off[0], [-2, -1, 0, 1, 2])   # symmetric
    np.testing.assert_array_equal(off[4], [-4, -3, -2, -1, 0])  # shift -2
    np.testing.assert_array_equal(off[7], [0, 1, 2, 3, 4])      # shift +2


def test_dilated_attention_local_window():
    """With dilation 1, changing a key outside the window must not affect a
    query; changing one inside must."""
    B, H, T, d = 1, 8, 16, 4
    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, H, T, d)).astype(np.float32)
    k = rng.normal(size=(B, H, T, d)).astype(np.float32)
    v = rng.normal(size=(B, H, T, d)).astype(np.float32)
    er = np.zeros((H, d, 5), np.float32)

    out1 = np.asarray(dilated_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(er), 1))
    # Head 0 (symmetric): query t=8 sees keys 6..10. Mutate key 12.
    k2, v2 = k.copy(), v.copy()
    k2[0, 0, 12] += 5.0
    v2[0, 0, 12] += 5.0
    out2 = np.asarray(dilated_attention(
        jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), jnp.asarray(er), 1))
    np.testing.assert_allclose(out1[0, 0, 8], out2[0, 0, 8], rtol=1e-5)
    # Mutating key 9 (inside window) changes the output.
    k3 = k.copy()
    k3[0, 0, 9] += 5.0
    out3 = np.asarray(dilated_attention(
        jnp.asarray(q), jnp.asarray(k3), jnp.asarray(v), jnp.asarray(er), 1))
    assert not np.allclose(out1[0, 0, 8], out3[0, 0, 8])


def test_dilated_attention_dilation_stride():
    """With dilation 4, the symmetric window covers t±8 in steps of 4."""
    B, H, T, d = 1, 8, 32, 4
    rng = np.random.default_rng(1)
    q = rng.normal(size=(B, H, T, d)).astype(np.float32)
    k = rng.normal(size=(B, H, T, d)).astype(np.float32)
    v = rng.normal(size=(B, H, T, d)).astype(np.float32)
    er = np.zeros((H, d, 5), np.float32)
    base = np.asarray(dilated_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(er), 4))
    # Key at t=16+2 is NOT on the stride-4 grid of query 16 → no effect.
    k2 = k.copy(); k2[0, 0, 18] += 9.0
    out = np.asarray(dilated_attention(
        jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v), jnp.asarray(er), 4))
    np.testing.assert_allclose(base[0, 0, 16], out[0, 0, 16], rtol=1e-5)
    # Key at t=16+4 IS on the grid.
    k3 = k.copy(); k3[0, 0, 20] += 9.0
    out = np.asarray(dilated_attention(
        jnp.asarray(q), jnp.asarray(k3), jnp.asarray(v), jnp.asarray(er), 4))
    assert not np.allclose(base[0, 0, 16], out[0, 0, 16])


# --------------------------------------------------------- beat transformer
@pytest.fixture(scope="module")
def tiny_beat_model():
    config = BeatTransformerConfig(
        attn_len=5, instr=3, ntoken=2, dmodel=32, nhead=8, d_hid=64,
        nlayers=4, mel_bins=128, n_tempi=30, instr_layers=(1, 2),
    )
    return config, init_params(config, seed=0)


def test_beat_transformer_shapes(tiny_beat_model):
    config, params = tiny_beat_model
    x = np.random.default_rng(0).normal(size=(2, 3, 64, 128)).astype(np.float32)
    act, tempo = forward(params, config, jnp.asarray(x), compute_dtype=jnp.float32)
    assert act.shape == (2, 64, 2)
    assert tempo.shape == (2, 30)
    assert np.all(np.isfinite(np.asarray(act)))


def test_beat_transformer_full_size_params():
    config = BeatTransformerConfig()
    n = param_count(init_params(config, seed=0))
    # 9 dilated layers + 3 instrument layers at dmodel 256: ~9M params.
    assert 5e6 < n < 15e6


# ----------------------------------------------------------------- DBN
def _click_activations(T, period, offset=0, peak=0.95, base=0.02):
    """Smooth 3-frame activation peaks (RNN-output-like) on a regular grid."""
    act = np.full(T, base)
    for t in range(offset, T, period):
        act[t] = peak
        if t + 1 < T:
            act[t + 1] = max(act[t + 1], peak * 0.6)
        if t - 1 >= 0:
            act[t - 1] = max(act[t - 1], peak * 0.6)
    return act


def test_dbn_beat_tracker_recovers_click_grid():
    fps = 43.066
    period = 20  # ≈ 129 BPM
    act = _click_activations(800, period)
    tracker = DBNBeatTracker(min_bpm=70, max_bpm=250, fps=fps, threshold=0.2)
    beats = tracker(act)
    assert len(beats) >= 35
    intervals = np.diff(beats)
    # Constant tempo: all intervals ≈ period/fps.
    np.testing.assert_allclose(intervals, period / fps, atol=0.05)


def test_dbn_beat_tracker_empty_and_silent():
    tracker = DBNBeatTracker(fps=43.066, threshold=0.2)
    assert len(tracker(np.zeros(100))) == 0
    assert len(tracker(np.empty(0))) == 0


def test_dbn_downbeat_tracker_finds_meter():
    fps = 43.066
    period = 20
    T = 1600
    beat = _click_activations(T, period)
    down = np.full(T, 0.01)
    # Every 4th beat is a downbeat.
    for t in range(0, T, 4 * period):
        down[t] = 0.9
        beat[t] = 0.05
    combined = np.stack([np.maximum(beat - down, 0), down], axis=-1)
    tracker = DBNDownBeatTracker(
        beats_per_bar=(3, 4), min_bpm=70, max_bpm=250, fps=fps, threshold=0.2
    )
    out = tracker(combined)
    assert out.shape[1] == 2
    numbers = out[:, 1].astype(int)
    assert set(numbers) <= {1, 2, 3, 4}
    # Downbeats are ~every 4th beat → meter 4 wins.
    downbeat_times = out[out[:, 1] == 1][:, 0]
    assert len(downbeat_times) >= 15
    np.testing.assert_allclose(np.diff(downbeat_times), 4 * period / fps, atol=0.1)


def test_dbn_downbeat_prefers_triple_meter():
    fps = 43.066
    period = 20
    T = 1500
    beat = _click_activations(T, period)
    down = np.full(T, 0.01)
    for t in range(0, T, 3 * period):
        down[t] = 0.9
        beat[t] = 0.05
    combined = np.stack([np.maximum(beat - down, 0), down], axis=-1)
    tracker = DBNDownBeatTracker(
        beats_per_bar=(3, 4), min_bpm=70, max_bpm=250, fps=fps, threshold=0.2
    )
    out = tracker(combined)
    downbeat_times = out[out[:, 1] == 1][:, 0]
    np.testing.assert_allclose(np.diff(downbeat_times), 3 * period / fps, atol=0.1)


# ------------------------------------------------------- native DBN backend
def test_native_dbn_backend_matches_jax(monkeypatch):
    """The C++ host Viterbi must produce the same beats as the JAX scan."""
    from etude_tpu.native import native_dbn_available

    if not native_dbn_available():
        pytest.skip("native toolchain unavailable")

    fps = 43.066
    act = _click_activations(600, 18)

    monkeypatch.setenv("ETUDE_DBN_BACKEND", "native")
    beats_native = DBNBeatTracker(min_bpm=70, max_bpm=250, fps=fps,
                                  threshold=0.2)(act)
    monkeypatch.setenv("ETUDE_DBN_BACKEND", "jax")
    beats_jax = DBNBeatTracker(min_bpm=70, max_bpm=250, fps=fps,
                               threshold=0.2)(act)
    np.testing.assert_allclose(beats_native, beats_jax, atol=1e-9)


def test_native_dbn_downbeat_matches_jax(monkeypatch):
    from etude_tpu.native import native_dbn_available

    if not native_dbn_available():
        pytest.skip("native toolchain unavailable")

    fps = 43.066
    period = 20
    T = 1200
    beat = _click_activations(T, period)
    down = np.full(T, 0.01)
    for t in range(0, T, 4 * period):
        down[t] = 0.9
        beat[t] = 0.05
    combined = np.stack([np.maximum(beat - down, 0), down], axis=-1)

    monkeypatch.setenv("ETUDE_DBN_BACKEND", "native")
    out_native = DBNDownBeatTracker(beats_per_bar=(3, 4), min_bpm=70,
                                    max_bpm=250, fps=fps, threshold=0.2)(combined)
    monkeypatch.setenv("ETUDE_DBN_BACKEND", "jax")
    out_jax = DBNDownBeatTracker(beats_per_bar=(3, 4), min_bpm=70,
                                 max_bpm=250, fps=fps, threshold=0.2)(combined)
    np.testing.assert_allclose(out_native, out_jax, atol=1e-9)


def test_pallas_dilated_backend_matches(monkeypatch):
    """The experimental Pallas kernel (interpret mode) must match the XLA
    slice formulation
    (interpret mode on CPU)."""
    from etude_tpu.ops.dilated_attention import (
        dilated_attention,
        dilated_attention_pallas,
    )

    B, H, T, d = 1, 8, 128, 32
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    er = jnp.asarray(0.1 * rng.normal(size=(H, d, 5)).astype(np.float32))
    for dil in (1, 8):
        a = np.asarray(dilated_attention(q, k, v, er, dil))
        b = np.asarray(dilated_attention_pallas(q, k, v, er, dil))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
