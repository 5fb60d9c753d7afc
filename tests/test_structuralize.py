import json

import numpy as np
import pytest

import jax.numpy as jnp

from etude_tpu.data.beat_analyzer import BeatAnalyzer
from etude_tpu.data.beat_detector import BeatDetector
from etude_tpu.data.separation import SourceSeparator, power_to_db
from etude_tpu.config.schema import BeatDetectorConfig
from etude_tpu.models.beat_transformer import BeatTransformerConfig, init_params
from etude_tpu.models.separator import (
    SeparatorConfig,
    forward as sep_forward,
    init_params as sep_init,
)
from etude_tpu.utils.audio import save_wav


# ------------------------------------------------------------- separator
def test_separator_masks_sum_to_one():
    config = SeparatorConfig(num_stems=5, base_channels=4, depth=2)
    params = sep_init(config, seed=0)
    mag = np.random.default_rng(0).uniform(size=(1, 40, 65)).astype(np.float32)
    masks = np.asarray(sep_forward(params, config, jnp.asarray(mag)))
    assert masks.shape == (1, 5, 40, 65)
    np.testing.assert_allclose(masks.sum(axis=1), 1.0, atol=1e-5)
    assert np.all(masks >= 0)


def test_power_to_db_matches_librosa_semantics():
    S = np.array([[1.0, 0.1], [0.01, 1e-12]])
    db = power_to_db(S)
    assert db.max() == pytest.approx(0.0)
    assert db[0, 1] == pytest.approx(-10.0)
    assert db.min() >= -80.0  # top_db clamp


def test_separator_mask_input_is_rms_normalized():
    """The mask net must see RMS-normalized log1p magnitudes (training
    parity, scripts/train_aux_synthetic.py). With normalization, scaling the
    waveform by an exact power of two leaves the net input bit-identical, so
    the per-stem mel POWER scales exactly by gain² (masks unchanged); an
    unnormalized path changes the masks themselves and breaks the relation."""
    from etude_tpu.data.separation import SEP_HOP, SEP_N_FFT, _separate_mel

    rng = np.random.default_rng(1)
    t = np.arange(44100) / 44100
    wave = (0.2 * np.sin(2 * np.pi * 330 * t)
            + 0.05 * rng.normal(size=len(t))).astype(np.float32)
    n_frames = 1 + (len(wave) - SEP_N_FFT) // SEP_HOP

    cfg = SeparatorConfig(base_channels=2, depth=2)
    params = sep_init(cfg, seed=0)
    mel_a = np.asarray(
        _separate_mel(params, cfg, jnp.asarray(wave), n_frames), np.float64
    )
    mel_b = np.asarray(
        _separate_mel(params, cfg, jnp.asarray(0.25 * wave), n_frames),
        np.float64,
    )
    np.testing.assert_allclose(mel_a, mel_b * 16.0, rtol=1e-4, atol=1e-12)


def test_source_separator_features_contract(tmp_path):
    sr = 44100
    t = np.arange(sr) / sr
    wave = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = tmp_path / "mix.wav"
    save_wav(path, wave, sr)

    sep = SourceSeparator(
        params=sep_init(SeparatorConfig(base_channels=2, depth=2), seed=0),
        config=SeparatorConfig(base_channels=2, depth=2),
    )
    out_npy = tmp_path / "sep.npy"
    features = sep.separate_features(path, out_npy)
    # Contract: (5 stems, time, 128 mel), dB scale (max 0, min >= -80).
    assert features.shape[0] == 5 and features.shape[2] == 128
    assert features.shape[1] == 1 + sr // 1024
    assert features.max() == pytest.approx(0.0, abs=1e-4)
    assert features.min() >= -80.0
    assert out_npy.exists()
    assert np.load(out_npy).shape == features.shape


# ----------------------------------------------------------- beat detector
def test_beat_detector_pipeline(tmp_path):
    config = BeatDetectorConfig()
    config.model.dmodel = 32
    config.model.nhead = 8
    config.model.d_hid = 64
    config.model.nlayers = 3
    model_config = BeatTransformerConfig(
        attn_len=5, instr=5, ntoken=2, dmodel=32, nhead=8, d_hid=64, nlayers=3,
    )
    detector = BeatDetector(config, params=init_params(model_config, seed=0))

    features = np.random.default_rng(0).normal(
        size=(5, 400, 128)
    ).astype(np.float32)
    npy = tmp_path / "sep.npy"
    np.save(npy, features)
    out_json = tmp_path / "beat_pred.json"
    results = detector.detect(npy, out_json, cleanup_input=True)

    assert set(results.keys()) == {"beat_pred", "downbeat_pred"}
    assert not npy.exists()  # cleaned up (reference contract)
    data = json.loads(out_json.read_text())
    assert data == results


# ----------------------------------------------------------- beat analyzer
def _make_preds(bpm=120.0, time_sig=4, n_bars=16, start=0.5):
    spb = 60.0 / bpm
    beats, downbeats = [], []
    for bar in range(n_bars):
        t0 = start + bar * time_sig * spb
        downbeats.append(round(t0, 6))
        for b in range(1, time_sig):
            beats.append(round(t0 + b * spb, 6))
    return beats, downbeats


def test_beat_analyzer_steady_tempo():
    beats, downbeats = _make_preds(bpm=120, time_sig=4, n_bars=16)
    regions = BeatAnalyzer().analyze_predictions(beats, downbeats)
    assert len(regions) == 1
    r = regions[0]
    assert r["time_sig"] == 4
    assert r["bpm"] == pytest.approx(120.0, rel=1e-3)
    assert r["start"] == pytest.approx(0.5)
    # 16 downbeats → 15 measures; the region's final boundary downbeat is
    # dropped (reference region contract), leaving 14.
    assert len(r["downbeats"]) == 14


def test_beat_analyzer_no_downbeats():
    assert BeatAnalyzer().analyze_predictions([1.0, 2.0], []) == []


def test_beat_analyzer_time_sig_2_maps_to_4():
    beats, downbeats = _make_preds(bpm=120, time_sig=2, n_bars=20)
    regions = BeatAnalyzer().analyze_predictions(beats, downbeats)
    assert regions[0]["time_sig"] == 4


def test_beat_analyzer_triple_meter():
    beats, downbeats = _make_preds(bpm=90, time_sig=3, n_bars=20)
    regions = BeatAnalyzer().analyze_predictions(beats, downbeats)
    assert regions[0]["time_sig"] == 3
    assert regions[0]["bpm"] == pytest.approx(90.0, rel=1e-3)


def test_beat_analyzer_gap_patching():
    """Two stable regions separated by exactly 2 missing measures."""
    beats_a, downbeats_a = _make_preds(bpm=120, time_sig=4, n_bars=8, start=0.0)
    # Gap: bars at 16 s and 18 s missing (bar duration 2 s).
    beats_b, downbeats_b = _make_preds(bpm=120, time_sig=4, n_bars=8, start=20.0)
    regions = BeatAnalyzer().analyze_predictions(
        beats_a + beats_b, downbeats_a + downbeats_b
    )
    # Faithful reference behavior: the first region's closing boundary spans
    # the gap (skewing its average), a patch region fills the remainder, and
    # the second stable region survives at the true tempo.
    assert len(regions) >= 2
    all_downbeats = [db for r in regions for db in r["downbeats"]]
    assert min(all_downbeats) == pytest.approx(0.0)
    assert any(abs(db - 20.0) < 0.01 for db in all_downbeats)
    # Something was inserted inside the gap interval (patched coverage).
    assert any(14.0 < db < 20.0 for db in all_downbeats)
    assert regions[-1]["bpm"] == pytest.approx(120.0, rel=1e-3)


def test_beat_analyzer_json_roundtrip(tmp_path):
    beats, downbeats = _make_preds()
    pred_path = tmp_path / "beat_pred.json"
    pred_path.write_text(json.dumps(
        {"beat_pred": beats, "downbeat_pred": downbeats}
    ))
    analyzer = BeatAnalyzer()
    regions = analyzer.analyze(pred_path)
    out = tmp_path / "tempo.json"
    analyzer.save_tempo_data(regions, out)
    assert json.loads(out.read_text()) == regions


def test_run_separation_cli(tmp_path):
    import subprocess, sys, os
    from etude_tpu.utils.audio import save_wav

    sr = 44100
    wave = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    wav = tmp_path / "in.wav"
    save_wav(wav, wave, sr)
    out = tmp_path / "sep.npy"
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, "scripts/run_separation.py",
         "--input", str(wav), "--output", str(out)],
        capture_output=True, text=True, env=env, cwd=str(
            __import__("pathlib").Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    feats = np.load(out)
    assert feats.shape[0] == 5 and feats.shape[2] == 128
