import json

import numpy as np
import pytest

from etude_tpu.config.schema import ExtractorConfig
from etude_tpu.data.extractor import AMTAPC_Extractor, amt_config_from
from etude_tpu.models.amt import init_params
from etude_tpu.utils.audio import analyze_volume, load_wav, save_wav


@pytest.fixture(scope="module")
def small_extractor():
    cfg = ExtractorConfig()
    cfg.feature.mel_bins = 32
    cfg.feature.n_bins = 32
    cfg.input.num_frame = 16
    cfg.input.margin_b = 4
    cfg.input.margin_f = 4
    cfg.model.transformer_hid_dim = 32
    cfg.model.transformer_pf_dim = 64
    cfg.model.encoder_n_layer = 1
    cfg.model.decoder_n_layer = 2
    cfg.model.cnn_kernel = 3
    cfg.infer.segment_batch = 2
    amt_cfg = amt_config_from(cfg)
    params = init_params(amt_cfg, seed=0)
    return AMTAPC_Extractor(cfg, params=params)


def _sine_wav(path, sr=16000, seconds=1.2, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    wave = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
    save_wav(path, wave, sr)
    return path


def test_wav2feature_shape(small_extractor, tmp_path):
    path = _sine_wav(tmp_path / "a.wav")
    feat = small_extractor._wav2feature(path)
    assert feat.shape[1] == 32
    assert feat.shape[0] > 60


def test_segmenting_covers_and_pads(small_extractor, tmp_path):
    feat = np.random.default_rng(0).normal(size=(40, 32)).astype(np.float32)
    segs, T = small_extractor._segment(feat)
    assert T == 40
    # ceil(40/16) = 3 segments, each [n_bin, margin+16+margin].
    assert segs.shape == (3, 32, 4 + 16 + 4)
    # First segment's leading margin is the pad value.
    assert np.all(segs[0, :, :4] == small_extractor.config.input.min_value)


def test_extract_end_to_end(small_extractor, tmp_path):
    path = _sine_wav(tmp_path / "b.wav")
    out_json = tmp_path / "extract.json"
    out_midi = tmp_path / "extract.mid"
    notes = small_extractor.extract(path, out_json, out_midi)
    data = json.loads(out_json.read_text())
    assert isinstance(data, list)
    assert data == [
        {k: n[k] for k in ("onset", "offset", "pitch", "velocity")} for n in notes
    ]
    for n in data:
        assert n["offset"] - n["onset"] >= small_extractor.config.infer.min_duration
        assert 21 <= n["pitch"] <= 108


def test_transcript_batched_equals_serial(small_extractor):
    """Segment batching must not change the stitched activation maps."""
    feat = np.random.default_rng(3).normal(size=(40, 32)).astype(np.float32)
    maps_b = small_extractor._transcript(feat)
    solo = AMTAPC_Extractor(
        small_extractor.config, params=small_extractor.params, segment_batch=1
    )
    maps_s = solo._transcript(feat)
    for key in ("onset_time", "mpe_time", "velocity_time"):
        np.testing.assert_allclose(
            maps_b[key], maps_s[key], rtol=5e-3, atol=5e-3
        )
    # Maps stay padded to the segment boundary (reference peak-picks the
    # PADDED activations, etude/data/extractor.py:210-248): 40 frames at
    # n_frame=16 → 3 segments → 48 rows.
    n_frame = small_extractor.amt_config.n_frame
    t_pad = -(-40 // n_frame) * n_frame
    assert maps_b["onset_time"].shape == (t_pad, small_extractor.amt_config.n_note)


def test_analyze_volume(tmp_path):
    sr = 22050
    t = np.arange(sr * 2) / sr
    # Quiet first half, loud second half.
    wave = np.concatenate([
        0.05 * np.sin(2 * np.pi * 220 * t[: sr]),
        0.9 * np.sin(2 * np.pi * 220 * t[sr:]),
    ]).astype(np.float32)
    path = tmp_path / "v.wav"
    save_wav(path, wave, sr)
    contour = analyze_volume(path, sr=sr, resolution=20)
    assert contour.min() >= 0.0 and contour.max() <= 1.0
    # 2 s of audio at 20 Hz resolution → ~40 frames, transition at ~20.
    assert contour[2:15].mean() < 0.2
    assert contour[25:38].mean() > 0.8


def test_load_wav_resample(tmp_path):
    sr = 44100
    wave = np.random.default_rng(0).normal(size=sr).astype(np.float32) * 0.1
    path = tmp_path / "r.wav"
    save_wav(path, wave, sr)
    out, out_sr = load_wav(path, target_sr=16000)
    assert out_sr == 16000
    assert abs(len(out) - 16000) <= 2


def test_native_resample_matches_scipy():
    # The native polyphase kernel (native/resample_fir.cc) must be
    # numerically the scipy resample_poly path it replaces on the serving
    # critical path — same Kaiser-sinc taps, same output framing.
    from scipy.signal import resample_poly

    from etude_tpu.native import load_resample_library
    from etude_tpu.utils.audio import resample_audio

    if load_resample_library() is None:
        import pytest

        pytest.skip("native resample build unavailable")
    rng = np.random.default_rng(1)
    for n, (orig, tgt) in [
        (44100 * 3 + 7, (44100, 16000)),   # serving extract leg
        (44100 * 2, (44100, 22050)),       # serving volume leg
        (500, (44100, 16000)),             # shorter than the filter
        (22050, (22050, 16000)),
    ]:
        x = rng.standard_normal(n).astype(np.float32)
        got = resample_audio(x, orig, tgt)
        g = np.gcd(orig, tgt)
        want = resample_poly(x, tgt // g, orig // g).astype(np.float32)
        assert got.shape == want.shape, (orig, tgt)
        scale = max(float(np.max(np.abs(want))), 1e-9)
        assert float(np.max(np.abs(got - want))) / scale < 1e-5, (orig, tgt)
