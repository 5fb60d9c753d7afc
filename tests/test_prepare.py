import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etude_tpu.config import load_config  # noqa: E402
from etude_tpu.config.schema import HFTConfig  # noqa: E402
from etude_tpu.data.hft import HFT_Transformer, hft_amt_config  # noqa: E402
from etude_tpu.models.amt import init_params  # noqa: E402
from etude_tpu.utils.preprocess import (  # noqa: E402
    compute_wp_std,
    create_time_map_from_downbeats,
    weakly_align,
)


def test_compute_wp_std():
    assert compute_wp_std([]) == float("inf")
    assert compute_wp_std([[1.0, 1.0], [2.0, 2.0]]) == 0.0
    assert compute_wp_std([[1.0, 1.1], [2.0, 1.8]]) == pytest.approx(
        np.std([-0.1, 0.2]), abs=1e-9
    )


def test_create_time_map():
    # Warping path: cover = 2x origin (cover twice as slow).
    wp = np.stack([np.arange(0, 200, 2), np.arange(100)])
    align = {"wp": wp}
    tm = create_time_map_from_downbeats([0.5, 1.0, 1.5], align, feature_rate=50)
    assert len(tm) == 3
    for origin_t, cover_t in tm:
        assert cover_t == pytest.approx(2 * origin_t, abs=0.05)
    # Downbeats beyond the path end are dropped.
    tm = create_time_map_from_downbeats([50.0], align, feature_rate=50)
    assert tm == []


def test_weakly_align_remaps_and_preserves_duration():
    time_map = [[0.0, 0.0], [1.0, 2.0], [2.0, 4.0]]  # cover runs 2x slower
    notes = [
        {"pitch": 60, "onset": 1.0, "offset": 1.5, "velocity": 80},
        {"pitch": 62, "onset": 3.0, "offset": 3.2, "velocity": 70},
        {"pitch": 64, "onset": 30.0, "offset": 31.0, "velocity": 70},  # outside
    ]
    aligned = weakly_align(notes, time_map)
    assert len(aligned) == 2
    assert aligned[0]["onset"] == pytest.approx(0.5)
    assert aligned[0]["offset"] - aligned[0]["onset"] == pytest.approx(0.5)
    assert aligned[1]["onset"] == pytest.approx(1.5)


def test_weakly_align_empty():
    assert weakly_align([], [[0, 0], [1, 1]]) == []
    assert weakly_align([{"pitch": 60, "onset": 0, "offset": 1,
                          "velocity": 80}], []) == []


@pytest.fixture(scope="module")
def tiny_hft():
    cfg = HFTConfig()
    cfg.feature.mel_bins = 32
    cfg.feature.n_bins = 32
    cfg.input.num_frame = 16
    cfg.input.margin_b = 4
    cfg.input.margin_f = 4
    cfg.infer.n_stride = 8
    amt_cfg = hft_amt_config(cfg)
    object.__setattr__(amt_cfg, "cnn_kernel", 3)  # frozen dataclass override
    return cfg, amt_cfg


def test_hft_stride_covers_all_frames(tiny_hft):
    cfg, amt_cfg = tiny_hft
    params = init_params(amt_cfg, seed=0)
    hft = HFT_Transformer(cfg, params=params, segment_batch=2)
    hft.amt_config = amt_cfg
    feature = np.random.default_rng(0).normal(size=(50, 32)).astype(np.float32)
    maps = hft._transcript_stride(feature)
    assert maps["onset_time"].shape == (50, 88)
    assert maps["velocity_time"].shape == (50, 88)
    assert np.all(np.isfinite(maps["onset_time"]))


def test_hft_stride_center_consistency(tiny_hft):
    """A frame's prediction must come from the segment where it is central:
    shifting distant content must not change a frame's output."""
    cfg, amt_cfg = tiny_hft
    params = init_params(amt_cfg, seed=0)
    hft = HFT_Transformer(cfg, params=params, segment_batch=2)
    hft.amt_config = amt_cfg
    rng = np.random.default_rng(1)
    feature = rng.normal(size=(48, 32)).astype(np.float32)
    maps_a = hft._transcript_stride(feature)
    feature_b = feature.copy()
    feature_b[40:] += 5.0  # far from frame 4's window (stride 8, window 24)
    maps_b = hft._transcript_stride(feature_b)
    np.testing.assert_allclose(
        maps_a["onset_time"][4], maps_b["onset_time"][4], rtol=1e-4, atol=1e-4
    )


def test_prepare_stages_3_to_5(tmp_path):
    """Run align→extract→tokenize on synthetic processed inputs (stage 2/4
    outputs mocked as files; stage 3's aligner runs on tiny real audio)."""
    from prepare import run_stage_3_align_and_filter, run_stage_5_tokenize
    from etude_tpu.utils.audio import save_wav

    raw = tmp_path / "raw" / "0001"
    processed = tmp_path / "processed" / "0001"
    raw.mkdir(parents=True)
    processed.mkdir(parents=True)

    # Tiny identical origin/cover audio (perfect alignment, WP-Std ≈ 0).
    sr = 22050
    t = np.arange(sr * 2) / sr
    wave = (0.4 * np.sin(2 * np.pi * 440 * t) *
            (1 + 0.5 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
    save_wav(raw / "origin.wav", wave, sr)
    save_wav(raw / "cover.wav", wave, sr)

    (processed / "beat_pred.json").write_text(json.dumps({
        "beat_pred": [0.5 * i for i in range(1, 4)],
        "downbeat_pred": [0.0, 1.0],
    }))
    notes = [{"pitch": 60 + i, "onset": 0.2 * i, "offset": 0.2 * i + 0.15,
              "velocity": 80} for i in range(8)]
    (processed / "transcription.json").write_text(json.dumps(notes))
    (processed / "tempo.json").write_text(json.dumps([
        {"time_sig": 4, "bpm": 120.0, "start": 0.0, "downbeats": [0.0, 2.0]}
    ]))

    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(f"""
paths:
  raw_dir: {tmp_path / 'raw'}
  processed_dir: {tmp_path / 'processed'}
  aligned_dir: {tmp_path / 'aligned'}
  tokenized_dir: {tmp_path / 'tokenized'}
  dataset_vocab: {tmp_path / 'vocab.json'}
""")
    config = load_config(cfg_yaml)

    run_stage_3_align_and_filter(config)
    meta = json.loads((tmp_path / "aligned" / "metadata.json").read_text())
    assert len(meta) == 1 and meta[0]["status"] == "kept"
    assert (tmp_path / "aligned" / "0001" / "cover.json").exists()

    # Stage 4 needs extractor weights; use the aligned transcription as the
    # condition side instead (what stage 4 would produce).
    aligned_cover = tmp_path / "aligned" / "0001" / "cover.json"
    (tmp_path / "aligned" / "0001" / "extract.json").write_text(
        aligned_cover.read_text()
    )

    run_stage_5_tokenize(config)
    assert (tmp_path / "vocab.json").exists()
    src = np.load(tmp_path / "tokenized" / "0001" / "0001_src.npy")
    tgt = np.load(tmp_path / "tokenized" / "0001" / "0001_tgt.npy")
    assert src.size > 4 and tgt.size > 4

    # Idempotence: stage 3 skips on rerun, keeping metadata.
    run_stage_3_align_and_filter(config)
    meta2 = json.loads((tmp_path / "aligned" / "metadata.json").read_text())
    assert len(meta2) == 1
