import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from infer import InferencePipeline, main as infer_main  # noqa: E402
from etude_tpu.config import load_config  # noqa: E402
from etude_tpu.data.tokenizer import TinyREMITokenizer  # noqa: E402
from etude_tpu.data.vocab import Event, Vocab  # noqa: E402
from etude_tpu.models.decoder import EtudeDecoderConfig  # noqa: E402
from etude_tpu.utils.midi import read_midi_notes  # noqa: E402


def _build_vocab() -> Vocab:
    vocab = Vocab()
    events = [Event("Bar", "BOS"), Event("Bar", "EOS")]
    for p in range(21, 109):
        events.append(Event("Note", p))
    for pos in range(33):
        events.append(Event("Pos", pos))
    for d in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32):
        events.append(Event("Duration", d))
    vocab.build_from_events([events])
    return vocab


@pytest.fixture
def decode_only_env(tmp_path):
    """Work dir with intermediates + tiny decoder checkpoint config."""
    work = tmp_path / "outputs" / "infer" / "temp"
    work.mkdir(parents=True)

    tempo = [{
        "time_sig": 4, "bpm": 120.0, "start": 1.0,
        "downbeats": [1.0 + 2.0 * i for i in range(4)],
    }]
    (work / "tempo.json").write_text(json.dumps(tempo))

    notes = [
        {"onset": 1.0 + 0.5 * i, "offset": 1.4 + 0.5 * i,
         "pitch": 60 + (i % 12), "velocity": 80}
        for i in range(12)
    ]
    (work / "extract.json").write_text(json.dumps(notes))
    (work / "volume.json").write_text(json.dumps([0.5] * 300))

    vocab = _build_vocab()
    ckpt = tmp_path / "checkpoints" / "decoder"
    ckpt.mkdir(parents=True)
    vocab.save(ckpt / "vocab.json")
    EtudeDecoderConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=256, attribute_emb_dim=8,
    ).to_json_file(ckpt / "etude_decoder_config.json")

    cfg_yaml = tmp_path / "config.yaml"
    cfg_yaml.write_text(f"""
paths:
  infer_output_dir: {tmp_path / 'outputs' / 'infer'}
  decoder_vocab: {ckpt / 'vocab.json'}
  decoder_config: {ckpt / 'etude_decoder_config.json'}
  decoder_model: {ckpt / 'latest.ckpt'}
decoder:
  max_bar_token_limit: 16
  prompt_buckets: [64, 128, 240]
""")
    return tmp_path, cfg_yaml


def test_decode_only_pipeline(decode_only_env):
    tmp_path, cfg_yaml = decode_only_env
    config = load_config(cfg_yaml)
    pipeline = InferencePipeline(config, allow_random_weights=True)
    attrs = {"polyphony_bin": 1, "rhythm_intensity_bin": 1,
             "sustain_bin": 1, "pitch_overlap_bin": 2}
    pipeline.run("unused", attrs, final_filename="song", decode_only=True)
    out = tmp_path / "outputs" / "infer" / "song.mid"
    assert out.exists()
    # Output MIDI parses; any notes land within the measure grid span.
    midi_notes = read_midi_notes(out)
    for n in midi_notes:
        assert -1.5 <= n["onset"] <= 12.0


def test_decode_only_missing_intermediates(tmp_path):
    cfg_yaml = tmp_path / "c.yaml"
    cfg_yaml.write_text(f"paths:\n  infer_output_dir: {tmp_path / 'o'}\n")
    config = load_config(cfg_yaml)
    pipeline = InferencePipeline(config)
    with pytest.raises(SystemExit):
        pipeline.run("x", {"polyphony_bin": 1, "rhythm_intensity_bin": 1,
                           "sustain_bin": 1, "pitch_overlap_bin": 2},
                     decode_only=True)


def test_infer_cli_decode_only(decode_only_env, monkeypatch):
    tmp_path, cfg_yaml = decode_only_env
    rc = infer_main([
        "--config", str(cfg_yaml), "--decode-only", "--allow-random-weights",
        "--output_name", "cli_out", "--polyphony", "2", "--temperature", "0.5",
        "--seed", "3",
    ])
    assert rc == 0
    assert (tmp_path / "outputs" / "infer" / "cli_out.mid").exists()


def test_infer_cli_requires_source():
    with pytest.raises(SystemExit):
        infer_main(["--output_name", "x"])


def test_infer_cli_sweep(decode_only_env):
    tmp_path, cfg_yaml = decode_only_env
    rc = infer_main([
        "--config", str(cfg_yaml), "--decode-only", "--sweep",
        "--allow-random-weights",
        "--output_name", "sw", "--temperature", "0.9", "--seed", "1",
    ])
    assert rc == 0
    outs = sorted((tmp_path / "outputs" / "infer").glob("sw_p*r*s*.mid"))
    assert len(outs) == 27


def test_missing_checkpoints_hard_error(decode_only_env):
    """Without --allow-random-weights, missing model checkpoints must abort
    (random weights produce meaningless output)."""
    tmp_path, cfg_yaml = decode_only_env
    config = load_config(cfg_yaml)
    pipeline = InferencePipeline(config)  # allow_random_weights=False
    attrs = {"polyphony_bin": 1, "rhythm_intensity_bin": 1,
             "sustain_bin": 1, "pitch_overlap_bin": 2}
    with pytest.raises(SystemExit):
        pipeline.run("unused", attrs, decode_only=True)
