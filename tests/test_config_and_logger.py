import json
import os

import pytest

from etude_tpu.config import EtudeConfig, load_config, save_config
from etude_tpu.config.loader import _deep_merge
from etude_tpu.utils.logger import EtudeLogger


def test_defaults_match_reference_contract():
    cfg = EtudeConfig()
    # Spot-check reference-contract hyperparameters (etude/config/schema.py).
    assert cfg.decoder.hidden_size == 512
    assert cfg.decoder.num_hidden_layers == 8
    assert cfg.decoder.temperature == 0.0
    assert cfg.decoder.top_p == 0.9
    assert cfg.decoder.max_output_tokens == 25600
    assert cfg.extractor.feature.sr == 16000
    assert cfg.extractor.input.min_value == -18.0
    assert cfg.hft.input.min_value == -80.0
    assert cfg.hft.infer.thred_onset == 0.75
    assert cfg.beat_detector.min_bpm == 70.0
    assert cfg.beat_detector.beats_per_bar == [3, 4]
    assert cfg.train.learning_rate == 2e-4
    assert cfg.train.adam_beta2 == 0.98
    assert cfg.train.gradient_accumulation_steps == 4
    assert cfg.prepare.align.wp_std_threshold == 1.0
    assert set(cfg.eval.versions) == {
        "human", "etude_e", "etude_d_d", "etude_d", "picogen", "amtapc",
        "music2midi",
    }


def test_deep_merge_nested():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    update = {"a": {"c": 9}, "e": 4}
    merged = _deep_merge(base, update)
    assert merged == {"a": {"b": 1, "c": 9}, "d": 3, "e": 4}
    assert base["a"]["c"] == 2  # no mutation


def test_yaml_and_override_precedence(tmp_path):
    yaml_path = tmp_path / "c.yaml"
    yaml_path.write_text("decoder:\n  temperature: 0.5\n  top_p: 0.8\n")
    cfg = load_config(yaml_path, overrides={"decoder": {"temperature": 0.9}})
    assert cfg.decoder.temperature == 0.9  # override beats YAML
    assert cfg.decoder.top_p == 0.8        # YAML beats default
    assert cfg.decoder.hidden_size == 512  # default preserved


def test_missing_yaml_warns_and_defaults(tmp_path):
    cfg = load_config(tmp_path / "nope.yaml")
    assert cfg.decoder.hidden_size == 512


def test_save_config_roundtrip(tmp_path):
    cfg = load_config(None, overrides={"decoder": {"temperature": 0.7}})
    out = tmp_path / "saved.yaml"
    save_config(cfg, out)
    cfg2 = load_config(out)
    assert cfg2.decoder.temperature == 0.7


def test_logger_taxonomy_and_levels(capsys):
    import io

    stream = io.StringIO()
    os.environ["NO_COLOR"] = "1"
    try:
        logger = EtudeLogger(stream=stream)
        logger.stage("Stage One")
        logger.step("a step")
        logger.substep("a substep")
        logger.info("info line")
        logger.success("done")
        logger.warn("careful")
        logger.error("broken")
        logger.skip("skipped thing")
        out = stream.getvalue()
        for token in ("Stage One", "a step", "a substep", "info line",
                      "done", "careful", "broken", "skip"):
            assert token in out
    finally:
        os.environ.pop("NO_COLOR", None)


def test_logger_level_filtering():
    import io

    os.environ["LOG_LEVEL"] = "ERROR"
    try:
        stream = io.StringIO()
        logger = EtudeLogger(stream=stream)
        logger.info("hidden")
        logger.warn("also hidden")
        logger.error("visible")
        out = stream.getvalue()
        assert "hidden" not in out
        assert "visible" in out
    finally:
        os.environ.pop("LOG_LEVEL", None)
