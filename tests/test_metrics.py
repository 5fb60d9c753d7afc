import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etude_tpu.config import load_config  # noqa: E402
from etude_tpu.evaluation.metrics import (  # noqa: E402
    IPECalculator,
    RGCCalculator,
    WPDCalculator,
    get_onsets_from_file,
)
from etude_tpu.evaluation.reporting import ReportGenerator  # noqa: E402
from etude_tpu.evaluation.runner import EvaluationRunner  # noqa: E402
from etude_tpu.utils.midi import write_midi  # noqa: E402


def _notes_on_grid(n=64, step=0.25, jitter=0.0, seed=0):
    """Notes on a two-value IOI grid (step, 2*step alternating groups)."""
    rng = np.random.default_rng(seed)
    notes = []
    t = 0.0
    for i in range(n):
        notes.append({
            "onset": round(t + rng.uniform(-jitter, jitter), 4),
            "offset": round(t + 0.2, 4),
            "pitch": 60 + (i % 12),
            "velocity": 80,
        })
        t += step if i % 3 else 2 * step
    return notes


def test_get_onsets_from_json_and_midi(tmp_path):
    notes = _notes_on_grid(10)
    jpath = tmp_path / "a.json"
    jpath.write_text(json.dumps(notes))
    onsets = get_onsets_from_file(jpath)
    assert len(onsets) == 10
    mpath = tmp_path / "a.mid"
    write_midi(notes, mpath)
    onsets_midi = get_onsets_from_file(mpath)
    assert len(onsets_midi) >= 9
    assert get_onsets_from_file(tmp_path / "missing.json").size == 0


def test_rgc_grid_vs_jitter(tmp_path):
    on_grid = tmp_path / "grid.json"
    on_grid.write_text(json.dumps(_notes_on_grid(jitter=0.0)))
    jittered = tmp_path / "jit.json"
    jittered.write_text(json.dumps(_notes_on_grid(jitter=0.06, seed=3)))
    rgc = RGCCalculator(top_k=8)
    score_grid = rgc.calculate(on_grid)["rgc_score"]
    score_jit = rgc.calculate(jittered)["rgc_score"]
    assert score_grid == pytest.approx(0.0, abs=1e-9)
    assert score_jit > score_grid


def test_rgc_insufficient_data(tmp_path):
    p = tmp_path / "few.json"
    p.write_text(json.dumps(_notes_on_grid(n=4)))
    assert "error" in RGCCalculator(top_k=8).calculate(p)


def test_ipe_repetitive_vs_random(tmp_path):
    # Perfectly regular grid → single symbol → entropy 0.
    regular = tmp_path / "reg.json"
    regular.write_text(json.dumps(_notes_on_grid(n=80)))
    # Random IOIs → many symbols → high entropy.
    rng = np.random.default_rng(0)
    notes, t = [], 0.0
    for i in range(80):
        t += float(rng.uniform(0.1, 1.5))
        notes.append({"onset": round(t, 4), "offset": round(t + 0.1, 4),
                      "pitch": 60, "velocity": 80})
    random_p = tmp_path / "rand.json"
    random_p.write_text(json.dumps(notes))

    ipe = IPECalculator(n_gram=8, n_clusters=16)
    # Periodic two-symbol pattern → few distinct 8-grams → low entropy.
    e_reg = ipe.calculate(regular)["ipe_score"]
    e_rand = ipe.calculate(random_p)["ipe_score"]
    assert e_reg < 2.0
    assert e_rand > 3.0 and e_rand > e_reg


def test_wpd_linear_path_scores_zero():
    wp = np.stack([np.arange(200), np.arange(200) * 2])
    result = WPDCalculator().calculate(
        {"wp": wp, "num_frames_cover": 200, "num_frames_origin": 400}
    )
    assert result["wpd_score"] == pytest.approx(0.0, abs=1e-9)


def test_wpd_wobbly_path_scores_positive():
    x = np.arange(400)
    y = x + np.round(10 * np.sin(x / 25.0)).astype(int)
    result = WPDCalculator(trim_seconds=1).calculate(
        {"wp": np.stack([x, np.clip(y, 0, 399)]),
         "num_frames_cover": 400, "num_frames_origin": 400}
    )
    assert result["wpd_score"] > 0.05


def test_evaluation_runner_and_cli(tmp_path):
    eval_dir = tmp_path / "songs"
    songs = []
    for i, jitter in enumerate((0.0, 0.05)):
        d = eval_dir / f"{i:03d}"
        d.mkdir(parents=True)
        write_midi(_notes_on_grid(jitter=jitter, seed=i), d / "human.mid")
        write_midi(_notes_on_grid(jitter=jitter / 2, seed=i + 9), d / "etude_d.mid")
        songs.append({"id": f"{i:03d}"})
    meta = eval_dir / "metadata.json"
    meta.write_text(json.dumps(songs))

    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(f"""
eval:
  eval_dir: {eval_dir}
  metadata_path: {meta}
paths:
  eval_output_dir: {tmp_path / 'out'}
""")
    config = load_config(cfg_yaml)
    runner = EvaluationRunner(config)
    df = runner.run(versions=["human", "etude_d"], metrics=["rgc", "ipe"])
    assert len(df) == 4
    assert {"song", "version", "rgc", "ipe"} <= set(df.columns)
    assert df["rgc"].notna().all()

    combined = ReportGenerator({"human": "Human"}).print_summary(df)
    assert isinstance(combined, pd.DataFrame)

    from evaluate import main as eval_main
    rc = eval_main(["--config", str(cfg_yaml), "--metrics", "rgc", "ipe",
                    "--versions", "human", "etude_d"])
    assert rc == 0
    assert (tmp_path / "out" / "evaluation_results.csv").exists()


def test_onset_f1():
    from etude_tpu.evaluation.metrics.onset_f1 import onset_f1

    ref = [{"onset": 0.5 * i, "pitch": 60 + i % 3, "offset": 0.5 * i + 0.2,
            "velocity": 80} for i in range(10)]
    # Perfect match.
    r = onset_f1(ref, ref)
    assert r["f1"] == 1.0 and r["n_match"] == 10
    # Shifted within tolerance.
    est = [dict(n, onset=n["onset"] + 0.03) for n in ref]
    assert onset_f1(ref, est)["f1"] == 1.0
    # Shifted beyond tolerance.
    est = [dict(n, onset=n["onset"] + 0.2) for n in ref]
    assert onset_f1(ref, est)["f1"] == 0.0
    # Wrong pitch fails when match_pitch, passes otherwise.
    est = [dict(n, pitch=n["pitch"] + 1) for n in ref]
    assert onset_f1(ref, est)["f1"] == 0.0
    assert onset_f1(ref, est, match_pitch=False)["f1"] == 1.0
    # Half missing → recall 0.5.
    r = onset_f1(ref, ref[:5])
    assert r["recall"] == 0.5 and r["precision"] == 1.0
    # Empty inputs.
    assert onset_f1([], ref)["f1"] == 0.0
