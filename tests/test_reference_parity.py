"""Metric parity against the reference's shipped evaluation corpus.

The reference repo ships its full 100-song corpus (docs/songs: 7 rendered
MIDI versions + wp.json alignment caches per song) and the paper's Table I
numbers. Running OUR metric implementations (own MIDI parser, own WPD/RGC/
IPE code) over that corpus must reproduce those numbers — validating the
entire metric stack end to end. Skipped when the corpus is not mounted.
"""

from pathlib import Path

import numpy as np
import pytest

REF_SONGS = Path("/root/reference/docs/songs")

pytestmark = pytest.mark.skipif(
    not (REF_SONGS / "metadata.json").exists(),
    reason="reference corpus not available",
)

# Paper Table I (arXiv 2509.16522) — means over the 100-song corpus.
PAPER_TABLE = {
    # version: (wpd, rgc, ipe)
    "human": (0.49, 0.042, 10.13),
    "etude_d_d": (0.21, 0.020, 9.02),
    "etude_d": (0.23, 0.026, 9.11),
    "etude_e": (0.12, 0.028, 10.62),
    "picogen": (1.00, 0.059, 7.97),
    "amtapc": (0.09, 0.114, 10.69),
    "music2midi": (0.18, 0.160, 8.94),
}


@pytest.fixture(scope="module")
def corpus_results():
    from etude_tpu.config import load_config
    from etude_tpu.evaluation.runner import EvaluationRunner

    config = load_config(None, overrides={
        "eval": {
            "eval_dir": str(REF_SONGS),
            "metadata_path": str(REF_SONGS / "metadata.json"),
        }
    })
    # Runs the FULL 100-song reference corpus (metadata.json) — the paper's
    # Table I numbers are full-corpus means, so the subset shortcut was
    # removed once the run proved fast enough.
    runner = EvaluationRunner(config)
    df = runner.run(metrics=["rgc", "ipe", "wpd"])
    return df.groupby("version")[["wpd", "rgc", "ipe"]].mean()


def test_metric_means_match_paper(corpus_results):
    for version, (wpd, rgc, ipe) in PAPER_TABLE.items():
        row = corpus_results.loc[version]
        assert row["rgc"] == pytest.approx(rgc, abs=0.004), (version, "rgc")
        assert row["ipe"] == pytest.approx(ipe, abs=0.08), (version, "ipe")
        assert row["wpd"] == pytest.approx(wpd, abs=0.09), (version, "wpd")


def test_rgc_per_song_deterministic():
    from etude_tpu.evaluation.metrics import RGCCalculator

    song = REF_SONGS / "CPOP01" / "human.mid"
    a = RGCCalculator(top_k=8).calculate(song)
    b = RGCCalculator(top_k=8).calculate(song)
    assert a == b and "rgc_score" in a
