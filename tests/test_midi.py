import pytest

from etude_tpu.utils.midi import read_midi_notes, write_midi


def test_midi_roundtrip(tmp_path):
    notes = [
        {"pitch": 60, "onset": 0.0, "offset": 0.5, "velocity": 80},
        {"pitch": 64, "onset": 0.0, "offset": 0.5, "velocity": 90},
        {"pitch": 67, "onset": 1.25, "offset": 2.0, "velocity": 100},
    ]
    path = tmp_path / "out.mid"
    write_midi(notes, path)
    back = read_midi_notes(path)
    assert len(back) == 3
    for orig, rec in zip(notes, back):
        assert rec["pitch"] == orig["pitch"]
        assert rec["velocity"] == orig["velocity"]
        assert rec["onset"] == pytest.approx(orig["onset"], abs=2e-3)
        assert rec["offset"] == pytest.approx(orig["offset"], abs=2e-3)


def test_midi_same_pitch_retrigger(tmp_path):
    notes = [
        {"pitch": 60, "onset": 0.0, "offset": 1.0, "velocity": 80},
        {"pitch": 60, "onset": 1.0, "offset": 2.0, "velocity": 80},
    ]
    path = tmp_path / "re.mid"
    write_midi(notes, path)
    back = read_midi_notes(path)
    assert len(back) == 2
    assert back[0]["offset"] == pytest.approx(1.0, abs=2e-3)
    assert back[1]["onset"] == pytest.approx(1.0, abs=2e-3)


def test_midi_write_deterministic(tmp_path):
    notes = [{"pitch": 60 + i, "onset": i * 0.1, "offset": i * 0.1 + 0.2,
              "velocity": 64} for i in range(10)]
    p1, p2 = tmp_path / "a.mid", tmp_path / "b.mid"
    write_midi(notes, p1)
    write_midi(notes, p2)
    assert p1.read_bytes() == p2.read_bytes()


def test_midi_clips_invalid_pitch(tmp_path):
    notes = [{"pitch": 200, "onset": 0.0, "offset": 1.0, "velocity": 80},
             {"pitch": 60, "onset": 0.0, "offset": 1.0, "velocity": 80}]
    path = tmp_path / "c.mid"
    write_midi(notes, path)
    back = read_midi_notes(path)
    assert len(back) == 1 and back[0]["pitch"] == 60
