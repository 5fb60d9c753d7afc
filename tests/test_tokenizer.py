import numpy as np
import pytest

from etude_tpu.data.tokenizer import (
    TinyREMITokenizer,
    build_measure_grid,
    link_grace_notes,
    quantize_position,
    snap_duration_to_16ths,
    split_sequence_into_bars,
)
from etude_tpu.data.vocab import Vocab


def test_measure_grid_has_pickup_and_trailing(tempo_data_4_4):
    measures = build_measure_grid(tempo_data_4_4)
    # 8 downbeats + pickup + trailing = 10 measures
    assert len(measures) == 10
    assert measures[0].start == pytest.approx(0.0)  # 2.0 - 4*(60/120)
    assert measures[0].end == pytest.approx(2.0)
    assert measures[-1].start == pytest.approx(18.0)
    assert measures[-1].end == pytest.approx(20.0)
    # Interior measures are contiguous.
    for a, b in zip(measures[:-1], measures[1:]):
        assert a.end == pytest.approx(b.start)


def test_quantize_position_slots():
    # 2-second 4/4 measure starting at 0: beats at 0, 0.5, 1.0, 1.5.
    assert quantize_position(0.0, 0.0, 2.0, 4)[0] == 0
    assert quantize_position(0.5, 0.0, 2.0, 4)[0] == 8
    assert quantize_position(0.25, 0.0, 2.0, 4, allow_triplet=False)[0] == 4
    assert quantize_position(0.125, 0.0, 2.0, 4, allow_triplet=False)[0] == 2
    # Onset at/near the measure end rolls into the next measure.
    pos, rolls = quantize_position(1.99, 0.0, 2.0, 4)
    assert rolls and pos == 32


def test_snap_duration():
    # At 120 BPM a 16th is 0.125 s.
    assert snap_duration_to_16ths(0.125, 120.0) == 1
    assert snap_duration_to_16ths(0.5, 120.0) == 4
    assert snap_duration_to_16ths(10.0, 120.0) == 32
    assert snap_duration_to_16ths(-1.0, 120.0) == 1


def test_encode_structure(tempo_data_4_4):
    tok = TinyREMITokenizer(tempo_data=tempo_data_4_4)
    notes = [
        {"pitch": 60, "onset": 2.0, "offset": 2.5, "velocity": 80},
        {"pitch": 64, "onset": 2.0, "offset": 2.5, "velocity": 80},
        {"pitch": 67, "onset": 3.0, "offset": 3.25, "velocity": 80},
    ]
    events = tok.encode(notes)
    tokens = [str(e) for e in events]
    # One BOS/EOS pair per measure.
    assert tokens.count("Bar_BOS") == 10
    assert tokens.count("Bar_EOS") == 10
    # First sounded measure: chord at pos 0 (pitch-descending), then pos 16 (beat 2).
    i = tokens.index("Pos_0")
    assert tokens[i:i + 8] == [
        "Pos_0", "Note_64", "Duration_4", "Note_60", "Duration_4",
        "Pos_16", "Note_67", "Duration_2",
    ]


def test_encode_dedups_same_pitch(tempo_data_4_4):
    tok = TinyREMITokenizer(tempo_data=tempo_data_4_4)
    notes = [
        {"pitch": 60, "onset": 2.0, "offset": 2.5, "velocity": 80},
        {"pitch": 60, "onset": 2.01, "offset": 2.3, "velocity": 70},
    ]
    events = tok.encode(notes)
    tokens = [str(e) for e in events]
    assert tokens.count("Note_60") == 1


def test_grace_note_linking():
    notes = [
        {"pitch": 61, "onset": 1.00, "offset": 1.05, "velocity": 70},
        {"pitch": 60, "onset": 1.05, "offset": 1.50, "velocity": 80},
    ]
    linked = link_grace_notes(notes)
    assert len(linked) == 1
    assert linked[0]["pitch"] == 60
    assert linked[0]["grace_info"] == 1  # grace above main


def test_grace_note_requires_semitone():
    notes = [
        {"pitch": 62, "onset": 1.00, "offset": 1.05, "velocity": 70},
        {"pitch": 60, "onset": 1.05, "offset": 1.50, "velocity": 80},
    ]
    linked = link_grace_notes(notes)
    assert len(linked) == 2


def test_roundtrip_onsets_on_grid(tempo_data_4_4):
    tok = TinyREMITokenizer(tempo_data=tempo_data_4_4)
    notes = [
        {"pitch": 60, "onset": 2.0, "offset": 2.5, "velocity": 80},
        {"pitch": 67, "onset": 3.0, "offset": 3.5, "velocity": 80},
        {"pitch": 72, "onset": 5.5, "offset": 6.0, "velocity": 80},
    ]
    events = tok.encode(notes)
    tok2 = TinyREMITokenizer(tempo_data=tempo_data_4_4)
    decoded = tok2.decode_to_notes(events)
    decoded_main = [n for n in decoded if not n.get("is_grace_note")]
    assert len(decoded_main) == 3
    for orig, dec in zip(sorted(notes, key=lambda n: n["onset"]), decoded_main):
        assert dec["pitch"] == orig["pitch"]
        assert dec["onset"] == pytest.approx(orig["onset"], abs=1e-6)


def test_decode_velocity_from_volume_contour(tempo_data_4_4):
    tok = TinyREMITokenizer(tempo_data=tempo_data_4_4)
    events = tok.encode([{"pitch": 60, "onset": 2.0, "offset": 2.5, "velocity": 80}])
    # Loud contour (1.0 everywhere) → base velocity 100.
    contour = np.ones(20 * 25)
    decoded = TinyREMITokenizer(tempo_data=tempo_data_4_4).decode_to_notes(
        events, volume_contour=contour
    )
    assert decoded[0]["velocity"] == 100
    # Silent contour → base velocity 60.
    decoded = TinyREMITokenizer(tempo_data=tempo_data_4_4).decode_to_notes(
        events, volume_contour=np.zeros(20 * 25)
    )
    assert decoded[0]["velocity"] == 60


def test_split_sequence_into_bars():
    BOS, EOS = 10, 11
    seq = [BOS, 1, 2, EOS, BOS, 3, EOS, 5, BOS, 4]
    bars = split_sequence_into_bars(seq, BOS, EOS)
    assert bars == [[BOS, 1, 2, EOS], [BOS, 3, EOS], [BOS, 4, EOS]]


def test_split_handles_malformed():
    BOS, EOS = 10, 11
    assert split_sequence_into_bars([EOS, 1, 2], BOS, EOS) == []
    assert split_sequence_into_bars([], BOS, EOS) == []


def test_full_vocab_pipeline(tempo_data_4_4):
    tok = TinyREMITokenizer(tempo_data=tempo_data_4_4)
    events = tok.encode([
        {"pitch": 60, "onset": 2.0, "offset": 2.5, "velocity": 80},
        {"pitch": 64, "onset": 4.0, "offset": 4.5, "velocity": 80},
    ])
    vocab = Vocab()
    vocab.build_from_events([events])
    ids = vocab.encode_sequence(events)
    bars = split_sequence_into_bars(ids, vocab.bar_bos_id, vocab.bar_eos_id)
    assert len(bars) == 10
    back = vocab.decode_sequence_to_events(ids)
    assert [str(e) for e in back] == [str(e) for e in events]
