import numpy as np
import pytest

from etude_tpu.data.dataset import (
    EtudeDataset,
    LABEL_IGNORE_ID,
    calculate_bin_edges,
    compute_relative_attributes,
    extract_bar_features,
    split_ids_into_bars,
)
from etude_tpu.data.tokenizer import TinyREMITokenizer
from etude_tpu.data.vocab import Event, Vocab


def _make_vocab():
    v = Vocab()
    events = [Event("Bar", "BOS"), Event("Bar", "EOS")]
    for p in range(21, 109):
        events.append(Event("Note", p))
    for pos in range(33):
        events.append(Event("Pos", pos))
    for d in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32):
        events.append(Event("Duration", d))
    v.build_from_events([events])
    return v


def _bar(v, notes):
    """notes: list of (pos, pitch, dur)."""
    ids = [v.bar_bos_id]
    last_pos = None
    for pos, pitch, dur in notes:
        if pos != last_pos:
            ids.append(v.encode(f"Pos_{pos}"))
            last_pos = pos
        ids.append(v.encode(f"Note_{pitch}"))
        ids.append(v.encode(f"Duration_{dur}"))
    ids.append(v.bar_eos_id)
    return ids


@pytest.fixture(scope="module")
def vocab():
    return _make_vocab()


def test_bar_features(vocab):
    bar = _bar(vocab, [(0, 60, 4), (0, 64, 4), (16, 67, 2)])
    feats = extract_bar_features(bar, vocab)
    assert feats["note_count"] == 3
    assert feats["pos_event_count"] == 2
    assert feats["total_duration_in_16ths"] == 10
    assert feats["notes_by_position"][0] == [60, 64]


def test_relative_attributes(vocab):
    src = extract_bar_features(_bar(vocab, [(0, 60, 4), (16, 62, 4)]), vocab)
    tgt = extract_bar_features(
        _bar(vocab, [(0, 60, 8), (0, 64, 8), (16, 62, 8), (16, 65, 8)]), vocab
    )
    attrs = compute_relative_attributes(src, tgt)
    # tgt has 2 notes/pos vs src 1 → polyphony 2.0
    assert attrs["relative_polyphony"] == pytest.approx(2.0)
    # same pos count → rhythm 1.0
    assert attrs["relative_rhythmic_intensity"] == pytest.approx(1.0)
    # tgt avg dur 8 vs src 4 → sustain 2.0
    assert attrs["relative_note_sustain"] == pytest.approx(2.0)
    # pos 0: tgt {60,64}, src has pc {0} → overlap 1/2; pos 16 same → 1/2
    assert attrs["pitch_overlap_ratio"] == pytest.approx(0.5)


def test_pitch_overlap_edge_cases(vocab):
    empty = extract_bar_features(_bar(vocab, []), vocab)
    src = extract_bar_features(_bar(vocab, [(0, 60, 4)]), vocab)
    # No positions at all → 0.0
    assert compute_relative_attributes(empty, empty)["pitch_overlap_ratio"] == 0.0
    # src-only position → ratio contribution 0.
    attrs = compute_relative_attributes(src, empty)
    assert attrs["pitch_overlap_ratio"] == 0.0


def test_bin_edges_and_digitize():
    attrs = [{"relative_polyphony": float(x),
              "relative_rhythmic_intensity": 1.0,
              "relative_note_sustain": 1.0,
              "pitch_overlap_ratio": 0.5} for x in np.linspace(0, 2, 100)]
    edges = calculate_bin_edges(attrs)
    mean, std = 1.0, np.std(np.linspace(0, 2, 100))
    np.testing.assert_allclose(
        edges["relative_polyphony"], [mean - 0.5 * std, mean + 0.5 * std], rtol=1e-6
    )
    # Constant attribute → epsilon edges.
    assert len(edges["relative_rhythmic_intensity"]) == 2


def _write_song(tmp_path, vocab, name, n_bars=6):
    d = tmp_path / name
    d.mkdir(parents=True)
    src_ids, tgt_ids = [], []
    for i in range(n_bars):
        src_ids += _bar(vocab, [(0, 60 + i, 4), (16, 64, 2)])
        tgt_ids += _bar(vocab, [(0, 60 + i, 8), (8, 67, 4), (16, 64, 2)])
    np.save(d / f"{name}_src.npy", np.asarray(src_ids, np.int32))
    np.save(d / f"{name}_tgt.npy", np.asarray(tgt_ids, np.int32))


def test_dataset_end_to_end(tmp_path, vocab):
    for i in range(3):
        _write_song(tmp_path, vocab, f"{i:04d}")
    ds = EtudeDataset(tmp_path, vocab, max_seq_len=256)
    assert len(ds.songs) == 3
    assert len(ds) > 0

    item = ds[4]
    n = len(item["input_ids"])
    assert len(item["labels"]) == n
    assert len(item["class_ids"]) == n
    assert "polyphony_bin_ids" in item and "pitch_overlap_bin_ids" in item

    # Labels: ignore everywhere except current-Y next-token targets.
    labels = np.asarray(ds._full_sample(0, 4)["labels"])
    valid = labels != LABEL_IGNORE_ID
    assert valid.sum() > 0
    sample = ds._full_sample(0, 4)
    toks = np.asarray(sample["input_ids"])
    # The supervised targets are the current Y bar shifted by one.
    tgt_bar = ds.songs[0]["bars"][4]["tgt_bar_ids"]
    y_len = len(tgt_bar)
    np.testing.assert_array_equal(labels[-y_len:-1], tgt_bar[1:])
    assert labels[-1] == LABEL_IGNORE_ID
    np.testing.assert_array_equal(toks[-y_len:], tgt_bar)


def test_dataset_batches_fixed_shape(tmp_path, vocab):
    for i in range(2):
        _write_song(tmp_path, vocab, f"{i:04d}")
    ds = EtudeDataset(tmp_path, vocab, max_seq_len=128)
    batches = list(ds.batches(batch_size=4, shuffle=True, seed=0, drop_last=False))
    assert len(batches) >= 1
    for batch in batches:
        assert batch["input_ids"].shape == (4, 128)
        assert batch["attention_mask"].shape == (4, 128)
        assert set(batch.keys()) == {
            "input_ids", "class_ids", "labels", "attention_mask",
            "polyphony_bin_ids", "rhythm_intensity_bin_ids",
            "sustain_bin_ids", "pitch_overlap_bin_ids",
        }
    # Padding rows/cols are masked.
    b0 = batches[0]
    assert np.all(b0["labels"][b0["attention_mask"] == 0] == LABEL_IGNORE_ID)


def _write_varied_song(tmp_path, vocab, name, n_bars=8):
    """Target density/duration varies per bar so attribute bins span 0..2."""
    d = tmp_path / name
    d.mkdir(parents=True)
    src_ids, tgt_ids = [], []
    for i in range(n_bars):
        src_ids += _bar(vocab, [(0, 60 + i, 4), (16, 64, 2)])
        tgt_notes = [(0, 60 + i, 1 + 4 * (i % 3))]
        tgt_notes += [(8 * k, 50 + 3 * k + i, 2) for k in range(1, 1 + i % 4)]
        tgt_ids += _bar(vocab, tgt_notes)
    np.save(d / f"{name}_src.npy", np.asarray(src_ids, np.int32))
    np.save(d / f"{name}_tgt.npy", np.asarray(tgt_ids, np.int32))


def test_dataset_attr_dropout(tmp_path, vocab):
    for i in range(2):
        _write_varied_song(tmp_path, vocab, f"{i:04d}")
    bin_keys = ["polyphony_bin_ids", "rhythm_intensity_bin_ids",
                "sustain_bin_ids", "pitch_overlap_bin_ids"]

    # dropout=1.0: every valid position carries the neutral bin 1.
    ds = EtudeDataset(tmp_path, vocab, max_seq_len=128, attr_dropout=1.0)
    for batch in ds.batches(batch_size=4, shuffle=True, seed=0,
                            drop_last=False):
        mask = batch["attention_mask"] == 1
        for key in bin_keys:
            assert np.all(batch[key][mask] == 1)

    # dropout=0.0 must keep the oracle bins bit-identical.
    ds0 = EtudeDataset(tmp_path, vocab, max_seq_len=128, attr_dropout=0.0)
    ref = EtudeDataset(tmp_path, vocab, max_seq_len=128)
    for got, want in zip(
        ds0.batches(batch_size=4, shuffle=True, seed=0, drop_last=False),
        ref.batches(batch_size=4, shuffle=True, seed=0, drop_last=False),
    ):
        for key in bin_keys:
            np.testing.assert_array_equal(got[key], want[key])

    # Intermediate dropout affects some chunks, not all (seeded).
    ds_half = EtudeDataset(tmp_path, vocab, max_seq_len=128, attr_dropout=0.5)
    dropped, kept = 0, 0
    for got, want in zip(
        ds_half.batches(batch_size=4, shuffle=True, seed=0, drop_last=False),
        ref.batches(batch_size=4, shuffle=True, seed=0, drop_last=False),
    ):
        mask = got["attention_mask"] == 1
        for b in range(mask.shape[0]):
            row = mask[b]
            if not row.any():
                continue
            same = all(
                np.array_equal(got[k][b][row], want[k][b][row])
                for k in bin_keys
            )
            neutral = all(np.all(got[k][b][row] == 1) for k in bin_keys)
            if neutral and not same:
                dropped += 1
            elif same:
                kept += 1
    assert dropped > 0 and kept > 0


def test_split_ids_closes_open_bar(vocab):
    BOS, EOS = vocab.bar_bos_id, vocab.bar_eos_id
    n = vocab.encode("Note_60")
    bars = split_ids_into_bars([BOS, n, n, BOS, n, EOS], BOS, EOS)
    assert len(bars) == 2
    assert bars[0] == [BOS, n, n, EOS]


def test_dataset_json_format(tmp_path, vocab):
    import json as _json

    d = tmp_path / "0001"
    d.mkdir()
    src = _bar(vocab, [(0, 60, 4)]) * 6
    tgt = _bar(vocab, [(0, 64, 8)]) * 6
    (d / "0001_src.json").write_text(_json.dumps(src))
    (d / "0001_tgt.json").write_text(_json.dumps(tgt))
    ds = EtudeDataset(tmp_path, vocab, max_seq_len=64,
                      src_suffix="_src.json", tgt_suffix="_tgt.json",
                      data_format="json")
    assert len(ds.songs) == 1 and len(ds) > 0


def test_dataset_empty_dir(tmp_path, vocab):
    ds = EtudeDataset(tmp_path / "nothing", vocab, max_seq_len=64)
    assert len(ds) == 0
    assert list(ds.batches(batch_size=4)) == []


def test_dataset_dagger_history(tmp_path, vocab):
    """With NNNN_hist.npy present and hist_suffix set, history Y bars come
    from the rollout file while the current-bar target (labels) and the
    attribute bins stay the teacher's."""
    _write_song(tmp_path, vocab, "0000")
    hist_ids = []
    for i in range(6):
        hist_ids += _bar(vocab, [(0, 40 + i, 2)])  # distinct from teacher
    np.save(tmp_path / "0000" / "0000_hist.npy",
            np.asarray(hist_ids, np.int32))

    base = EtudeDataset(tmp_path, vocab, max_seq_len=512, hist_suffix=None)
    ds = EtudeDataset(tmp_path, vocab, max_seq_len=512,
                      hist_suffix="_hist.npy")

    # Attribute edges identical (attrs always from teacher pairs).
    for k, e in base.attribute_bin_edges.items():
        np.testing.assert_array_equal(e, ds.attribute_bin_edges[k])

    bar_idx = 4
    s_hist = ds._full_sample(0, bar_idx)
    s_base = base._full_sample(0, bar_idx)

    # Labels still supervise the TEACHER bar.
    tgt_bar = ds.songs[0]["bars"][bar_idx]["tgt_bar_ids"]
    labels = np.asarray(s_hist["labels"])
    np.testing.assert_array_equal(labels[-len(tgt_bar):-1], tgt_bar[1:])

    # History region contains the rollout bars (each X is followed by the
    # rollout Y, not the teacher Y), and differs from the teacher sample.
    hist_bars = split_ids_into_bars(hist_ids, vocab.bar_bos_id, vocab.bar_eos_id)
    joined = ",".join(map(str, s_hist["input_ids"]))
    for hb in hist_bars[:bar_idx][-4:]:
        assert ",".join(map(str, hb)) in joined
    assert s_hist["input_ids"] != s_base["input_ids"]

    # A mismatched rollout bar count is ignored (falls back to teacher).
    np.save(tmp_path / "0000" / "0000_hist.npy",
            np.asarray(hist_ids[: len(hist_ids) // 2], np.int32))
    ds2 = EtudeDataset(tmp_path, vocab, max_seq_len=512,
                       hist_suffix="_hist.npy")
    s2 = ds2._full_sample(0, bar_idx)
    assert s2["input_ids"] == s_base["input_ids"]


def test_dataset_dagger_history_prob_mixing(tmp_path, vocab):
    """dagger_history_prob < 1 mixes rollout-history and teacher-history
    chunks within one epoch: p=0 reproduces the teacher stream exactly,
    p=1 the rollout stream, and p=0.5 yields both kinds."""
    _write_song(tmp_path, vocab, "0000")
    hist_ids = []
    for i in range(6):
        hist_ids += _bar(vocab, [(0, 40 + i, 2)])
    np.save(tmp_path / "0000" / "0000_hist.npy",
            np.asarray(hist_ids, np.int32))

    base = EtudeDataset(tmp_path, vocab, max_seq_len=512, hist_suffix=None)

    def streams(prob, seed=0):
        ds = EtudeDataset(tmp_path, vocab, max_seq_len=512,
                          hist_suffix="_hist.npy",
                          dagger_history_prob=prob)
        return [b["input_ids"] for b in ds.batches(
            batch_size=1, shuffle=False, seed=seed, drop_last=False)]

    teacher = [b["input_ids"] for b in base.batches(
        batch_size=1, shuffle=False, seed=0, drop_last=False)]
    all_teacher = streams(0.0)
    all_hist = streams(1.0)
    for got, want in zip(all_teacher, teacher):
        np.testing.assert_array_equal(got, want)
    # Later bars have rollout history, so p=1 differs from teacher.
    assert any(not np.array_equal(a, b) for a, b in zip(all_hist, teacher))

    mixed = streams(0.5)
    n_teacher = sum(np.array_equal(m, t) for m, t in zip(mixed, teacher))
    n_hist = sum(np.array_equal(m, h) for m, h in zip(mixed, all_hist))
    # Every chunk is one of the two vintages; both kinds appear. (Early
    # bars with no history are identical in both, counted in both sums.)
    assert n_teacher + n_hist >= len(mixed)
    assert any(np.array_equal(m, h) and not np.array_equal(m, t)
               for m, h, t in zip(mixed, all_hist, teacher))
    assert any(np.array_equal(m, t) and not np.array_equal(m, h)
               for m, h, t in zip(mixed, all_hist, teacher))
