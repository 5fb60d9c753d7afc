import json

from etude_tpu.data.vocab import Event, Vocab, PAD_TOKEN, UNK_TOKEN, BOS_TOKEN, EOS_TOKEN


def test_special_token_ids():
    v = Vocab()
    assert v.encode(PAD_TOKEN) == 0
    assert v.encode(UNK_TOKEN) == 1
    assert v.encode(BOS_TOKEN) == 2
    assert v.encode(EOS_TOKEN) == 3
    assert v.pad_id == 0


def test_build_encode_decode_roundtrip():
    v = Vocab()
    events = [[Event("Bar", "BOS"), Event("Pos", 0), Event("Note", 60),
               Event("Duration", 4), Event("Bar", "EOS")]]
    v.build_from_events(events)
    ids = v.encode_sequence(events[0])
    assert len(set(ids)) == 5
    back = v.decode_sequence_to_events(ids)
    assert [str(e) for e in back] == [str(e) for e in events[0]]
    # Numeric values decode to ints.
    assert back[2].value == 60 and isinstance(back[2].value, int)


def test_unknown_falls_back_to_unk():
    v = Vocab()
    assert v.encode("Note_999") == v.encode(UNK_TOKEN)


def test_save_load_json_contract(tmp_path):
    v = Vocab()
    v.build_from_events([[Event("Bar", "BOS"), Event("Bar", "EOS"), Event("Note", 64)]])
    path = tmp_path / "vocab.json"
    v.save(path)
    data = json.loads(path.read_text())
    assert set(data.keys()) == {"token_to_id", "special_tokens"}
    v2 = Vocab.load(path)
    assert v2.token_to_id == v.token_to_id
    assert v2.bar_bos_id == v.bar_bos_id
    assert v2.bar_eos_id == v.bar_eos_id
    assert len(v2) == len(v)


def test_decode_sequence_skips_pad():
    v = Vocab()
    v.build_from_events([[Event("Note", 60)]])
    ids = [0, v.encode("Note_60"), 0]
    assert v.decode_sequence(ids) == ["Note_60"]
