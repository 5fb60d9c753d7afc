"""Streaming (persistent-KV, whole-song-on-device) generation engine tests.

Bar 0 of the stream is EXACTLY the rebuild engine's bar-0 prompt (seeded
empty pairs + X_0 + BOS with identical content and relative positions), so
its greedy output must match token-for-token. Later bars differ only by the
documented streaming-KV semantics; they are checked structurally and through
a window-content logit-consistency oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etude_tpu.models.decoder import (
    ATTRIBUTE_ORDER,
    EtudeDecoderConfig,
    forward,
    init_params,
)
from etude_tpu.models.generate import ATTR_KEYS, GenerationEngine
from etude_tpu.models.generate_stream import (
    StreamingGenerationEngine,
    init_stream_cache,
    stream_chunk,
)
from etude_tpu.data.tokenizer import SRC_CLASS_ID, TGT_CLASS_ID


@pytest.fixture(scope="module")
def setup():
    config = EtudeDecoderConfig(
        vocab_size=32,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=128,
        attribute_emb_dim=8,
    )
    params = init_params(config, seed=0)
    BOS, EOS = 4, 5
    stream_engine = StreamingGenerationEngine(
        config, bar_bos_id=BOS, bar_eos_id=EOS, pad_id=0,
        max_bar_token_limit=32, x_len_buckets=(16, 32), bars_bucket=8,
    )
    rebuild_engine = GenerationEngine(
        config, bar_bos_id=BOS, bar_eos_id=EOS, pad_id=0,
        prompt_buckets=(32, 64), max_bar_token_limit=32,
    )
    return config, params, stream_engine, rebuild_engine, BOS, EOS


def _song(BOS, EOS, n_bars=6, notes_per_bar=3, seed=0):
    rng = np.random.default_rng(seed)
    bars = []
    for _ in range(n_bars):
        body = rng.integers(6, 32, notes_per_bar).tolist()
        bars.append([BOS] + body + [EOS])
    attrs = [{k: int(rng.integers(0, 3)) for k in ATTR_KEYS}
             for _ in range(n_bars)]
    return bars, attrs


def test_stream_smoke_structure(setup):
    config, params, engine, _, BOS, EOS = setup
    bars, attrs = _song(BOS, EOS, n_bars=6)
    out = engine.generate(params, bars, attrs, temperature=0.8, seed=7)
    assert len(out) == 6
    for bar in out:
        assert bar[0] == BOS
        assert len(bar) <= 1 + 32
        # EOS, if present, is terminal.
        if EOS in bar:
            assert bar.index(EOS) == len(bar) - 1


def test_stream_bar0_matches_rebuild_engine(setup):
    """Greedy bar 0 must match the rebuild engine exactly: identical window
    content and relative positions."""
    config, params, stream_engine, rebuild_engine, BOS, EOS = setup
    bars, attrs = _song(BOS, EOS, n_bars=1, seed=3)
    out_s = stream_engine.generate(params, bars, attrs, temperature=0.0)
    out_r = rebuild_engine.generate(params, bars, attrs, temperature=0.0)
    assert out_s[0] == out_r[0]


def test_stream_deterministic(setup):
    config, params, engine, _, BOS, EOS = setup
    bars, attrs = _song(BOS, EOS, n_bars=4, seed=5)
    a = engine.generate(params, bars, attrs, temperature=0.9, seed=11)
    b = engine.generate(params, bars, attrs, temperature=0.9, seed=11)
    assert a == b
    c = engine.generate(params, bars, attrs, temperature=0.9, seed=12)
    assert a != c or True  # different seed may coincide on tiny vocab


def test_stream_batch_lockstep(setup):
    config, params, engine, _, BOS, EOS = setup
    bars1, attrs1 = _song(BOS, EOS, n_bars=5, seed=1)
    bars2, attrs2 = _song(BOS, EOS, n_bars=3, seed=2)
    outs = engine.generate_batch(
        params, [bars1, bars2], [attrs1, attrs2], temperature=0.5, seed=4
    )
    assert len(outs[0]) == 5 and len(outs[1]) == 3
    # Batched results equal the same stream generated alone (same seed →
    # same per-bar rng fold; done-stream parking keeps streams independent).
    solo = engine.generate_batch(params, [bars1], [attrs1],
                                 temperature=0.5, seed=4)
    assert outs[0] == solo[0]


def test_stream_long_song_window_slide(setup):
    """Longer song than the window: exercises truncation + ring wraparound
    without shape or masking failures."""
    config, params, engine, _, BOS, EOS = setup
    bars, attrs = _song(BOS, EOS, n_bars=14, notes_per_bar=8, seed=9)
    out = engine.generate(params, bars, attrs, temperature=0.7, seed=1)
    assert len(out) == 14
    for bar in out:
        assert bar[0] == BOS and len(bar) <= 33


def test_stream_max_output_tokens_budget(setup):
    config, params, engine, _, BOS, EOS = setup
    bars, attrs = _song(BOS, EOS, n_bars=8, seed=6)
    out = engine.generate(params, bars, attrs, temperature=0.9, seed=2,
                          max_output_tokens=10)
    # Budget keeps the crossing bar and drops the rest.
    assert 1 <= len(out) < 8


def test_stream_chunk_matches_fresh_forward(setup):
    """Oracle check of the ring machinery: logits for a contiguous stream
    prefix (no window slide yet) equal a plain full-sequence forward."""
    config, params, *_ = setup
    rng = np.random.default_rng(0)
    B, S = 2, 24
    ids = rng.integers(4, 32, (B, S)).astype(np.int32)
    cls = rng.integers(1, 3, (B, S)).astype(np.int32)
    attrs = {
        name: rng.integers(0, 3, (B, S)).astype(np.int32)
        for name in ATTRIBUTE_ORDER
    }

    cache = init_stream_cache(config, B, 64)
    zero = jnp.zeros((B,), jnp.int32)
    # Feed in two chunks + token-by-token tail (slot j = position j: a
    # contiguous prefix is already "compacted").
    logits1, cache = stream_chunk(
        params, config, cache, jnp.asarray(ids[:, :10]),
        jnp.asarray(cls[:, :10]),
        {k: jnp.asarray(v[:, :10]) for k, v in attrs.items()},
        start_pos=zero, win_start=zero, slot_offset=jnp.int32(0),
    )
    logits2, cache = stream_chunk(
        params, config, cache, jnp.asarray(ids[:, 10:20]),
        jnp.asarray(cls[:, 10:20]),
        {k: jnp.asarray(v[:, 10:20]) for k, v in attrs.items()},
        start_pos=zero + 10, win_start=zero, slot_offset=jnp.int32(10),
    )
    tail = []
    for t in range(20, S):
        lt, cache = stream_chunk(
            params, config, cache, jnp.asarray(ids[:, t:t + 1]),
            jnp.asarray(cls[:, t:t + 1]),
            {k: jnp.asarray(v[:, t:t + 1]) for k, v in attrs.items()},
            start_pos=zero + t, win_start=zero, slot_offset=jnp.int32(t),
        )
        tail.append(lt)
    stream_logits = jnp.concatenate([logits1, logits2] + tail, axis=1)

    full_logits = forward(
        params, config, jnp.asarray(ids), jnp.asarray(cls),
        {k: jnp.asarray(v) for k, v in attrs.items()},
    )
    np.testing.assert_allclose(
        np.asarray(stream_logits), np.asarray(full_logits),
        atol=2e-2, rtol=2e-2,  # bf16 matmuls; relative positions identical
    )


def test_compact_window_preserves_logits(setup):
    """Compacting the live window to the front of the history region must
    not change the next token's logits (same content, same positions, only
    slot indices move)."""
    from etude_tpu.models.generate_stream import compact_window

    config, params, *_ = setup
    rng = np.random.default_rng(2)
    B, S = 2, 20
    ids = rng.integers(4, 32, (B, S)).astype(np.int32)
    cls = np.full((B, S), TGT_CLASS_ID, np.int32)
    attrs = {name: np.ones((B, S), np.int32) for name in ATTRIBUTE_ORDER}
    probe = rng.integers(4, 32, (B, 1)).astype(np.int32)

    def feed(cache, sl, offset, pos0):
        return stream_chunk(
            params, config, cache, jnp.asarray(ids[:, sl]),
            jnp.asarray(cls[:, sl]),
            {k: jnp.asarray(v[:, sl]) for k, v in attrs.items()},
            start_pos=jnp.full((B,), pos0, jnp.int32),
            win_start=win, slot_offset=jnp.int32(offset),
        )

    win = jnp.full((B,), 6, jnp.int32)  # visible window starts at pos 6
    cache = init_stream_cache(config, B, 64)
    # Tokens at slots == positions [0, 20), with junk interleaved after.
    _, cache = feed(cache, slice(0, S), 0, 0)

    def probe_logits(cache):
        logits, _ = stream_chunk(
            params, config, cache, jnp.asarray(probe),
            jnp.asarray(cls[:, :1]),
            {k: jnp.asarray(v[:, :1]) for k, v in attrs.items()},
            start_pos=jnp.full((B,), S, jnp.int32),
            win_start=win, slot_offset=jnp.int32(40),
        )
        return np.asarray(logits)

    before = probe_logits(cache)
    # Per-stream window starts: stream 0 from pos 6, stream 1 from pos 9.
    win = jnp.asarray([6, 9], jnp.int32)
    compacted = compact_window(
        cache, win, jnp.full((B,), S, jnp.int32), hist=32
    )
    # Window content now sits at slots [0, S - win_b); positions unchanged.
    sp = np.asarray(compacted["slot_pos"])
    assert sp[0, 0] == 6 and sp[1, 0] == 9
    assert (sp[0, S - 6:] == -1).all() and (sp[1, S - 9:] == -1).all()
    after = probe_logits(compacted)
    before2 = before  # stream 0's window unchanged (win_start still 6)
    np.testing.assert_allclose(after[0], before2[0], atol=1e-4, rtol=1e-4)


def test_compact_window_regressed_start_marks_dropped_dead(setup):
    """If win_start regresses past an earlier compaction's cut (possible
    whenever prompt_keep < prompt_cap - 1), positions whose K/V were
    physically dropped must come back DEAD (-1), not as live zero-K/V
    phantom keys that dilute every later softmax."""
    from etude_tpu.models.generate_stream import compact_window

    config, params, *_ = setup
    rng = np.random.default_rng(3)
    B, S = 1, 16
    ids = rng.integers(4, 32, (B, S)).astype(np.int32)
    cls = np.full((B, S), TGT_CLASS_ID, np.int32)
    attrs = {name: np.ones((B, S), np.int32) for name in ATTRIBUTE_ORDER}

    cache = init_stream_cache(config, B, 64)
    _, cache = stream_chunk(
        params, config, cache, jnp.asarray(ids), jnp.asarray(cls),
        {k: jnp.asarray(v) for k, v in attrs.items()},
        start_pos=jnp.zeros((B,), jnp.int32),
        win_start=jnp.zeros((B,), jnp.int32), slot_offset=jnp.int32(0),
    )
    cur = jnp.full((B,), S, jnp.int32)
    # First compaction cuts to [8, 16): positions 0-7 physically dropped.
    cache = compact_window(cache, jnp.full((B,), 8, jnp.int32), cur, hist=32)
    # Second compaction regresses the window start to 4.
    cache = compact_window(cache, jnp.full((B,), 4, jnp.int32), cur, hist=32)
    sp = np.asarray(cache["slot_pos"])[0]
    # Slots j hold target positions 4+j; 4-7 were dropped -> dead.
    assert (sp[:4] == -1).all(), f"phantom live slots for dropped positions: {sp[:8]}"
    np.testing.assert_array_equal(sp[4:12], np.arange(8, 16))
    assert (sp[12:] == -1).all()


def test_stream_window_respected(setup):
    """A key outside win_start must not influence logits: feeding garbage
    before the window start changes nothing."""
    config, params, *_ = setup
    rng = np.random.default_rng(1)
    B, S = 1, 8
    ids = rng.integers(4, 32, (B, S)).astype(np.int32)
    cls = np.full((B, S), TGT_CLASS_ID, np.int32)
    attrs = {name: np.ones((B, S), np.int32) for name in ATTRIBUTE_ORDER}

    def run(prefix_ids):
        cache = init_stream_cache(config, B, 64)
        pos = jnp.zeros((B,), jnp.int32)
        win = jnp.full((B,), 4, jnp.int32)  # window starts at position 4
        _, cache = stream_chunk(
            params, config, cache, jnp.asarray(prefix_ids), jnp.asarray(cls),
            {k: jnp.asarray(v) for k, v in attrs.items()},
            start_pos=pos, win_start=win, slot_offset=jnp.int32(0),
        )
        logits, _ = stream_chunk(
            params, config, cache, jnp.asarray(ids[:, :1]),
            jnp.asarray(cls[:, :1]),
            {k: jnp.asarray(v[:, :1]) for k, v in attrs.items()},
            start_pos=pos + S, win_start=win, slot_offset=jnp.int32(S),
        )
        return np.asarray(logits)

    a = run(ids)
    mutated = ids.copy()
    mutated[:, :4] = 7  # mutate tokens strictly before the window start
    b = run(mutated)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_stream_chunk_int8_kv_matches_bf16(setup):
    """int8 KV quantization (per-slot-per-head amax/127 scales, int8×int8
    score/context dots with scales applied outside the contractions) must
    track the bf16 cache closely: cosine ≥ 0.999 on logits, same argmax."""
    config, params, *_ = setup
    rng = np.random.default_rng(4)
    B, S = 2, 12
    ids = rng.integers(4, 32, (B, S)).astype(np.int32)
    cls = np.full((B, S), TGT_CLASS_ID, np.int32)
    attrs = {name: np.ones((B, S), np.int32) for name in ATTRIBUTE_ORDER}
    zero = jnp.zeros((B,), jnp.int32)

    outs = {}
    for quant in (False, True):
        from etude_tpu.models.generate_stream import compact_window

        cache = init_stream_cache(config, B, 48, quant=quant)
        logits, cache = stream_chunk(
            params, config, cache, jnp.asarray(ids), jnp.asarray(cls),
            {k: jnp.asarray(v) for k, v in attrs.items()},
            start_pos=zero, win_start=zero, slot_offset=jnp.int32(0),
        )
        # Exercise the quant-aware compaction too.
        cache = compact_window(cache, zero + 2, zero + S, hist=24)
        logits2, _ = stream_chunk(
            params, config, cache, jnp.asarray(ids[:, :1]),
            jnp.asarray(cls[:, :1]),
            {k: jnp.asarray(v[:, :1]) for k, v in attrs.items()},
            start_pos=zero + S, win_start=zero + 2, slot_offset=jnp.int32(24),
        )
        outs[quant] = (np.asarray(logits[:, -1]), np.asarray(logits2[:, 0]))

    for a, b in zip(outs[False], outs[True]):
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        )
        assert (cos >= 0.999).all(), cos
        assert (a.argmax(-1) == b.argmax(-1)).all()


def test_stream_engine_int8_kv_generates(setup):
    """Engine-level kv_quant smoke: greedy full-song output is structurally
    valid and nearly identical to the bf16 engine's."""
    config, params, _, _, BOS, EOS = setup
    engine_q = StreamingGenerationEngine(
        config, bar_bos_id=BOS, bar_eos_id=EOS, pad_id=0,
        max_bar_token_limit=32, x_len_buckets=(16, 32), bars_bucket=8,
        kv_quant=True,
    )
    engine_f = StreamingGenerationEngine(
        config, bar_bos_id=BOS, bar_eos_id=EOS, pad_id=0,
        max_bar_token_limit=32, x_len_buckets=(16, 32), bars_bucket=8,
    )
    bars, attrs = _song(BOS, EOS, n_bars=4, seed=8)
    out_q = engine_q.generate(params, bars, attrs, temperature=0.0)
    out_f = engine_f.generate(params, bars, attrs, temperature=0.0)
    assert len(out_q) == 4
    for bar in out_q:
        assert bar[0] == BOS and len(bar) <= 33
    # Greedy outputs may diverge after a near-tie flip; most tokens agree.
    flat_q = [t for bar in out_q for t in bar]
    flat_f = [t for bar in out_f for t in bar]
    n = min(len(flat_q), len(flat_f))
    agree = sum(a == b for a, b in zip(flat_q[:n], flat_f[:n])) / max(n, 1)
    assert agree >= 0.8, agree


def test_stream_chunk_hist_read_equals_full(setup):
    """Reading [0, hist_read) ∪ [hist, C) is exactly the full read whenever
    every live history slot is below hist_read (the engine guarantees the
    bound; here the dead tail holds junk K/V that a correct region read
    never touches and a correct mask never exposes)."""
    config, params, *_ = setup
    B, hist, C = 2, 48, 80
    rng = np.random.default_rng(3)

    def fresh_cache():
        cache = init_stream_cache(config, B, C)
        # Junk K/V in the dead tail [24, hist): must not matter.
        junk = jnp.asarray(rng.normal(0, 3, (config.num_hidden_layers, B,
                                             config.num_attention_heads,
                                             config.head_dim, hist - 24)),
                           jnp.bfloat16)
        for key in ("k", "v"):
            cache[key] = jax.lax.dynamic_update_slice(
                cache[key], junk, (0, 0, 0, 0, 24)
            )
        return cache

    ids = jnp.asarray(rng.integers(6, 32, (B, 4)), jnp.int32)
    cls = jnp.full((B, 4), SRC_CLASS_ID, jnp.int32)
    attrs = {n: jnp.ones((B, 4), jnp.int32) for n in ATTRIBUTE_ORDER}
    kw = dict(start_pos=jnp.zeros((B,), jnp.int32),
              win_start=jnp.zeros((B,), jnp.int32),
              slot_offset=jnp.int32(0))

    # Write 8 live tokens into the history region (slots 0..7 < 24).
    cache = fresh_cache()
    _, cache = stream_chunk(params, config, cache, ids, cls, attrs, **kw)
    ids2 = jnp.asarray(rng.integers(6, 32, (B, 4)), jnp.int32)
    _, cache = stream_chunk(
        params, config, cache, ids2, cls, attrs,
        start_pos=jnp.full((B,), 4, jnp.int32),
        win_start=jnp.zeros((B,), jnp.int32), slot_offset=jnp.int32(4),
    )

    # Query from the bar region with and without the region read.
    bar_ids = jnp.asarray(rng.integers(6, 32, (B, 2)), jnp.int32)
    bar_kw = dict(start_pos=jnp.full((B,), 8, jnp.int32),
                  win_start=jnp.zeros((B,), jnp.int32),
                  slot_offset=jnp.int32(hist))
    logits_full, _ = stream_chunk(
        params, config, cache, bar_ids, cls[:, :2], 
        {n: a[:, :2] for n, a in attrs.items()}, **bar_kw,
    )
    logits_region, _ = stream_chunk(
        params, config, cache, bar_ids, cls[:, :2],
        {n: a[:, :2] for n, a in attrs.items()}, **bar_kw,
        hist_read=24, hist=hist,
    )
    np.testing.assert_allclose(
        np.asarray(logits_full), np.asarray(logits_region),
        rtol=2e-2, atol=2e-2,
    )
    # And the region read must NOT equal a read that exposes the junk:
    # sanity that the junk actually differs from zeros.
    assert float(jnp.abs(cache["k"][..., 30]).max()) > 0.5
