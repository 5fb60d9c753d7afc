"""Mesh-sharded streaming generation (serving scale-out).

The reference runs its 27-attribute sweep as 27 serial single-device
generations; the TPU-native engine batches streams and — tested here —
shards the stream axis over a device mesh (conftest provides 8 virtual CPU
devices). Every per-stream op in generate_song_stream is batch-parallel, so
sharded and single-device runs must produce IDENTICAL tokens.
"""

import numpy as np
import pytest

from etude_tpu.models.decoder import EtudeDecoderConfig, init_params
from etude_tpu.models.generate import ATTR_KEYS
from etude_tpu.models.generate_stream import StreamingGenerationEngine
from etude_tpu.parallel.mesh import make_mesh


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
    engine = StreamingGenerationEngine(
        config, bar_bos_id=BOS, bar_eos_id=EOS, pad_id=0,
        max_bar_token_limit=32, x_len_buckets=(16,), bars_bucket=8,
    )
    return config, params, engine, BOS, EOS


def _song(BOS, EOS, n_bars=5, seed=0):
    rng = np.random.default_rng(seed)
    bars = [[BOS] + rng.integers(6, 32, 3).tolist() + [EOS]
            for _ in range(n_bars)]
    attrs = [{k: int(rng.integers(0, 3)) for k in ATTR_KEYS}
             for _ in range(n_bars)]
    return bars, attrs


def test_sharded_matches_single_device(setup):
    _, params, engine, BOS, EOS = setup
    mesh = make_mesh(data_parallel=8, model_parallel=1)
    bars, attrs = _song(BOS, EOS)
    xs = [bars] * 8
    # Distinct attribute streams (the sweep use case).
    ats = [[{k: (i + j) % 3 for k in ATTR_KEYS} for j in range(len(bars))]
           for i in range(8)]
    ref = engine.generate_batch(params, xs, ats, temperature=0.0, seed=3)
    out = engine.generate_batch(params, xs, ats, temperature=0.0, seed=3,
                                mesh=mesh)
    assert out == ref


def test_sharded_pads_stream_count(setup):
    """A stream count that does not divide the mesh is padded with empty
    streams and unpadded on return."""
    _, params, engine, BOS, EOS = setup
    mesh = make_mesh(data_parallel=8, model_parallel=1)
    bars, attrs = _song(BOS, EOS, seed=1)
    xs = [bars] * 5
    ats = [attrs] * 5
    ref = engine.generate_batch(params, xs, ats, temperature=0.0, seed=7)
    out = engine.generate_batch(params, xs, ats, temperature=0.0, seed=7,
                                mesh=mesh)
    assert len(out) == 5
    # Sharding must not change any requested stream's tokens. (Note: the
    # padded run batches 8 streams; lockstep decode itself is per-stream
    # deterministic, so outputs are batch-size-invariant.)
    assert out == ref
