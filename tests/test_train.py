import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etude_tpu.models.decoder import (
    ATTRIBUTE_ORDER,
    EtudeDecoderConfig,
    init_params,
)
from etude_tpu.parallel.mesh import make_mesh, shard_batch
from etude_tpu.parallel.train_step import (
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    reshape_for_accum,
)
from etude_tpu.utils.training import load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def tiny_config():
    return EtudeDecoderConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, attribute_emb_dim=8,
    )


def _batch(config, rng, B=8, T=16):
    ids = rng.integers(4, config.vocab_size, (B, T)).astype(np.int32)
    labels = np.roll(ids, -1, axis=1).astype(np.int32)
    labels[:, -1] = -100
    labels[:, : T // 2] = -100
    batch = {
        "input_ids": ids,
        "class_ids": rng.integers(1, 3, (B, T)).astype(np.int32),
        "labels": labels,
        "attention_mask": np.ones((B, T), np.int32),
    }
    for name in ATTRIBUTE_ORDER:
        batch[f"{name}_bin_ids"] = rng.integers(0, 3, (B, T)).astype(np.int32)
    return batch


def test_lr_schedule_shape():
    sched = make_lr_schedule(2e-4, warmup_steps=10, total_steps=100)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(10)) == pytest.approx(2e-4, rel=1e-3)
    assert float(sched(99)) < 2e-5
    # Monotonic decay after warmup.
    assert float(sched(50)) < float(sched(20))


def test_train_step_reduces_loss(tiny_config, rng):
    """Overfit a fixed batch for a few steps: loss must drop."""
    params = init_params(tiny_config, seed=0)
    tx, _ = make_optimizer(learning_rate=3e-3, warmup_steps=2, total_steps=60)
    state = init_train_state(params, tx)
    step = make_train_step(tiny_config, tx, compute_dtype=jnp.float32)

    batch = reshape_for_accum(_batch(tiny_config, rng), accum_steps=2)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7
    assert int(state.step) == 30
    assert int(state.skipped) == 0


def test_train_step_on_mesh(tiny_config, rng):
    """Data-parallel step over the 8-device virtual CPU mesh."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(data_parallel=8)
    params = init_params(tiny_config, seed=0)
    tx, _ = make_optimizer(total_steps=10)
    state = init_train_state(params, tx)
    step = make_train_step(tiny_config, tx, mesh=mesh, compute_dtype=jnp.float32)

    batch = reshape_for_accum(_batch(tiny_config, rng, B=32), accum_steps=2)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["grads_finite"]) == 1

    # Sharded result must match the unsharded step numerically.
    params2 = init_params(tiny_config, seed=0)
    state2 = init_train_state(params2, tx)
    step2 = make_train_step(tiny_config, tx, compute_dtype=jnp.float32)
    state2, metrics2 = step2(state2, {k: jnp.asarray(v) for k, v in batch.items()})
    assert float(metrics["loss"]) == pytest.approx(float(metrics2["loss"]), rel=1e-4)


def test_nonfinite_grads_skip_update(tiny_config, rng):
    params = init_params(tiny_config, seed=0)
    tx, _ = make_optimizer(total_steps=10)
    state = init_train_state(params, tx)
    step = make_train_step(tiny_config, tx, compute_dtype=jnp.float32)

    batch = _batch(tiny_config, rng)
    # Poison the attribute-projection bias (used at every position) so the
    # forward produces NaN gradients.
    bad_params = dict(state.params)
    bad_params["attr_proj"] = {
        "w": state.params["attr_proj"]["w"],
        "b": state.params["attr_proj"]["b"].at[0].set(jnp.nan),
    }
    state = state._replace(params=bad_params)
    before = np.asarray(state.params["lm_head"])
    batch = reshape_for_accum(batch, 2)
    state, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
    assert int(metrics["grads_finite"]) == 0
    assert int(state.skipped) == 1
    np.testing.assert_array_equal(np.asarray(state.params["lm_head"]), before)


def test_checkpoint_roundtrip(tiny_config, tmp_path):
    params = init_params(tiny_config, seed=0)
    tx, _ = make_optimizer(total_steps=10)
    state = init_train_state(params, tx)
    save_checkpoint(tmp_path, state, epoch=3, global_step=42,
                    model_config=tiny_config, is_save_epoch=True)
    assert (tmp_path / "latest").exists()
    assert (tmp_path / "epoch_0003").exists()
    assert (tmp_path / "etude_decoder_config.json").exists()

    fresh = init_train_state(init_params(tiny_config, seed=99), tx)
    restored, meta = load_checkpoint(tmp_path, fresh)
    assert meta["epoch"] == 3 and meta["global_step"] == 42
    np.testing.assert_array_equal(
        np.asarray(restored.params["word_emb"]), np.asarray(params["word_emb"])
    )

    cfg = EtudeDecoderConfig.from_json_file(tmp_path / "etude_decoder_config.json")
    assert cfg == tiny_config


def test_fsdp_sharded_training_matches_replicated(tiny_config, rng):
    """ZeRO-style parameter sharding over the data axis must train
    identically to the replicated layout."""
    from etude_tpu.parallel.train_step import init_sharded_state

    mesh = make_mesh(data_parallel=8)
    tx, _ = make_optimizer(learning_rate=1e-3, total_steps=10)

    params = init_params(tiny_config, seed=0)
    state_fsdp = init_sharded_state(params, tx, mesh, fsdp=True)
    # At least one parameter is actually sharded (not fully replicated).
    shardings = [p.sharding for p in jax.tree.leaves(state_fsdp.params)]
    assert any(
        not s.is_fully_replicated for s in shardings
    ), "FSDP produced no sharded parameters"

    step_fsdp = make_train_step(
        tiny_config, tx, mesh=mesh, compute_dtype=jnp.float32,
        infer_state_sharding=True,
    )
    batch = reshape_for_accum(_batch(tiny_config, rng, B=16), accum_steps=2)
    state_fsdp, metrics_fsdp = step_fsdp(state_fsdp, batch)

    params2 = init_params(tiny_config, seed=0)
    state_rep = init_train_state(params2, tx)
    step_rep = make_train_step(tiny_config, tx, compute_dtype=jnp.float32)
    state_rep, metrics_rep = step_rep(
        state_rep, {k: jnp.asarray(v) for k, v in batch.items()}
    )
    assert float(metrics_fsdp["loss"]) == pytest.approx(
        float(metrics_rep["loss"]), rel=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state_fsdp.params["lm_head"])),
        np.asarray(state_rep.params["lm_head"]),
        rtol=1e-5, atol=1e-6,
    )


def test_checkpoint_recovery_from_interrupted_save(tiny_config, tmp_path):
    """A kill between the two save renames leaves .latest.old; load must
    recover it."""
    params = init_params(tiny_config, seed=0)
    tx, _ = make_optimizer(total_steps=10)
    state = init_train_state(params, tx)
    save_checkpoint(tmp_path, state, epoch=1, global_step=1,
                    model_config=tiny_config)
    # Simulate the crash window: latest was renamed away, new one never landed.
    (tmp_path / "latest").rename(tmp_path / ".latest.old")
    restored, meta = load_checkpoint(tmp_path, init_train_state(params, tx))
    assert int(restored.step) == 0
    assert (tmp_path / "latest").exists()


def test_remap_decoder_vocab():
    """Checkpoint vocab surgery: rows/columns follow token strings; new
    tokens borrow the nearest same-type neighbour's weights."""
    from etude_tpu.data.vocab import Vocab
    from etude_tpu.utils.model_loader import remap_decoder_vocab

    old_vocab, new_vocab = Vocab(), Vocab()
    for tok in ["Bar_BOS", "Bar_EOS", "Note_60", "Note_62", "Duration_4"]:
        old_vocab.add(tok)
    # Rebuilt vocab: shuffled order + one unseen token.
    for tok in ["Bar_BOS", "Bar_EOS", "Duration_4", "Note_60", "Note_61",
                "Note_62"]:
        new_vocab.add(tok)

    rng = np.random.default_rng(0)
    V_old, H = len(old_vocab), 8
    params = {
        "word_emb": rng.normal(size=(V_old, H)).astype(np.float32),
        "lm_head": rng.normal(size=(H, V_old)).astype(np.float32),
        "final_ln": {"scale": np.ones(H, np.float32)},
    }
    out = remap_decoder_vocab(params, old_vocab, new_vocab)
    assert out["word_emb"].shape == (len(new_vocab), H)
    assert out["lm_head"].shape == (H, len(new_vocab))
    for tok in ["Bar_BOS", "Note_60", "Note_62", "Duration_4"]:
        o, n = old_vocab.token_to_id[tok], new_vocab.token_to_id[tok]
        np.testing.assert_array_equal(out["word_emb"][n],
                                      params["word_emb"][o])
        np.testing.assert_array_equal(out["lm_head"][:, n],
                                      params["lm_head"][:, o])
    # Note_61 borrows a neighbour (Note_60 or Note_62, both distance 1).
    n61 = new_vocab.token_to_id["Note_61"]
    neighbours = [old_vocab.token_to_id["Note_60"],
                  old_vocab.token_to_id["Note_62"]]
    assert any(
        np.array_equal(out["word_emb"][n61], params["word_emb"][o])
        for o in neighbours
    )
    # Untouched leaves pass through.
    np.testing.assert_array_equal(out["final_ln"]["scale"],
                                  params["final_ln"]["scale"])
