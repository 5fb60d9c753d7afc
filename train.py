#!/usr/bin/env python
"""Train the EtudeDecoder (CLI surface mirrors the reference train.py).

TPU-native training loop: fixed-shape batches, one jit-compiled
gradient-accumulating train step sharded over the data axis of a device mesh,
optax AdamW + cosine warmup, orbax checkpoints with resume.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from etude_tpu.config import load_config
from etude_tpu.data.dataset import EtudeDataset
from etude_tpu.data.vocab import Vocab
from etude_tpu.models.decoder import EtudeDecoderConfig, init_params, param_count
from etude_tpu.parallel.mesh import make_mesh
from etude_tpu.parallel.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from etude_tpu.utils.logger import logger
from etude_tpu.utils.training import load_checkpoint, save_checkpoint, set_seed


def build_model_config(cfg, vocab_size: int) -> EtudeDecoderConfig:
    d = cfg.decoder
    return EtudeDecoderConfig(
        vocab_size=vocab_size,
        hidden_size=d.hidden_size,
        num_hidden_layers=d.num_hidden_layers,
        num_attention_heads=d.num_attention_heads,
        intermediate_size=d.intermediate_size,
        max_position_embeddings=d.max_position_embeddings,
        num_classes=d.num_classes,
        pad_class_id=d.pad_class_id,
        attribute_pad_id=d.attribute_pad_id,
        context_num_past_xy_pairs=d.context_num_past_xy_pairs,
        num_attribute_bins=d.num_attribute_bins,
        attribute_emb_dim=d.attribute_emb_dim,
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Train the EtudeDecoder")
    parser.add_argument("--config", type=str, default=None, help="YAML config path")
    parser.add_argument("--run-id", type=str, default=None)
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint dir to resume from")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--max-steps", type=int, default=None,
                        help="hard step cap (smoke runs)")
    parser.add_argument("--save-every-steps", type=int, default=None,
                        help="also checkpoint `latest` every N optimizer "
                             "steps (intra-epoch crash/stall resilience; "
                             "resume restarts the interrupted epoch but "
                             "state.step and the LR schedule carry over — "
                             "pair with --max-steps to stop at the planned "
                             "total)")
    args = parser.parse_args(argv)

    cfg = load_config(args.config)
    tc = cfg.train
    if args.epochs is not None:
        tc.num_epochs = args.epochs
    if args.batch_size is not None:
        tc.batch_size = args.batch_size
    if args.resume is not None:
        tc.resume_from_checkpoint = args.resume
    run_id = args.run_id or tc.run_id or time.strftime("%Y%m%d_%H%M%S")

    set_seed(cfg.env.seed)
    logger.stage("Setup")
    logger.info(f"devices: {jax.devices()}")

    vocab = Vocab.load(cfg.paths.dataset_vocab)
    logger.info(f"vocab: {len(vocab)} tokens")

    dataset = EtudeDataset(
        cfg.paths.tokenized_dir,
        vocab,
        max_seq_len=tc.max_seq_len,
        hist_suffix="_hist.npy" if tc.dagger_history else None,
        data_format=tc.data_format,
        num_attribute_bins=cfg.decoder.num_attribute_bins,
        context_num_past_xy_pairs=cfg.decoder.context_num_past_xy_pairs,
        attr_dropout=tc.attr_dropout,
        dagger_history_prob=tc.dagger_history_prob,
    )
    if tc.attr_dropout > 0:
        logger.info(f"attribute dropout: {tc.attr_dropout:.2f} "
                    "(neutral-bin conditioning for default serving)")
    if tc.dagger_history:
        n_hist = sum(
            1 for s in dataset.songs
            if any(b["hist_bar_ids"] is not b["tgt_bar_ids"]
                   for b in s["bars"])
        )
        logger.info(
            f"DAgger history: {n_hist}/{len(dataset.songs)} songs have "
            f"model rollouts (scripts/dagger_rollouts.py), "
            f"p(use rollout)={tc.dagger_history_prob:.2f}"
        )
    if len(dataset) == 0:
        logger.error("dataset is empty — run prepare.py first")
        return 1
    logger.info(f"dataset: {len(dataset.songs)} songs, {len(dataset)} chunks")

    model_config = build_model_config(cfg, len(vocab))
    params = init_params(model_config, seed=cfg.env.seed)
    logger.info(f"model: {param_count(params) / 1e6:.2f}M params")
    if tc.init_from:
        from etude_tpu.utils.training import load_params_only

        # cache=False: these params feed the donating train step
        # (donate_argnums), which would invalidate cached device buffers.
        params = load_params_only(Path(tc.init_from), params, cache=False)
        logger.success(f"warm-started params from {tc.init_from} "
                       "(fresh optimizer/schedule)")

    accum = tc.gradient_accumulation_steps
    global_batch = tc.batch_size * accum
    steps_per_epoch = max(len(dataset) // global_batch, 1)
    total_steps = steps_per_epoch * tc.num_epochs
    warmup_steps = int(steps_per_epoch * tc.warmup_epochs)

    tx, schedule = make_optimizer(
        learning_rate=tc.learning_rate,
        warmup_steps=warmup_steps,
        total_steps=total_steps,
        weight_decay=tc.weight_decay,
        beta1=tc.adam_beta1,
        beta2=tc.adam_beta2,
        clip_grad_norm=tc.clip_grad_norm,
    )

    # The micro batch is sharded over the data axis; auto-sized data
    # parallelism must divide it.
    dp = cfg.mesh.data_parallel
    if dp == -1:
        dp = min(len(jax.devices()) // cfg.mesh.model_parallel, tc.batch_size)
        while dp > 1 and tc.batch_size % dp:
            dp -= 1
    mesh = make_mesh(
        data_parallel=dp,
        model_parallel=cfg.mesh.model_parallel,
        data_axis=cfg.mesh.data_axis,
        model_axis=cfg.mesh.model_axis,
    )
    compute_dtype = jnp.bfloat16 if cfg.env.compute_dtype == "bfloat16" else jnp.float32
    if cfg.mesh.fsdp:
        from etude_tpu.parallel.train_step import init_sharded_state

        state = init_sharded_state(
            params, tx, mesh, data_axis=cfg.mesh.data_axis, fsdp=True
        )
        logger.info("parameters + optimizer state FSDP-sharded over the data axis")
    else:
        state = init_train_state(params, tx)
    train_step = make_train_step(
        model_config, tx, mesh=mesh, data_axis=cfg.mesh.data_axis,
        compute_dtype=compute_dtype,
        infer_state_sharding=cfg.mesh.fsdp,
    )

    ckpt_dir = Path(cfg.paths.train_output_dir) / run_id
    start_epoch = 0
    if tc.resume_from_checkpoint:
        state, meta = load_checkpoint(tc.resume_from_checkpoint, state)
        start_epoch = meta.get("epoch", 0)
        logger.success(f"resumed from epoch {start_epoch}, step {int(state.step)}")

    logger.stage("Training")
    logger.info(
        f"{tc.num_epochs} epochs x {steps_per_epoch} steps, "
        f"global batch {global_batch} (micro {tc.batch_size} x accum {accum})"
    )

    from etude_tpu.parallel.prefetch import prefetch_to_mesh

    done = False
    for epoch in range(start_epoch, tc.num_epochs):
        t_epoch = time.time()
        losses = []
        # Async double-buffered host→device pipeline.
        batches = prefetch_to_mesh(
            dataset.batches(
                batch_size=global_batch, shuffle=True, seed=cfg.env.seed + epoch
            ),
            mesh, accum, data_axis=cfg.mesh.data_axis,
        )
        # Keep loss scalars on device inside the loop: a per-step float()
        # would block async dispatch and serialize the pipeline on the
        # host↔device round trip. Steps are counted on the host (state.step
        # increments by exactly 1 per train_step, including skipped updates).
        host_step = int(state.step)
        for batch in batches:
            state, metrics = train_step(state, batch)
            losses.append(metrics["loss"])
            host_step += 1
            if args.save_every_steps and host_step % args.save_every_steps == 0:
                # Mid-epoch safety checkpoint (syncs the device once).
                save_checkpoint(
                    ckpt_dir, state, epoch=epoch, global_step=host_step,
                    model_config=model_config,
                )
                logger.info(f"  step {host_step}: checkpointed "
                            f"(loss {float(losses[-1]):.4f})")
            if args.max_steps and host_step >= args.max_steps:
                done = True
                break
        if not losses:
            logger.error(
                f"epoch produced no batches: dataset has {len(dataset)} chunks "
                f"but the global batch is {global_batch}; reduce batch_size or "
                "gradient_accumulation_steps"
            )
            return 1
        losses = [float(x) for x in losses]  # one sync point per epoch
        dt = time.time() - t_epoch
        lr = float(schedule(int(state.step)))
        logger.info(
            f"epoch {epoch + 1}/{tc.num_epochs}: loss {np.mean(losses):.4f} "
            f"lr {lr:.2e} skipped {int(state.skipped)} ({dt:.1f}s)"
        )
        # Append per-epoch metrics for offline observability.
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        with open(ckpt_dir / "metrics.jsonl", "a", encoding="utf-8") as f:
            import json

            f.write(json.dumps({
                "epoch": epoch + 1,
                "step": int(state.step),
                "loss": float(np.mean(losses)),
                "lr": lr,
                "skipped_updates": int(state.skipped),
                "seconds": dt,
                "tokens_per_sec": (
                    len(losses) * global_batch * tc.max_seq_len / dt
                    if dt > 0 else 0.0
                ),
            }) + "\n")
        save_checkpoint(
            ckpt_dir, state, epoch=epoch + 1, global_step=int(state.step),
            model_config=model_config,
            is_save_epoch=((epoch + 1) % tc.save_every_n_epochs == 0),
        )
        if done:
            break

    # Export inference weights (params-only) + vocab + config: the layout
    # infer.py's model loader consumes (paths.decoder_model/_config/_vocab).
    from etude_tpu.utils.training import save_params_only

    save_params_only(ckpt_dir / "model", jax.device_get(state.params), model_config)
    vocab.save(ckpt_dir / "vocab.json")
    logger.success(f"training complete → {ckpt_dir}")
    logger.info(
        f"inference weights: {ckpt_dir / 'model'} "
        f"(point paths.decoder_model here)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
