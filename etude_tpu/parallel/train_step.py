"""Sharded training step for the EtudeDecoder.

One jit-compiled program per step: gradient accumulation over the leading
micro-batch axis via `lax.scan`, global-norm clipping + AdamW with cosine
warmup (reference hyperparameters: etude/config/schema.py TrainConfig and
train.py:81-131), and a non-finite-gradient guard that skips the update
(replacing the reference's host-side NaN-loss skip, train.py:169-170, with an
on-device check).

Parallelism: batches are sharded over the mesh's data axis; parameters are
replicated (or FSDP-sharded via parallel.mesh.fsdp_param_sharding). XLA
derives the gradient psum from the sharding annotations.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.decoder import EtudeDecoderConfig, Params, loss_fn


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray           # scalar int32
    skipped: jnp.ndarray        # scalar int32: non-finite updates skipped


def make_lr_schedule(
    learning_rate: float,
    warmup_steps: int,
    total_steps: int,
) -> optax.Schedule:
    """Linear warmup to peak then cosine decay to zero (HF
    cosine_with_warmup semantics)."""
    warmup_steps = max(warmup_steps, 1)
    decay_steps = max(total_steps - warmup_steps, 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, learning_rate, warmup_steps),
            optax.cosine_decay_schedule(learning_rate, decay_steps),
        ],
        boundaries=[warmup_steps],
    )


def make_optimizer(
    learning_rate: float = 2e-4,
    warmup_steps: int = 100,
    total_steps: int = 10000,
    weight_decay: float = 0.01,
    beta1: float = 0.9,
    beta2: float = 0.98,
    clip_grad_norm: float = 1.0,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    schedule = make_lr_schedule(learning_rate, warmup_steps, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(clip_grad_norm),
        optax.adamw(schedule, b1=beta1, b2=beta2, weight_decay=weight_decay),
    )
    return tx, schedule


def init_train_state(params: Params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.int32(0),
        skipped=jnp.int32(0),
    )


def init_sharded_state(
    params: Params,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    data_axis: str = "data",
    fsdp: bool = False,
) -> TrainState:
    """Place a TrainState on the mesh: parameters replicated, or ZeRO-style
    sharded over the data axis when fsdp=True. The optimizer state is
    initialized under jit so its moments inherit the parameter shardings."""
    from ..parallel.mesh import fsdp_param_sharding, replicated

    if fsdp:
        specs = fsdp_param_sharding(mesh, params, data_axis)
        params = jax.tree.map(jax.device_put, params, specs)
    else:
        params = jax.device_put(params, replicated(mesh))
    rep = replicated(mesh)
    # Explicit out_shardings: jax.jit(tx.init) otherwise commits fresh
    # leaves (Adam moments, step count) to the DEFAULT device, leaving the
    # state with a mixed device assignment — fine for the first inferred
    # step, but checkpoint restore reproduces leaf shardings faithfully and
    # mixed placements then fail jit's device inference. fsdp_param_sharding
    # is a pure function of leaf shape, so the moments (which mirror the
    # params tree) get exactly their parameter's layout; scalars replicate.
    abstract_opt = jax.eval_shape(tx.init, params)
    if fsdp:
        moment_specs = fsdp_param_sharding(mesh, abstract_opt, data_axis)
    else:
        moment_specs = jax.tree.map(lambda _: rep, abstract_opt)
    opt_state = jax.jit(tx.init, out_shardings=moment_specs)(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        step=jax.device_put(jnp.int32(0), rep),
        skipped=jax.device_put(jnp.int32(0), rep),
    )


def make_train_step(
    config: EtudeDecoderConfig,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    compute_dtype=jnp.bfloat16,
    infer_state_sharding: bool = False,
    remat: Optional[bool] = None,
):
    """Build the jitted train step.

    Expects batch arrays shaped [accum_steps, micro_batch, T]; the micro_batch
    axis is sharded over the mesh's data axis. Gradients are accumulated with
    lax.scan so memory stays at one micro-batch of activations.

    infer_state_sharding=True leaves the state's shardings as provided by the
    caller (e.g. FSDP-sharded params from init_sharded_state) — XLA inserts
    the all-gathers/reduce-scatters implied by the layout.
    """

    # Constraining each micro-batch (sliced from the [accum, B, T] input by
    # the scan) back to the data axis keeps the partitioner on batch-sharded
    # layouts through the backward pass — without it, SPMD falls into
    # involuntary full rematerialization on the scan's dynamic-slices.
    micro_spec = (
        NamedSharding(mesh, P(data_axis)) if mesh is not None else None
    )
    if remat is None:
        # Layer remat is what keeps the SPMD partitioner off the saved
        # per-layer residual stack; single-device jit has no partitioner, so
        # skip the recompute cost there.
        remat = mesh is not None

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def micro_grads(carry, micro_batch):
            grads_acc, loss_acc, acc_acc = carry
            if micro_spec is not None:
                micro_batch = jax.lax.with_sharding_constraint(
                    micro_batch, micro_spec
                )
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, config, micro_batch, compute_dtype, remat
            )
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, acc_acc + metrics["accuracy"]), None

        accum = next(iter(batch.values())).shape[0]
        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss_sum, acc_sum), _ = jax.lax.scan(
            micro_grads, (zero_grads, 0.0, 0.0), batch
        )
        grads = jax.tree.map(lambda g: g / accum, grads)
        loss = loss_sum / accum

        grads_finite = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
        )

        def do_update(_):
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(new_params, new_opt, state.step + 1, state.skipped)

        def skip_update(_):
            return TrainState(
                state.params, state.opt_state, state.step + 1, state.skipped + 1
            )

        new_state = jax.lax.cond(grads_finite, do_update, skip_update, None)
        metrics = {
            "loss": loss,
            "accuracy": acc_sum / accum,
            "grads_finite": grads_finite.astype(jnp.int32),
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    batch_spec = NamedSharding(mesh, P(None, data_axis))
    if infer_state_sharding:
        # State keeps the caller-provided layout (FSDP or replicated).
        return jax.jit(
            step_fn,
            donate_argnums=(0,),
            in_shardings=(None, batch_spec),
        )

    replicated = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(replicated, batch_spec),
        out_shardings=(replicated, replicated),
    )


def reshape_for_accum(
    batch: Dict[str, Any], accum_steps: int
) -> Dict[str, Any]:
    """[B, T] host batch → [accum, B/accum, T]."""
    out = {}
    for k, v in batch.items():
        b = v.shape[0]
        if b % accum_steps:
            raise ValueError(f"batch dim {b} not divisible by accum {accum_steps}")
        out[k] = v.reshape(accum_steps, b // accum_steps, *v.shape[1:])
    return out
