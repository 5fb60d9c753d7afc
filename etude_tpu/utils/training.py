"""Training utilities: seeding and checkpoint persistence.

Checkpoint payload semantics match the reference contract
(etude/utils/training_utils.py:18-43): model + optimizer state + epoch +
global step + model config, written to `latest` every save and to
`epoch_NNNN` copies on scheduled epochs, with resume support. Storage is
orbax (tensorstore-backed, async-safe) instead of torch pickles.
"""

from __future__ import annotations

import dataclasses
import json
import random
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import numpy as np
import orbax.checkpoint as ocp

from .logger import logger
from ..models.decoder import EtudeDecoderConfig


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def _checkpointer() -> ocp.Checkpointer:
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def save_checkpoint(
    checkpoint_dir: Union[str, Path],
    state: Any,                      # TrainState (params/opt_state/step/...)
    epoch: int,
    global_step: int,
    model_config: EtudeDecoderConfig,
    is_save_epoch: bool = False,
) -> Path:
    """Write `latest` (always) and an `epoch_NNNN` copy on save epochs."""
    checkpoint_dir = Path(checkpoint_dir).resolve()
    checkpoint_dir.mkdir(parents=True, exist_ok=True)

    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "skipped": state.skipped,
    }
    latest = checkpoint_dir / "latest"
    # Crash-safe: write to a scratch dir, then swap via rename (a kill mid-
    # write must never destroy the previous checkpoint). Also clear orbax's
    # own in-progress suffix dirs (".latest.tmp.orbax-checkpoint-tmp"): a
    # process killed inside Checkpointer.save leaves one behind, and a
    # restarted run must not trip over it.
    tmp = checkpoint_dir / ".latest.tmp"
    for stale in checkpoint_dir.glob(".latest.tmp*"):
        shutil.rmtree(stale, ignore_errors=True)
    if tmp.exists():
        shutil.rmtree(tmp)
    _checkpointer().save(tmp, payload)
    old = checkpoint_dir / ".latest.old"
    if old.exists():
        shutil.rmtree(old)
    if latest.exists():
        latest.rename(old)
    tmp.rename(latest)
    if old.exists():
        shutil.rmtree(old)

    meta = {
        "epoch": epoch,
        "global_step": global_step,
        "model_config": dataclasses.asdict(model_config),
    }
    with open(checkpoint_dir / "metadata.json", "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2)
    model_config.to_json_file(checkpoint_dir / "etude_decoder_config.json")

    if is_save_epoch:
        epoch_dir = checkpoint_dir / f"epoch_{epoch:04d}"
        if epoch_dir.exists():
            shutil.rmtree(epoch_dir)
        shutil.copytree(latest, epoch_dir)
        logger.debug(f"checkpoint copied to {epoch_dir}")

    logger.debug(f"checkpoint saved to {latest} (epoch {epoch}, step {global_step})")
    return latest


def load_checkpoint(
    checkpoint_dir: Union[str, Path],
    abstract_state: Any,
    name: str = "latest",
) -> Tuple[Any, Dict[str, Any]]:
    """Restore (state, metadata). `abstract_state` supplies the target pytree
    structure/shardings (e.g. a freshly initialized TrainState)."""
    checkpoint_dir = Path(checkpoint_dir).resolve()
    path = checkpoint_dir / name
    if not path.exists() and name == "latest":
        # Recover from a kill inside the save_checkpoint rename window.
        old = checkpoint_dir / ".latest.old"
        if old.exists():
            logger.warn("recovering checkpoint from interrupted save (.latest.old)")
            old.rename(path)
    if not path.exists():
        raise FileNotFoundError(f"no checkpoint at {path}")

    template = {
        "params": abstract_state.params,
        "opt_state": abstract_state.opt_state,
        "step": abstract_state.step,
        "skipped": abstract_state.skipped,
    }
    # Restore each leaf onto the template's SHARDING (FSDP/mesh-sharded
    # TrainStates resume with their layout intact instead of landing as
    # host numpy and re-sharding on first use).
    restore_args = jax.tree.map(
        lambda a: ocp.ArrayRestoreArgs(
            sharding=a.sharding, global_shape=a.shape, dtype=a.dtype
        ) if isinstance(a, jax.Array) else ocp.RestoreArgs(),
        template,
    )
    restored = _checkpointer().restore(
        path, item=template, restore_args=restore_args
    )
    # Scalar/aux leaves come back as host numpy; commit every leaf to the
    # template's sharding so the restored state is device-consistent (a
    # mix of mesh-sharded arrays and default-device scalars fails jit).
    restored = jax.tree.map(
        lambda r, t: jax.device_put(r, t.sharding)
        if isinstance(t, jax.Array) else r,
        restored, template,
    )

    meta_path = checkpoint_dir / "metadata.json"
    meta: Dict[str, Any] = {}
    if meta_path.exists():
        with open(meta_path, "r", encoding="utf-8") as f:
            meta = json.load(f)

    state = type(abstract_state)(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        skipped=restored["skipped"],
    )
    logger.debug(f"checkpoint restored from {path}")
    return state, meta


def save_params_only(
    path: Union[str, Path], params: Any, config: EtudeDecoderConfig
) -> None:
    """Inference-weight export: params + config, no optimizer state."""
    path = Path(path).resolve()
    if path.exists():
        shutil.rmtree(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    _checkpointer().save(path, {"params": params})
    config.to_json_file(path.parent / "etude_decoder_config.json")


# Process-level device-resident params cache: a serving process handles many
# requests with the same checkpoints, and on a remote-tunneled chip every
# reload costs disk read + host→HBM re-upload (~seconds for the 25M decoder).
# Params are functional pytrees (never mutated in place), so sharing the
# device buffers across pipeline instances is safe. Keyed by (path, mtime);
# a retrained checkpoint at the same path gets a fresh entry.
_PARAMS_CACHE: Dict[Tuple[str, float], Any] = {}


def load_params_only(
    path: Union[str, Path], abstract_params: Any, cache: bool = True
) -> Any:
    """Restore a params-only checkpoint onto the default device.

    ``cache=False`` skips the process-level cache — required when the
    caller feeds the params into a buffer-donating computation (e.g. the
    train step's ``donate_argnums``), which would leave the cached device
    buffers dangling.
    """
    path = Path(path).resolve()
    key = (str(path), path.stat().st_mtime)
    cached = _PARAMS_CACHE.get(key) if cache else None
    if cached is not None and jax.eval_shape(
        lambda: cached
    ) == jax.eval_shape(lambda: abstract_params):
        return cached
    restored = _checkpointer().restore(path, item={"params": abstract_params})
    # Checkpoints may be stored in reduced precision (f16 shipped weights);
    # promote to the caller's requested dtype for stable master weights.
    params = jax.tree.map(
        lambda r, a: r.astype(a.dtype) if hasattr(a, "dtype") else r,
        restored["params"], abstract_params,
    )
    # Commit to the default device NOW: orbax restores host numpy arrays, and
    # every jit invocation re-uploads host operands — on a remote-tunneled
    # chip that is ~2 s of transfer per call for the 25M decoder (measured),
    # dwarfing the launch it feeds.
    params = jax.device_put(params)
    if cache:
        # Bound the cache: one (latest-mtime) entry per checkpoint path, so
        # repeated retrains in a long-lived process don't accumulate stale
        # device buffers.
        for stale in [k for k in _PARAMS_CACHE if k[0] == key[0]]:
            del _PARAMS_CACHE[stale]
        _PARAMS_CACHE[key] = params
    return params


def save_aux_params(
    path: Union[str, Path],
    params: Any,
    metadata: Optional[Dict[str, Any]] = None,
    dtype=np.float16,
) -> None:
    """Params-only checkpoint for the auxiliary models (extractor / beat /
    separator) — reduced-precision storage (these ship in-repo), with an
    optional sidecar metadata.json describing the training provenance."""
    path = Path(path).resolve()
    if path.exists():
        shutil.rmtree(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    stored = jax.tree.map(
        lambda a: np.asarray(a, dtype) if np.issubdtype(
            np.asarray(a).dtype, np.floating) else np.asarray(a),
        params,
    )
    _checkpointer().save(path, {"params": stored})
    if metadata is not None:
        with open(path.parent / "metadata.json", "w", encoding="utf-8") as f:
            json.dump(metadata, f, indent=2)
