"""Multi-host (DCN) readiness: a real 2-process jax.distributed cluster on
CPU devices, running the sharded train step over a mesh that spans both
processes, with process-local input sharding.

Each subprocess gets 2 virtual CPU devices (4 global); the data axis spans
hosts. Both processes must agree on the loss (XLA's psum runs over the
distributed mesh)."""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, os, sys

proc_id = int(sys.argv[1])
coord = sys.argv[2]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)

from etude_tpu.parallel.mesh import initialize_multihost, make_mesh, make_global_batch

initialize_multihost(coordinator_address=coord, num_processes=2,
                     process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import numpy as np
import jax.numpy as jnp

from etude_tpu.models.decoder import ATTRIBUTE_ORDER, EtudeDecoderConfig, init_params
from etude_tpu.parallel.train_step import (
    init_train_state, make_optimizer, make_train_step, reshape_for_accum,
)

config = EtudeDecoderConfig(
    vocab_size=64, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=32, attribute_emb_dim=8,
)
params = init_params(config, seed=0)
tx, _ = make_optimizer(total_steps=4)
mesh = make_mesh(data_parallel=4)

rng = np.random.default_rng(0)  # same seed on both processes
B, T, accum = 8, 16, 2
ids = rng.integers(4, 64, (B, T)).astype(np.int32)
labels = np.roll(ids, -1, 1).astype(np.int32); labels[:, -1] = -100
batch = {
    "input_ids": ids, "class_ids": np.ones((B, T), np.int32),
    "labels": labels, "attention_mask": np.ones((B, T), np.int32),
}
for name in ATTRIBUTE_ORDER:
    batch[name + "_bin_ids"] = rng.integers(0, 3, (B, T)).astype(np.int32)
batch = reshape_for_accum(batch, accum)

# Process-local rows only (the other half lives on the other host).
per = (B // accum) // 2
local = {k: v[:, proc_id * per:(proc_id + 1) * per] for k, v in batch.items()}
gbatch = make_global_batch(local, mesh, accum=True)

state = init_train_state(params, tx)
step = make_train_step(config, tx, mesh=mesh, compute_dtype=jnp.float32)
state, metrics = step(state, gbatch)
loss = float(metrics["loss"])
print(json.dumps({"proc": proc_id, "loss": loss, "step": int(state.step)}))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER % {"repo": str(REPO)})

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    losses = sorted(o["loss"] for o in outs)
    assert np.isfinite(losses[0])
    # Both hosts computed the SAME global loss (psum over the DCN mesh).
    assert abs(losses[0] - losses[1]) < 1e-6
    assert all(o["step"] == 1 for o in outs)
