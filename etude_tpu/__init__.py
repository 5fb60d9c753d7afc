"""Etude-TPU: a TPU-native (JAX/XLA/Pallas) controllable piano-cover-generation
framework.

Re-implements the full capability surface of the reference Etude framework
(three-stage Extract / Structuralize / Decode pipeline, training, data prep and
evaluation) as an idiomatic JAX stack: every neural stage is a jit-compiled XLA
graph, generation is a KV-cached on-device sampling loop, and training is a
pjit data-parallel step over a `jax.sharding.Mesh`.

Layout (mirrors reference layer map, SURVEY.md §1):
  config/      typed config schema + YAML loader
  utils/       logger, MIDI I/O, audio I/O, checkpointing
  data/        vocab, REMI tokenizer, dataset, extractor/beat/aligner pipelines
  models/      decoder (GPT-NeoX style), AMT hFT transformer, beat transformer,
               source separator
  ops/         mel frontend, on-device sampling, DBN viterbi, peak picking,
               dilated attention
  parallel/    mesh construction + sharded train/infer steps
  evaluation/  WPD / RGC / IPE metrics + reporting
"""

__version__ = "0.1.0"

import os as _os

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    # Persistent compile cache: the hosted-TPU path recompiles 100-900 s per
    # program per process otherwise. Harmless on CPU; override via env.
    _os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_tpu_cache"

if _os.environ.get("ETUDE_PLATFORM"):
    # Reliable platform override. The hosted-TPU site initialization ignores
    # JAX_PLATFORMS, so `JAX_PLATFORMS=cpu` silently still targets the chip;
    # jax.config.update BEFORE first backend use is the mechanism that works
    # (tests/conftest.py does the same). ETUDE_PLATFORM=cpu lets offline
    # scripts run host-side while a training job owns the TPU queue.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["ETUDE_PLATFORM"])
