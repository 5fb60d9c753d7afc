#!/usr/bin/env python
"""Train the auxiliary neural models on synthetic corpora with exact ground
truth (etude_tpu/data/synthetic.py) and ship params-only checkpoints.

The reference pipeline presumes externally trained weights for these models
(extractor: etude/data/extractor.py:108-111; beat model:
etude/data/beat_detector.py:47-55; separation engine:
scripts/run_separation.py). No published weights are redistributable here, so
these runs establish real learning signal end-to-end and produce default
checkpoints the pipeline loads:

    python scripts/train_aux_synthetic.py beat       → checkpoints/beat_detector
    python scripts/train_aux_synthetic.py amt        → checkpoints/extractor
    python scripts/train_aux_synthetic.py separator  → checkpoints/separator
    python scripts/train_aux_synthetic.py all

Each run ends with a held-out-metric evaluation (beat F-measure through the
DBN tracker, onset F1 through the peak picker, stem SDR) recorded in the
checkpoint's metadata.json. To train on a real corpus instead, replace the
batch generator passed to `train_loop` with one yielding the same batch keys
from real features/labels — everything else is unchanged.
"""

from __future__ import annotations

import argparse
import json
import queue
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from etude_tpu.data import synthetic as syn  # noqa: E402
from etude_tpu.utils.logger import logger  # noqa: E402
from etude_tpu.utils.training import save_aux_params  # noqa: E402


# ------------------------------------------------------------------ harness
def prefetch(gen_fn, n_steps: int, depth: int = 4, workers: int = 1):
    """Host-side batch generation on worker threads (the TPU step releases
    the GIL, so generation overlaps device compute even on one core).

    With workers > 1, steps are striped across threads (worker w generates
    steps w, w+workers, ...) and may arrive out of order; gen_fn must then
    derive any per-step randomness from its step index rather than sharing
    a mutable RNG."""
    q: queue.Queue = queue.Queue(maxsize=depth)

    def worker(w):
        for i in range(w, n_steps, workers):
            q.put(gen_fn(i))

    for w in range(workers):
        threading.Thread(target=worker, args=(w,), daemon=True).start()
    for _ in range(n_steps):
        yield q.get()


def train_loop(name, params, loss_fn, gen_fn, steps, lr, log_every=50,
               workers: int = 1):
    """Generic jitted AdamW loop over host-generated batches."""
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            optax.join_schedules(
                [
                    optax.linear_schedule(0.0, lr, max(steps // 20, 1)),
                    optax.cosine_decay_schedule(lr, max(steps, 2)),
                ],
                boundaries=[max(steps // 20, 1)],
            ),
            weight_decay=0.01,
        ),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def wrapped(p):
            out = loss_fn(p, batch)
            return out if isinstance(out, tuple) else (out, {"loss": out})

        (loss, metrics), grads = jax.value_and_grad(wrapped, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    t0 = time.time()
    first_loss = last_loss = None
    window = []
    for i, batch in enumerate(prefetch(gen_fn, steps, workers=workers)):
        params, opt_state, metrics = step(params, opt_state, batch)
        window.append(metrics["loss"])
        if i == 0 or (i + 1) % log_every == 0 or i == steps - 1:
            loss = float(np.mean([float(x) for x in window]))
            window = []
            if first_loss is None:
                first_loss = loss
            last_loss = loss
            logger.info(
                f"[{name}] step {i + 1}/{steps} loss {loss:.4f} "
                f"({(time.time() - t0):.0f}s)"
            )
    return params, {"first_loss": first_loss, "final_loss": last_loss,
                    "steps": steps, "seconds": round(time.time() - t0, 1)}


# --------------------------------------------------------------------- beat
def run_beat(args):
    from etude_tpu.data.synthetic import BEAT_FPS, beat_f_measure
    from etude_tpu.models import beat_transformer as bt
    from etude_tpu.ops.dbn import DBNBeatTracker

    config = bt.BeatTransformerConfig()
    params = bt.init_params(config, seed=args.seed)
    if getattr(args, "init_from", None):
        from etude_tpu.utils.training import load_params_only

        params = load_params_only(args.init_from, params)
        logger.info(f"warm start from {args.init_from}")
    logger.info(f"beat model: {bt.param_count(params) / 1e6:.2f}M params")
    rng = np.random.default_rng(args.seed)
    T = args.beat_frames

    # Optional corpus-piano scene mixing (scripts/gen_beat_scenes.py):
    # each batch draws ~corpus_mix of its rows from the pre-rendered
    # serving-domain scenes, the rest from procedural scenes. This keeps
    # the multi-stem synthetic distribution (which holds the synthetic F)
    # while teaching the solo-piano serving domain.
    scenes = None
    if getattr(args, "scenes_dir", None):
        shards = sorted(Path(args.scenes_dir).glob("shard_*.npz"))
        if shards:
            xs, acts, tempos = [], [], []
            for s in shards:
                with np.load(s) as z:
                    xs.append(z["x"].astype(np.float32))
                    acts.append(z["activations"].astype(np.float32))
                    tempos.append(z["tempo"])
            scenes = {
                "x": np.concatenate(xs),
                "activations": np.concatenate(acts),
                "tempo": np.concatenate(tempos).astype(np.int32),
            }
            logger.info(
                f"corpus scenes: {len(scenes['x'])} windows from "
                f"{len(shards)} shards (mix {args.corpus_mix:.2f})"
            )
        else:
            logger.warn(f"no shards under {args.scenes_dir}; procedural only")

    def gen(_i):
        batch = syn.beat_batch(rng, args.batch, T=T)
        if scenes is not None and args.corpus_mix > 0:
            n_c = int(round(args.batch * args.corpus_mix))
            if n_c:
                idx = rng.integers(len(scenes["x"]), size=n_c)
                batch["x"][:n_c] = scenes["x"][idx][:, :, :T]
                batch["activations"][:n_c] = scenes["activations"][idx][:, :T]
                batch["tempo"][:n_c] = scenes["tempo"][idx]
        return batch

    def loss(p, batch):
        return bt.loss_fn(p, config, batch)

    # Host scene synthesis dominates the step at workers=1 (measured r4:
    # 3.4 s/step); stripe it like the separator loop does.
    params, stats = train_loop("beat", params, loss, gen, args.steps, args.lr,
                               workers=3)

    # Held-out eval: sigmoid activations → DBN tracker → F-measure.
    eval_rng = np.random.default_rng(args.seed + 10_000)
    tracker = DBNBeatTracker(min_bpm=70, max_bpm=250, fps=BEAT_FPS)
    fwd = jax.jit(lambda p, x: jax.nn.sigmoid(bt.forward(p, config, x)[0]))
    scores = []
    for _ in range(args.eval_clips):
        ex = syn.synth_beat_example(eval_rng, T=T)
        act = np.asarray(fwd(params, ex["x"][None])[0], np.float32)
        est = tracker(act[:, 0])
        scores.append(beat_f_measure(est, ex["beat_times"]))
    f_measure = float(np.mean(scores))
    logger.success(f"beat F-measure (held-out synthetic): {f_measure:.3f}")

    stats.update({"beat_f_measure": f_measure,
                  "corpus": ("synthetic-scenes + corpus-piano-scenes"
                             if scenes is not None else "synthetic-scenes"),
                  "corpus_mix": args.corpus_mix if scenes is not None else 0.0,
                  "train_frames": T, "model": "BeatTransformerConfig()"})

    if scenes is not None:
        # Serving-domain eval: held-out corpus songs through the FULL chain
        # (render → separator → forward → DBN) — the number VERDICT r3 #1
        # tracks (was F 0.324 with the procedural-only checkpoint).
        from etude_tpu.config.schema import BeatDetectorConfig
        from etude_tpu.data import corpus_render as cr
        from etude_tpu.data.beat_detector import BeatDetector
        from etude_tpu.data.separation import SourceSeparator

        sys.path.insert(0, str(REPO / "scripts"))
        from validate_beat_corpus import validate

        separator = SourceSeparator(
            model_path=REPO / "checkpoints" / "separator" / "latest.ckpt"
        )
        detector = BeatDetector(BeatDetectorConfig(), params=params)
        _, eval_dirs = cr.split_songs(cr.corpus_song_dirs())
        summary = validate(separator, detector, eval_dirs,
                           n_songs=len(eval_dirs),
                           seconds=args.eval_seconds, snap_gate=0.02)
        logger.success(f"beat F (held-out corpus, full chain): "
                       f"{summary['mean_beat_f']} (octave-tolerant "
                       f"{summary['mean_beat_f_octave']})")
        stats.update({
            "beat_f_corpus": summary["mean_beat_f"],
            "beat_f_corpus_octave": summary["mean_beat_f_octave"],
            "beat_f_per_song": {r["song"]: r["beat_f"]
                                for r in summary["songs"]},
            "eval_songs": [d.name for d in eval_dirs],
        })

    out = REPO / "checkpoints" / "beat_detector" / "latest.ckpt"
    save_aux_params(out, params, metadata=stats)
    logger.success(f"saved {out}")
    return f_measure


# ---------------------------------------------------------------------- amt
def _amt_spec_from_wave(wave, fc_margin, n_frame):
    """Rendered wave → margin-padded [n_bin, margin+T+margin] spec (host).

    Uses the numpy mel: a device mel per generated example would serialize
    the prefetch thread on (remote-tunneled) device round trips."""
    from etude_tpu.ops.mel import log_mel_spectrogram_host

    logmel = log_mel_spectrogram_host(
        wave, sr=syn.AMT_SR, n_fft=2048, hop=syn.AMT_HOP,
        win_length=2048, n_mels=256, log_offset=1e-8,
    )  # [T', 256]
    T = logmel.shape[0]
    if T < n_frame:
        logmel = np.pad(logmel, ((0, n_frame - T), (0, 0)),
                        constant_values=-18.0)
    spec = np.full((256, n_frame + 2 * fc_margin), -18.0, np.float32)
    spec[:, fc_margin:fc_margin + n_frame] = logmel[:n_frame].T
    return spec


def run_amt(args):
    from etude_tpu.models import amt

    config = amt.AMTConfig()  # inference shape: n_frame 512, margins 32
    params = amt.init_params(config, seed=args.seed)
    if getattr(args, "init_from", None):
        from etude_tpu.utils.training import load_params_only

        params = load_params_only(args.init_from, params)
        logger.info(f"warm start from {args.init_from}")
    logger.info(f"amt model: {amt.param_count(params) / 1e6:.2f}M params")
    rng = np.random.default_rng(args.seed)

    fps = syn.AMT_SR / syn.AMT_HOP
    dur = config.n_frame / fps + 0.3

    def make_example(r, density=None):
        # Training sees a density sweep (2–10 notes/s): denser clips carry
        # ~3x the positive onset cells per step, and the spread covers both
        # sparse and chordal textures. Held-out eval keeps the default 3/s.
        nps = density if density is not None else float(r.uniform(2.0, 10.0))
        notes = syn.synth_piano_notes(r, dur, notes_per_sec=nps)
        wave = syn.render_piano(notes, dur)
        spec = _amt_spec_from_wave(wave, config.n_margin, config.n_frame)
        targets = syn.amt_targets(notes, config.n_frame, fps=fps)
        return spec, targets, notes

    # Onset/offset targets are ~0.05% positive: weight the positive class so
    # the heads escape the all-zeros solution, then ANNEAL the weight to 1.0
    # (linear over the first `anneal_frac` of steps) so the FINAL model is
    # calibrated
    # for the reference's 0.5 peak-picking threshold — a model trained at
    # constant weight w fires at p_w = w·p/(w·p+1−p) and floods the picker.
    # Velocity CE is confined to sounding cells (silent weight 0): the picker
    # reads velocity only at onset peaks, and the majority silence class
    # would otherwise win the argmax and ignore_zero would drop every note.
    anneal_frac = 0.3
    # Warm starts are already past the all-zeros phase: stay calibrated.
    w0_onset, w0_mpe = (1.0, 1.0) if getattr(args, "init_from", None) \
        else (120.0, 3.0)

    def weights_at(i):
        t = min(i / max(args.steps * anneal_frac, 1), 1.0)
        return {
            "onset": np.float32(1.0 + (w0_onset - 1.0) * (1.0 - t)),
            "offset": np.float32(1.0 + (w0_onset - 1.0) * (1.0 - t)),
            "mpe": np.float32(1.0 + (w0_mpe - 1.0) * (1.0 - t)),
        }

    def gen(i):
        specs, tg = [], {"onset": [], "offset": [], "mpe": [], "velocity": []}
        for _ in range(args.batch):
            spec, targets, _notes = make_example(rng)
            specs.append(spec)
            for k in tg:
                tg[k].append(targets[k])
        batch = {k: np.stack(v) for k, v in tg.items()}
        batch["spec"] = np.stack(specs)
        batch["pos_w"] = weights_at(i)
        return batch

    # Gradient balance on the shared trunk: the velocity CE's natural scale
    # (~ln 128 per branch) starves the onset/offset heads once their BCEs
    # converge toward ~1e-2 — the trunk then learns sustained-note features
    # and the onset activation smears instead of peaking. Scaling terms
    # (BOTH classes) keeps every head calibrated while fixing the balance.
    head_scales = {"onset": 5.0, "offset": 5.0, "mpe": 1.0, "velocity": 0.1}

    def loss(p, batch):
        pos_weights = dict(batch["pos_w"])
        pos_weights.update({"velocity": 1.0, "velocity_silent": 0.0})
        return amt.loss_fn(p, config, batch, remat=True,
                           pos_weights=pos_weights, head_scales=head_scales)

    params, stats = train_loop("amt", params, loss, gen, args.steps, args.lr)

    # Held-out eval: peak-picked notes vs ground truth → onset F1.
    from etude_tpu.evaluation.metrics.onset_f1 import onset_f1
    from etude_tpu.ops.peakpick import activations_to_notes

    eval_rng = np.random.default_rng(args.seed + 10_000)
    fwd = jax.jit(lambda p, s: amt.forward(p, config, s))
    f1s = []
    for _ in range(args.eval_clips):
        spec, _targets, notes = make_example(eval_rng, density=3.0)
        out = fwd(params, spec[None])
        est = activations_to_notes(
            np.asarray(out["onset_time"][0], np.float32),
            np.asarray(out["offset_time"][0], np.float32),
            np.asarray(out["mpe_time"][0], np.float32),
            np.asarray(jnp.argmax(out["velocity_time"][0], -1), np.int32),
            hop_sec=syn.AMT_HOP / syn.AMT_SR,
        )
        f1s.append(onset_f1(notes, est)["f1"])
    f1 = float(np.mean(f1s))
    logger.success(f"amt onset F1 (held-out synthetic): {f1:.3f}")

    stats.update({"onset_f1": f1, "corpus": "synthetic-additive-piano",
                  "model": "AMTConfig()"})
    out_path = REPO / "checkpoints" / "extractor" / "latest.ckpt"
    save_aux_params(out_path, params, metadata=stats)
    logger.success(f"saved {out_path}")
    return f1


# --------------------------------------------------------------- amt-corpus
def eval_extract_corpus(params, eval_dirs, seconds: float = 120.0,
                        work_dir: Path = Path("/tmp/etude_amt_eval")):
    """Held-out full-path fidelity: render each eval song's human.mid at
    44.1 kHz (the bench_e2e serving chain), run the COMPLETE extract
    pipeline (decode→resample→device mel→segmented forward→peak picking),
    and score onset F1 against the song's own notes."""
    from etude_tpu.config.schema import ExtractorConfig
    from etude_tpu.data.extractor import AMTAPC_Extractor
    from etude_tpu.data.synthetic import render_piano
    from etude_tpu.evaluation.metrics.onset_f1 import onset_f1
    from etude_tpu.utils.audio import save_wav
    from etude_tpu.utils.midi import read_midi_notes

    work_dir.mkdir(parents=True, exist_ok=True)
    extractor = AMTAPC_Extractor(ExtractorConfig(), params=params)
    per_song = {}
    for d in eval_dirs:
        ref = [n for n in read_midi_notes(d / "human.mid")
               if n["onset"] < seconds - 2]
        if not ref:
            continue
        wav = work_dir / f"{d.name}.wav"
        save_wav(wav, render_piano(ref, seconds, sr=44100), 44100)
        est = extractor.extract(wav, work_dir / f"{d.name}.json")
        est = [n for n in est if n["onset"] < seconds - 2]
        per_song[d.name] = round(onset_f1(ref, est)["f1"], 4)
        logger.info(f"[amt-corpus eval] {d.name}: onset F1 {per_song[d.name]:.3f}")
    mean_f1 = float(np.mean(list(per_song.values()))) if per_song else 0.0
    return mean_f1, per_song


def run_amt_corpus(args):
    """Fine-tune the extractor on rendered-corpus windows through the serving
    signal chain (data/corpus_render.py), mixed with serving-chain synthetic
    clips so the random-note skill is retained. Warm-starts from the shipped
    synthetic checkpoint by default."""
    from etude_tpu.data import corpus_render as cr
    from etude_tpu.models import amt

    config = amt.AMTConfig()
    params = amt.init_params(config, seed=args.seed)
    init_from = getattr(args, "init_from", None) or str(
        REPO / "checkpoints" / "extractor" / "latest.ckpt"
    )
    if Path(init_from).exists():
        from etude_tpu.utils.training import load_params_only

        params = load_params_only(init_from, params)
        logger.info(f"warm start from {init_from}")
    else:
        init_from = None
        logger.warn("no warm-start checkpoint found; training from scratch")
    logger.info(f"amt model: {amt.param_count(params) / 1e6:.2f}M params")

    dirs = cr.corpus_song_dirs()
    train_dirs, eval_dirs = cr.split_songs(dirs)
    logger.info(f"corpus: {len(train_dirs)} train songs, "
                f"{len(eval_dirs)} held-out eval songs "
                f"({', '.join(d.name for d in eval_dirs)})")
    pool = cr.CorpusNotePool(train_dirs)

    fps = syn.AMT_SR / syn.AMT_HOP
    dur = config.n_frame / fps + 0.3
    corpus_frac = 0.7

    # Warm starts are past the all-zeros phase: stay calibrated at weight 1.
    w0_onset, w0_mpe = (1.0, 1.0) if init_from else (120.0, 3.0)
    anneal_frac = 0.3

    def weights_at(i):
        t = min(i / max(args.steps * anneal_frac, 1), 1.0)
        return {
            "onset": np.float32(1.0 + (w0_onset - 1.0) * (1.0 - t)),
            "offset": np.float32(1.0 + (w0_onset - 1.0) * (1.0 - t)),
            "mpe": np.float32(1.0 + (w0_mpe - 1.0) * (1.0 - t)),
        }

    def gen(i):
        # Per-step RNG: multi-worker prefetch stripes steps across threads,
        # so randomness must be a pure function of the step index.
        r = np.random.default_rng((args.seed, i))
        specs, tg = [], {"onset": [], "offset": [], "mpe": [], "velocity": []}
        for _ in range(args.batch):
            if r.random() < corpus_frac:
                notes = pool.sample_window(r, dur)
            else:
                notes = []
            if not notes:
                nps = float(r.uniform(2.0, 10.0))
                notes = syn.synth_piano_notes(r, dur, notes_per_sec=nps)
            wave = cr.render_serving(notes, dur)
            specs.append(_amt_spec_from_wave(wave, config.n_margin,
                                             config.n_frame))
            targets = syn.amt_targets(notes, config.n_frame, fps=fps)
            for k in tg:
                tg[k].append(targets[k])
        batch = {k: np.stack(v) for k, v in tg.items()}
        batch["spec"] = np.stack(specs)
        batch["pos_w"] = weights_at(i)
        return batch

    head_scales = {"onset": 5.0, "offset": 5.0, "mpe": 1.0, "velocity": 0.1}

    def loss(p, batch):
        pos_weights = dict(batch["pos_w"])
        pos_weights.update({"velocity": 1.0, "velocity_silent": 0.0})
        return amt.loss_fn(p, config, batch, remat=True,
                           pos_weights=pos_weights, head_scales=head_scales)

    params, stats = train_loop("amt-corpus", params, loss, gen,
                               args.steps, args.lr, workers=3)

    mean_f1, per_song = eval_extract_corpus(
        params, eval_dirs, seconds=args.eval_seconds
    )
    logger.success(
        f"amt-corpus onset F1 (held-out corpus, full path): {mean_f1:.3f}"
    )

    stats.update({
        "onset_f1_corpus": mean_f1,
        "onset_f1_per_song": per_song,
        "eval_seconds": args.eval_seconds,
        "corpus": "rendered-corpus(serving-chain)+synthetic",
        "corpus_frac": corpus_frac,
        "train_songs": len(train_dirs),
        "eval_songs": [d.name for d in eval_dirs],
        "warm_start": init_from,
        "model": "AMTConfig()",
    })
    out_path = REPO / "checkpoints" / "extractor" / "latest.ckpt"
    save_aux_params(out_path, params, metadata=stats)
    logger.success(f"saved {out_path}")
    return mean_f1


# --------------------------------------------------- beat corpus fine-tune
def _beat_act_from_times(times, down_times, start_frame, T, fps):
    """Beat/downbeat times (song-absolute seconds) → widened activation
    targets for a [start_frame, start_frame+T) feature window (the same
    madmom-style ±1-frame 0.5 widening as synth_beat_example)."""
    act = np.zeros((T, 2), np.float32)
    down = set(np.round(np.asarray(down_times) * fps).astype(int).tolist())
    for t in np.asarray(times):
        frame = int(round(t * fps)) - start_frame
        is_down = int(round(t * fps)) in down
        for d, w in ((-1, 0.5), (0, 1.0), (1, 0.5)):
            f = frame + d
            if 0 <= f < T:
                act[f, 0] = max(act[f, 0], w)
                if is_down:
                    act[f, 1] = max(act[f, 1], w)
    return act


def prepare_beat_feature_cache(song_dirs, cache_dir: Path, seconds: float,
                               snap_gate: float,
                               versions=("etude_d", "etude_d_d")):
    """One-time serving-chain feature cache for beat fine-tuning.

    Per (song, version) with a snap-gated grid (the decoder output MIDIs are
    grid-quantized by construction — scripts/validate_beat_corpus.py):
    44.1 kHz render → int16 WAV → SourceSeparator serving features
    [5, T, 128] dB, cached as f16 npz with the grid's beat/downbeat times.
    """
    from etude_tpu.data.separation import SourceSeparator
    from etude_tpu.data.synthetic import render_piano
    from etude_tpu.utils.audio import save_wav

    sys.path.insert(0, str(REPO / "scripts"))
    from validate_beat_corpus import grid_beat_times, snap_gated_song

    cache_dir.mkdir(parents=True, exist_ok=True)
    separator = None
    entries = []
    for d in song_dirs:
        for version in versions:
            out = cache_dir / f"{d.name}_{version}.npz"
            if out.exists():
                entries.append(out)
                continue
            gated = snap_gated_song(d / f"{version}.mid", seconds, snap_gate)
            if gated is None:
                continue
            notes, tempo, _snap = gated
            if separator is None:
                separator = SourceSeparator(
                    model_path=REPO / "checkpoints" / "separator" / "latest.ckpt"
                )
            horizon = max(n["offset"] for n in notes)
            # Host renders are the slow part (~25 s per 4-min song on one
            # core): a pre-rendered per-entry WAV is reused when present so
            # rendering can be pipelined separately from the (device-bound)
            # separator features; it is removed once the npz is written.
            wav = cache_dir / f"{d.name}_{version}.wav"
            if not wav.exists():
                save_wav(wav, render_piano(notes, horizon + 1.0, sr=44100), 44100)
            features = separator.separate_features(wav)
            beats = grid_beat_times(tempo, horizon)
            downs = np.asarray(
                [t for r in tempo for t in r["downbeats"]], np.float32
            )
            np.savez_compressed(
                out, features=features.astype(np.float16),
                beat_times=beats.astype(np.float32), downbeat_times=downs,
                bpm=np.float32(tempo[0]["bpm"]),
            )
            entries.append(out)
            wav.unlink(missing_ok=True)  # ~40 MB each; npz supersedes it
            logger.info(f"[beat-corpus cache] {out.name}: "
                        f"{features.shape[1]} frames, {len(beats)} beats")
    return entries


def run_beat_corpus(args):
    """Fine-tune the Beat-Transformer on rendered-corpus covers through the
    serving feature chain (render → separator U-Net → dB mel), mixed with
    synthetic scenes so the multi-stem skill is retained — the same recipe
    that closed the extractor's real-audio gap (run_amt_corpus). Solo-piano
    covers are far off the synthetic-scene distribution (measured mean beat
    F 0.34 before this fine-tune, scripts/validate_beat_corpus.py)."""
    from etude_tpu.config.schema import BeatDetectorConfig
    from etude_tpu.data import corpus_render as cr
    from etude_tpu.data.beat_detector import BeatDetector
    from etude_tpu.data.separation import SourceSeparator
    from etude_tpu.data.synthetic import BEAT_FPS, beat_f_measure
    from etude_tpu.models import beat_transformer as bt
    from etude_tpu.ops.dbn import DBNBeatTracker

    sys.path.insert(0, str(REPO / "scripts"))
    from validate_beat_corpus import validate

    config = bt.BeatTransformerConfig()
    params = bt.init_params(config, seed=args.seed)
    init_from = getattr(args, "init_from", None) or str(
        REPO / "checkpoints" / "beat_detector" / "latest.ckpt"
    )
    if Path(init_from).exists():
        from etude_tpu.utils.training import load_params_only

        params = load_params_only(init_from, params)
        logger.info(f"warm start from {init_from}")
    else:
        init_from = None
        logger.warn("no warm-start checkpoint found; training from scratch")

    train_dirs, eval_dirs = cr.split_songs(cr.corpus_song_dirs())
    if args.corpus_limit:
        train_dirs = train_dirs[:args.corpus_limit]
        eval_dirs = eval_dirs[:max(args.corpus_limit // 4, 1)]
    cache_dir = REPO / "outputs" / "beat_corpus_cache"
    logger.info(f"corpus: {len(train_dirs)} train songs, "
                f"{len(eval_dirs)} held-out ({', '.join(d.name for d in eval_dirs)})")
    entries = prepare_beat_feature_cache(
        train_dirs, cache_dir, seconds=args.eval_seconds + 60.0,
        snap_gate=0.02,
    )
    if not entries:
        logger.error("no cached beat-corpus features; aborting")
        return 0.0
    logger.info(f"feature cache: {len(entries)} song-versions")
    # Read-only after this point: shared safely across prefetch workers.
    cache = {}
    for p in entries:
        z = np.load(p)
        cache[p.name] = {k: z[k] for k in z.files}
    names = sorted(cache)

    T = args.beat_frames
    corpus_frac = 0.5

    def corpus_example(r):
        e = cache[names[int(r.integers(len(names)))]]
        T_song = e["features"].shape[1]
        if T_song <= T + 2:
            return None
        s = int(r.integers(0, T_song - T))
        x = e["features"][:, s:s + T].astype(np.float32)
        act = _beat_act_from_times(e["beat_times"], e["downbeat_times"],
                                   s, T, BEAT_FPS)
        tempo = np.int32(np.clip(round(float(e["bpm"])), 0, 299))
        return {"x": x, "activations": act, "tempo": tempo}

    def gen(i):
        r = np.random.default_rng((args.seed, i))
        xs, acts, tempos = [], [], []
        for _ in range(args.batch):
            ex = corpus_example(r) if r.random() < corpus_frac else None
            if ex is None:
                s = syn.synth_beat_example(r, T=T)
                ex = {"x": s["x"], "activations": s["activations"],
                      "tempo": s["tempo"]}
            xs.append(ex["x"])
            acts.append(ex["activations"])
            tempos.append(ex["tempo"])
        return {"x": np.stack(xs), "activations": np.stack(acts),
                "tempo": np.stack(tempos)}

    def loss(p, batch):
        return bt.loss_fn(p, config, batch)

    params, stats = train_loop("beat-corpus", params, loss, gen,
                               args.steps, args.lr, workers=2)

    # Held-out eval 1: rendered corpus songs through the FULL chain
    # (render → separator → forward → DBN), the serving-domain number.
    separator = SourceSeparator(
        model_path=REPO / "checkpoints" / "separator" / "latest.ckpt"
    )
    detector = BeatDetector(BeatDetectorConfig(), params=params)
    corpus_summary = validate(separator, detector, eval_dirs,
                              n_songs=len(eval_dirs),
                              seconds=args.eval_seconds, snap_gate=0.02)
    logger.success(
        f"beat-corpus F (held-out corpus, full chain): "
        f"{corpus_summary['mean_beat_f']}"
    )

    # Held-out eval 2: synthetic scenes (retention check).
    eval_rng = np.random.default_rng(args.seed + 10_000)
    tracker = DBNBeatTracker(min_bpm=70, max_bpm=250, fps=BEAT_FPS)
    fwd = jax.jit(lambda p, x: jax.nn.sigmoid(bt.forward(p, config, x)[0]))
    scores = []
    for _ in range(args.eval_clips):
        ex = syn.synth_beat_example(eval_rng, T=T)
        act = np.asarray(fwd(params, ex["x"][None])[0], np.float32)
        scores.append(beat_f_measure(tracker(act[:, 0]), ex["beat_times"]))
    synth_f = float(np.mean(scores))
    logger.success(f"beat F (held-out synthetic, retention): {synth_f:.3f}")

    stats.update({
        "beat_f_corpus": corpus_summary["mean_beat_f"],
        "beat_f_corpus_octave": corpus_summary["mean_beat_f_octave"],
        "beat_f_per_song": {r["song"]: r["beat_f"]
                            for r in corpus_summary["songs"]},
        "beat_f_synthetic": synth_f,
        "corpus": "rendered-corpus(serving-chain)+synthetic-scenes",
        "corpus_frac": corpus_frac,
        "train_song_versions": len(entries),
        "eval_songs": [d.name for d in eval_dirs],
        "warm_start": init_from,
        "train_frames": T,
        "model": "BeatTransformerConfig()",
    })
    out = REPO / "checkpoints" / "beat_detector" / "latest.ckpt"
    save_aux_params(out, params, metadata=stats)
    logger.success(f"saved {out}")
    return corpus_summary["mean_beat_f"]


# ---------------------------------------------------------------- separator
def run_separator(args):
    from etude_tpu.data.synthetic import stem_sdr
    from etude_tpu.models import separator as sep

    config = sep.SeparatorConfig()
    params = sep.init_params(config, seed=args.seed)
    if getattr(args, "init_from", None):
        from etude_tpu.utils.training import load_params_only

        params = load_params_only(Path(args.init_from), params)
        logger.info(f"separator warm-started from {args.init_from}")
    logger.info(f"separator: {sep.param_count(params) / 1e6:.2f}M params")
    rng = np.random.default_rng(args.seed)
    T = args.sep_frames

    # Pseudo-pop audio-domain examples (VERDICT r4 #6): realistic five-stem
    # mixtures rendered from TRAIN-split corpus grids through the serving
    # STFT — the procedural magnitude stems alone leave harmonic stems
    # below the mix-as-estimate baseline on realistic mixtures.
    pp_pool, pp_mix = None, float(getattr(args, "pseudopop_mix", 0.0))
    # Pre-rendered example cache (scripts/gen_pseudopop_sep_examples.py):
    # on this single-core host, on-the-fly stem rendering dominates the
    # training step; the cache turns the pseudo-pop rows into array lookups.
    pp_cache = None
    cache_dir = getattr(args, "pseudopop_cache", None)
    if pp_mix > 0 and cache_dir:
        shards = sorted(Path(cache_dir).glob("shard_*.npz"))
        if shards:
            ms, ss = [], []
            for s in shards:
                with np.load(s) as z:
                    ms.append(z["mix_mag"].astype(np.float32))
                    ss.append(z["stem_mags"].astype(np.float32))
            pp_cache = {"mix_mag": np.concatenate(ms),
                        "stem_mags": np.concatenate(ss)}
            logger.info(f"pseudo-pop cache: {len(pp_cache['mix_mag'])} "
                        f"pre-rendered examples from {len(shards)} shards")
        else:
            logger.warn(f"no shards under {cache_dir}; rendering on the fly")
    if pp_mix > 0 and pp_cache is None:
        sys.path.insert(0, str(REPO / "scripts"))
        from gen_beat_scenes import snap_gated_pool
        from gen_pseudopop_scenes import sample_window  # noqa: F401

        from etude_tpu.data import corpus_render as cr

        train_dirs, _ = cr.split_songs(cr.corpus_song_dirs())
        pp_pool = snap_gated_pool(train_dirs, 0.02)
        logger.info(f"pseudo-pop pool: {len(pp_pool)} grids "
                    f"(mix {pp_mix:.2f})")

    def _pseudopop_example():
        from gen_pseudopop_scenes import sample_window

        from etude_tpu.data.pseudopop import (
            build_stems, separation_example_from_stems,
        )

        dur = (T * 1024) / 44100.0 + 0.05
        while True:
            spec = sample_window(rng, pp_pool, dur)
            if spec is None:
                continue
            aug, b_in, d_in, gains, drum_jitter, _act, _bpm = spec
            mix, stems, _ = build_stems(
                aug, b_in, d_in, dur, sr=44100,
                seed=int(rng.integers(2 ** 31)),
                gains=gains, drum_jitter=drum_jitter, rng=rng,
            )
            if float(np.abs(mix).max()) < 1e-4:
                continue
            return separation_example_from_stems(mix, stems, T=T)

    def gen(_i):
        batch = syn.separation_batch(rng, args.batch, T=T)
        n_pp = int(round(args.batch * pp_mix))
        if pp_cache is not None and n_pp:
            idx = rng.integers(len(pp_cache["mix_mag"]), size=n_pp)
            Tc = min(pp_cache["mix_mag"].shape[1], T)
            batch["mix_mag"][:n_pp, :Tc] = pp_cache["mix_mag"][idx][:, :Tc]
            batch["stem_mags"][:n_pp, :, :Tc] = (
                pp_cache["stem_mags"][idx][:, :, :Tc])
        elif pp_pool:
            for b in range(n_pp):
                ex = _pseudopop_example()
                batch["mix_mag"][b] = ex["mix_mag"]
                batch["stem_mags"][b] = ex["stem_mags"]
        # Per-example loudness normalization: the L1 objective otherwise
        # weights loud mixes more and the mask head chases overall scale.
        rms = np.sqrt((batch["mix_mag"] ** 2).mean(axis=(1, 2), keepdims=True))
        rms = np.maximum(rms, 1e-6)
        batch["mix_mag"] /= rms
        batch["stem_mags"] /= rms[:, None]
        return batch

    def loss(p, batch):
        return sep.loss_fn(p, config, batch)

    params, stats = train_loop("separator", params, loss, gen,
                               args.steps, args.lr)

    # Held-out eval: magnitude SDR of masked mixture vs uniform-mask baseline.
    eval_rng = np.random.default_rng(args.seed + 10_000)
    fwd = jax.jit(lambda p, m: sep.forward(p, config, jnp.log1p(m)))
    sdrs, base_sdrs = [], []
    for _ in range(args.eval_clips):
        ex = syn.synth_separation_example(eval_rng, T=T)
        rms = max(float(np.sqrt((ex["mix_mag"] ** 2).mean())), 1e-6)
        ex = {k: v / rms for k, v in ex.items()}
        masks = np.asarray(fwd(params, ex["mix_mag"][None])[0], np.float32)
        est = masks * ex["mix_mag"][None]
        sdrs.append(stem_sdr(est, ex["stem_mags"]).mean())
        base = np.repeat(ex["mix_mag"][None] / 5.0, 5, axis=0)
        base_sdrs.append(stem_sdr(base, ex["stem_mags"]).mean())
    sdr, base = float(np.mean(sdrs)), float(np.mean(base_sdrs))
    logger.success(
        f"separator stem SDR (held-out synthetic): {sdr:.2f} dB "
        f"(uniform-mask baseline {base:.2f} dB)"
    )

    stats.update({"stem_sdr_db": sdr, "baseline_sdr_db": base,
                  "corpus": ("synthetic-stems + pseudo-pop audio stems "
                             f"(mix {pp_mix:.2f})" if pp_pool
                             else "synthetic-stems"),
                  "train_frames": T,
                  "model": "SeparatorConfig()"})
    out = REPO / "checkpoints" / "separator" / "latest.ckpt"
    save_aux_params(out, params, metadata=stats)
    logger.success(f"saved {out}")
    return sdr


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "model",
        choices=["beat", "beat-corpus", "amt", "amt-corpus", "separator", "all"],
    )
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval-clips", type=int, default=8)
    parser.add_argument("--beat-frames", type=int, default=512)
    parser.add_argument("--sep-frames", type=int, default=256)
    parser.add_argument("--init-from", type=str, default=None,
                        help="warm-start params checkpoint (amt)")
    parser.add_argument("--eval-seconds", type=float, default=120.0,
                        help="per-song audio horizon for amt-corpus eval")
    parser.add_argument("--corpus-limit", type=int, default=0,
                        help="cap train/eval songs (beat-corpus smoke runs)")
    parser.add_argument("--scenes-dir", type=str, default=None,
                        help="beat: mix in pre-rendered corpus-piano scenes "
                             "(scripts/gen_beat_scenes.py output)")
    parser.add_argument("--corpus-mix", type=float, default=0.5,
                        help="beat: fraction of each batch drawn from "
                             "--scenes-dir")
    parser.add_argument("--pseudopop-cache", type=str, default=None,
                        help="separator: dir of pre-rendered pseudo-pop "
                             "example shards (scripts/"
                             "gen_pseudopop_sep_examples.py); avoids "
                             "on-the-fly rendering on 1-core hosts")
    parser.add_argument("--pseudopop-mix", type=float, default=0.0,
                        help="separator: fraction of each batch rendered "
                             "on the fly as pseudo-pop audio stems through "
                             "the serving STFT (TRAIN-split corpus grids)")
    args = parser.parse_args(argv)

    defaults = {"beat": (8, 5e-4), "beat-corpus": (8, 1.5e-4),
                "amt": (4, 4e-4), "amt-corpus": (4, 1.5e-4),
                "separator": (4, 1e-3)}
    targets = ["beat", "amt", "separator"] if args.model == "all" else [args.model]
    for name in targets:
        batch, lr = defaults[name]
        run = {"beat": run_beat, "beat-corpus": run_beat_corpus,
               "amt": run_amt, "amt-corpus": run_amt_corpus,
               "separator": run_separator}[name]
        sub = argparse.Namespace(**vars(args))
        sub.batch = args.batch or batch
        sub.lr = args.lr or lr
        logger.stage(f"Training {name} (synthetic corpus)")
        run(sub)
    return 0


if __name__ == "__main__":
    sys.exit(main())
