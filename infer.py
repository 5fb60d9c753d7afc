#!/usr/bin/env python
"""End-to-end piano cover generation (CLI surface mirrors the reference
infer.py: --input | --decode-only, attribute bins, generation overrides,
work-dir intermediate contract enabling decode-only reruns).

All three neural stages run in-process as jit-compiled XLA programs — the
reference's separation subprocess and per-token host sampling loop are gone.
An added --sweep mode decodes all 27 polyphony/rhythm/sustain combinations as
one batched on-device generation.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path
from urllib.parse import urlparse

from etude_tpu.config import EtudeConfig, load_config
from etude_tpu.data.beat_analyzer import BeatAnalyzer
from etude_tpu.data.beat_detector import BeatDetector
from etude_tpu.data.extractor import AMTAPC_Extractor
from etude_tpu.data.separation import SourceSeparator
from etude_tpu.data.tokenizer import TinyREMITokenizer, split_sequence_into_bars
from etude_tpu.data.vocab import Vocab
from etude_tpu.models.generate import GenerationEngine
from etude_tpu.utils.audio import analyze_volume, save_volume_map
from etude_tpu.utils.download import download_audio_from_url
from etude_tpu.utils.logger import logger
from etude_tpu.utils.model_loader import load_etude_decoder
from etude_tpu.utils.profiling import StageTimer, trace


class InferencePipeline:
    """Audio (file or URL) → piano-cover MIDI."""

    def __init__(self, config: EtudeConfig, allow_random_weights: bool = False,
                 engine_kind: str = "stream", attrs_prior: bool = False):
        self.config = config
        self.allow_random_weights = allow_random_weights
        self.engine_kind = engine_kind
        self.attrs_prior = attrs_prior
        self.output_dir = Path(config.paths.infer_output_dir)
        self.work_dir = self.output_dir / "temp"
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self.timer = StageTimer()
        import jax

        logger.info(f"Backend: {jax.default_backend()} "
                    f"({len(jax.devices())} device(s))")
        logger.info(f"Output directory: {self.output_dir.resolve()}")
        logger.info(f"Working directory: {self.work_dir.resolve()}")

    def _require_weights(self, *stages: str) -> None:
        """Missing model checkpoints are a hard error: random weights produce
        musically meaningless output, so proceeding silently would corrupt
        results. --allow-random-weights is the explicit escape hatch
        (tests / smoke runs)."""
        paths = {
            "extract": [("extractor", self.config.paths.extractor_model)],
            "structuralize": [
                ("separator", self.config.paths.separator_model),
                ("beat detector", self.config.paths.beat_detector_model),
            ],
            "decode": [("decoder", self.config.paths.decoder_model)],
        }
        missing = [
            (name, p) for stage in stages for name, p in paths[stage]
            if not Path(p).exists()
        ]
        if missing and not self.allow_random_weights:
            for name, p in missing:
                logger.error(f"{name} checkpoint not found: {p}")
            logger.error(
                "refusing to run with randomly initialized models; train or "
                "download checkpoints (scripts/train_aux_synthetic.py, "
                "train.py) or pass --allow-random-weights to override"
            )
            sys.exit(1)
        for name, p in missing:
            logger.warn(f"{name}: running with RANDOM weights ({p} missing)")

    def _timed(self, name: str, fn, *args):
        with self.timer.span(name, nested=True):
            return fn(*args)

    # ---- stages --------------------------------------------------------
    def _prepare_audio(self, source: str) -> Path:
        logger.step("Preparing source audio")
        local = self.work_dir / "origin.wav"
        if urlparse(source).scheme in ("http", "https"):
            if not download_audio_from_url(source, local):
                logger.error("audio download failed")
                sys.exit(1)
        elif Path(source).is_file():
            shutil.copy(source, local)
        else:
            logger.error(f"input '{source}' is neither a URL nor a local file")
            sys.exit(1)
        return local

    def _run_stage1_extract(self, audio_path: Path, wave_sr=None,
                            with_volume: bool = True) -> None:
        logger.stage("Extract: audio → feature notes")
        extractor = AMTAPC_Extractor(
            self.config.extractor,
            model_path=self.config.paths.extractor_model,
        )
        extractor.extract(audio_path, self.work_dir / "extract.json",
                          timer=self.timer, wave_sr=wave_sr)
        if with_volume:
            self._run_volume(audio_path, wave_sr)

    def _run_volume(self, audio_path: Path, wave_sr=None) -> None:
        with self.timer.span("extract: volume analysis", nested=True):
            volume = analyze_volume(audio_path, wave_sr=wave_sr)
            save_volume_map(volume, self.work_dir / "volume.json")

    def _run_stage2_structuralize(self, audio_path: Path, wave_sr=None) -> None:
        logger.stage("Structuralize: separation + beat grid")
        logger.step("Source separation (in-process)")
        separator = SourceSeparator(model_path=self.config.paths.separator_model)
        # Device-resident handoff: the beat detector consumes the features
        # directly, skipping the reference's sep.npy disk round trip.
        features = separator.separate_features(audio_path, return_device=True,
                                               timer=self.timer,
                                               wave_sr=wave_sr)

        logger.step("Beat/downbeat detection")
        detector = BeatDetector(
            self.config.beat_detector,
            model_path=self.config.paths.beat_detector_model,
        )
        detector.detect(features, self.work_dir / "beat_pred.json",
                        timer=self.timer)

        logger.step("Tempo analysis")
        analyzer = BeatAnalyzer()
        tempo = analyzer.analyze(self.work_dir / "beat_pred.json")
        analyzer.save_tempo_data(tempo, self.work_dir / "tempo.json")

    def _run_stage3_decode(
        self,
        target_attributes: dict,
        final_filename: str,
        sweep: bool = False,
        seed: int = 0,
    ) -> None:
        logger.stage("Decode: conditional generation")
        with self.timer.span("decode: model load", nested=True):
            vocab = Vocab.load(self.config.paths.decoder_vocab)
            params, model_config = load_etude_decoder(
                self.config.paths.decoder_config,
                self.config.paths.decoder_model,
            )

        with self.timer.span("decode: tokenize condition", nested=True):
            tokenizer = TinyREMITokenizer(
                tempo_path=self.work_dir / "tempo.json"
            )
            condition_events = tokenizer.encode(self.work_dir / "extract.json")
            condition_ids = vocab.encode_sequence(condition_events)
            all_x_bars = split_sequence_into_bars(
                condition_ids, vocab.bar_bos_id, vocab.bar_eos_id
            )
        logger.info(f"prepared {len(all_x_bars)} condition bars")
        if not all_x_bars:
            logger.warn("no condition bars; nothing to decode")
            return

        d = self.config.decoder
        if getattr(self, "engine_kind", "stream") == "stream":
            # Persistent-KV whole-song program: no per-bar re-prefill, no
            # per-bar host round trips (models/generate_stream.py).
            from etude_tpu.models.generate_stream import (
                StreamingGenerationEngine,
            )

            engine = StreamingGenerationEngine(
                model_config,
                bar_bos_id=vocab.bar_bos_id,
                bar_eos_id=vocab.bar_eos_id,
                pad_id=vocab.pad_id,
                max_bar_token_limit=d.max_bar_token_limit,
            )
        else:
            engine = GenerationEngine(
                model_config,
                bar_bos_id=vocab.bar_bos_id,
                bar_eos_id=vocab.bar_eos_id,
                pad_id=vocab.pad_id,
                prompt_buckets=tuple(d.prompt_buckets),
                max_bar_token_limit=d.max_bar_token_limit,
            )

        if sweep:
            combos = [
                {"polyphony_bin": p, "rhythm_intensity_bin": r,
                 "sustain_bin": s,
                 "pitch_overlap_bin": target_attributes["pitch_overlap_bin"]}
                for p in range(3) for r in range(3) for s in range(3)
            ]
            logger.step(f"Batched sweep over {len(combos)} attribute combos")
            # Multi-chip serving: shard the 27 sweep streams over the data
            # axis when more than one device is visible and the engine is
            # the batch-parallel streaming one (params replicated; outputs
            # are token-identical to the single-device run).
            sweep_kw = {}
            import jax as _jax

            if (
                len(_jax.devices()) > 1
                and getattr(self, "engine_kind", "stream") == "stream"
            ):
                from etude_tpu.parallel.mesh import make_mesh

                sweep_kw["mesh"] = make_mesh(model_parallel=1)
            streams = engine.generate_batch(
                params,
                [all_x_bars] * len(combos),
                [[c] * len(all_x_bars) for c in combos],
                temperature=d.temperature,
                top_p=d.top_p,
                max_output_tokens=d.max_output_tokens,
                seed=seed,
                progress=True,
                **sweep_kw,
            )
            for combo, bars in zip(combos, streams):
                events = [
                    e for bar in bars for e in vocab.decode_sequence_to_events(bar)
                ]
                notes = tokenizer.decode_to_notes(
                    events, self.work_dir / "volume.json"
                )
                name = (
                    f"{final_filename}_p{combo['polyphony_bin']}"
                    f"r{combo['rhythm_intensity_bin']}s{combo['sustain_bin']}"
                )
                TinyREMITokenizer.note_to_midi(notes, self.output_dir / f"{name}.mid")
            logger.success(f"sweep MIDI files saved to {self.output_dir}")
            return

        per_bar_attrs = [target_attributes] * len(all_x_bars)
        if getattr(self, "attrs_prior", False):
            # Per-bar bins from the trained source-conditioned predictor
            # (scripts/train_attr_prior.py) instead of one constant combo —
            # conditions the decoder the way its training distribution did.
            from etude_tpu.models.attr_prior import AttrPrior

            prior_path = Path(self.config.paths.checkpoints_dir) / "attr_prior"
            per_bar_attrs = AttrPrior.load(prior_path).predict_bins(
                all_x_bars, vocab, seed=seed
            )
            logger.info("per-bar attributes from the trained predictor")

        with self.timer.span("decode: generate", nested=True):
            bars = engine.generate(
                params, all_x_bars, per_bar_attrs,
                temperature=d.temperature,
                top_p=d.top_p,
                max_output_tokens=d.max_output_tokens,
                seed=seed,
                progress=True,
            )
        generated_events = [
            e for bar in bars for e in vocab.decode_sequence_to_events(bar)
        ]
        if not generated_events:
            logger.warn("model generated an empty sequence")
            return
        with self.timer.span("decode: detokenize+midi", nested=True):
            final_notes = tokenizer.decode_to_notes(
                generated_events, volume_map_path=self.work_dir / "volume.json"
            )
            final_midi = self.output_dir / f"{final_filename}.mid"
            TinyREMITokenizer.note_to_midi(final_notes, final_midi)
        logger.success(f"final MIDI saved to {final_midi.resolve()}")

    # ---- driver --------------------------------------------------------
    def run(
        self,
        audio_source: str,
        target_attributes: dict,
        final_filename: str = "output",
        decode_only: bool = False,
        sweep: bool = False,
        seed: int = 0,
    ) -> None:
        with trace():
            if not decode_only:
                self._require_weights("extract", "structuralize", "decode")
                audio_path = self._prepare_audio(audio_source)
                # Extract and Structuralize are independent consumers of
                # origin.wav: run them concurrently. Device programs
                # serialize on the chip, but each stage's host-side half
                # (peak picking / DBN decode + tempo analysis) overlaps the
                # other's device half.
                import concurrent.futures

                # One decode of origin.wav shared by extract (16 kHz mel),
                # volume (22.05 kHz RMS) and separation (44.1 kHz): each
                # consumer resamples from the native waveform — the same
                # arithmetic path as decoding per stage, read 3x → 1x.
                from etude_tpu.utils.audio import decode_audio

                with self.timer.span("audio decode"):
                    wave_sr = decode_audio(audio_path, target_sr=None,
                                           mono=True)
                with self.timer.span("stage1+2_concurrent"):
                    # Volume analysis is independent of both neural stages:
                    # third task, off the extract critical path.
                    with concurrent.futures.ThreadPoolExecutor(3) as pool:
                        f1 = pool.submit(
                            self._timed, "stage1_extract",
                            self._run_stage1_extract, audio_path, wave_sr,
                            False,
                        )
                        f2 = pool.submit(
                            self._timed, "stage2_structuralize",
                            self._run_stage2_structuralize, audio_path,
                            wave_sr,
                        )
                        f3 = pool.submit(self._run_volume, audio_path,
                                         wave_sr)
                        # Prefetch the decoder weights while the neural
                        # stages run: load_params_only caches per (path,
                        # mtime), so stage 3's load becomes a cache hit
                        # even on a process's first song.
                        pool.submit(
                            load_etude_decoder,
                            self.config.paths.decoder_config,
                            self.config.paths.decoder_model,
                        )
                        f1.result()
                        f2.result()
                        f3.result()
            else:
                logger.skip("stages 1 & 2 (decode-only mode)")
                self._require_weights("decode")
                for name in ("extract.json", "tempo.json", "volume.json"):
                    if not (self.work_dir / name).exists():
                        logger.error(
                            f"missing intermediate '{name}' in {self.work_dir}"
                        )
                        sys.exit(1)
            with self.timer.span("stage3_decode"):
                self._run_stage3_decode(target_attributes, final_filename, sweep, seed)
        self.timer.print_summary("Pipeline timing")
        logger.success("inference pipeline finished")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="End-to-end piano cover generation pipeline."
    )
    parser.add_argument("--config", type=str, default="configs/default.yaml")
    parser.add_argument("--output_name", type=str, default="output")

    source = parser.add_mutually_exclusive_group(required=True)
    source.add_argument("--input", type=str,
                        help="path or URL of the source audio")
    source.add_argument("--decode-only", action="store_true",
                        help="reuse intermediates in the work dir")

    attrs = parser.add_argument_group("Target Attribute Controls")
    attrs.add_argument("--polyphony", type=int, default=1, choices=[0, 1, 2])
    attrs.add_argument("--rhythm", type=int, default=1, choices=[0, 1, 2])
    attrs.add_argument("--sustain", type=int, default=1, choices=[0, 1, 2])
    attrs.add_argument("--overlap", type=int, default=2, choices=[0, 1, 2])

    gen = parser.add_argument_group("Generation Parameters")
    gen.add_argument("--temperature", type=float, default=None)
    gen.add_argument("--top-p", type=float, default=None)
    gen.add_argument("--device", type=str, default=None,
                     choices=["auto", "tpu", "cpu"],
                     help="override device selection (reference surface: "
                          "its cuda/mps choices map to this stack's tpu)")
    gen.add_argument("--seed", type=int, default=0)
    gen.add_argument("--attrs-prior", action="store_true",
                     help="per-bar attribute bins from the trained "
                          "source-conditioned predictor "
                          "(checkpoints/attr_prior) instead of the fixed "
                          "--polyphony/--rhythm/--sustain combo")
    gen.add_argument("--sweep", action="store_true",
                     help="decode all 27 attribute combinations (batched)")
    gen.add_argument("--engine", choices=["stream", "rebuild"],
                     default="stream",
                     help="decode engine: 'stream' = whole-song persistent-KV "
                          "program (fast path); 'rebuild' = per-bar prompt "
                          "rebuild (exact reference semantics)")
    gen.add_argument("--allow-random-weights", action="store_true",
                     help="proceed with random init when checkpoints are "
                          "missing (smoke/testing only — output is "
                          "musically meaningless)")

    args = parser.parse_args(argv)

    if args.device == "cpu":
        # The hosted-TPU plugin registers eagerly and ignores JAX_PLATFORMS;
        # jax.config.update BEFORE first backend use is the mechanism that
        # actually works here (same as tests/conftest.py and
        # scripts/cpu_run.py). "tpu"/"auto" keep jax's default resolution
        # (the accelerator plugin may register under a platform alias,
        # e.g. "axon" on hosted chips — forcing the literal name would
        # reject it).
        import jax

        jax.config.update("jax_platforms", "cpu")

    overrides = {}
    if args.temperature is not None:
        overrides.setdefault("decoder", {})["temperature"] = args.temperature
    if args.top_p is not None:
        overrides.setdefault("decoder", {})["top_p"] = args.top_p
    config = load_config(args.config, overrides)

    target_attributes = {
        "polyphony_bin": args.polyphony,
        "rhythm_intensity_bin": args.rhythm,
        "sustain_bin": args.sustain,
        "pitch_overlap_bin": args.overlap,
    }

    InferencePipeline(
        config, allow_random_weights=args.allow_random_weights,
        engine_kind=args.engine, attrs_prior=args.attrs_prior,
    ).run(
        audio_source=args.input,
        target_attributes=target_attributes,
        final_filename=args.output_name,
        decode_only=args.decode_only,
        sweep=args.sweep,
        seed=args.seed,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
