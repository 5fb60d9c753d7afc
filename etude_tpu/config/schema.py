"""Typed configuration schema.

Hyperparameter values intentionally match the reference framework's data
contract (reference: etude/config/schema.py) so that YAML configs, vocab files
and intermediate JSON artifacts are interchangeable. The structure is extended
with TPU-specific sections (mesh/parallelism, generation engine buckets) that
have no reference counterpart.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Literal, Optional

from pydantic import BaseModel, Field


# ---------------------------------------------------------------- environment
class EnvConfig(BaseModel):
    # "auto" resolves to TPU when available, else CPU.
    device: Literal["auto", "tpu", "cpu"] = "auto"
    separation_backend: Literal["jax_unet", "none"] = "jax_unet"
    seed: int = 1234
    # bf16 compute for all model matmuls (MXU native dtype).
    compute_dtype: Literal["bfloat16", "float32"] = "bfloat16"


class MeshConfig(BaseModel):
    """Device-mesh / parallelism layout for training and batched inference.

    The decoder (~25.5M params) needs no tensor/pipeline parallelism; the
    default layout is pure data parallelism over all local devices, with
    optional FSDP-style parameter sharding for larger configs.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 = all available devices on the data axis.
    data_parallel: int = -1
    model_parallel: int = 1
    # Shard optimizer/params over the data axis (ZeRO-style) when True.
    fsdp: bool = False


# --------------------------------------------------------------------- paths
class PathConfig(BaseModel):
    checkpoints_dir: Path = Path("checkpoints")
    extractor_model: Path = Path("checkpoints/extractor/latest.ckpt")
    beat_detector_model: Path = Path("checkpoints/beat_detector/latest.ckpt")
    separator_model: Path = Path("checkpoints/separator/latest.ckpt")
    decoder_model: Path = Path("checkpoints/decoder/latest.ckpt")
    decoder_config: Path = Path("checkpoints/decoder/etude_decoder_config.json")
    decoder_vocab: Path = Path("checkpoints/decoder/vocab.json")
    hft_model: Path = Path("checkpoints/hft_transformer/latest.ckpt")

    dataset_dir: Path = Path("dataset")
    raw_dir: Path = Path("dataset/raw")
    processed_dir: Path = Path("dataset/processed")
    aligned_dir: Path = Path("dataset/aligned")
    tokenized_dir: Path = Path("dataset/tokenized")
    dataset_vocab: Path = Path("dataset/vocab.json")
    dataset_csv: Path = Path("assets/dataset.csv")

    outputs_dir: Path = Path("outputs")
    train_output_dir: Path = Path("outputs/train")
    infer_output_dir: Path = Path("outputs/infer")
    eval_output_dir: Path = Path("outputs/evaluation")


# ------------------------------------------------------------------ extractor
class ExtractorFeatureConfig(BaseModel):
    sr: int = 16000
    hop_sample: int = 256
    mel_bins: int = 256
    n_bins: int = 256
    fft_bins: int = 2048
    window_length: int = 2048
    log_offset: float = 1e-8
    window: str = "hann"
    pad_mode: str = "constant"


class ExtractorInputConfig(BaseModel):
    margin_b: int = 32
    margin_f: int = 32
    num_frame: int = 512
    min_value: float = -18.0


class ExtractorMidiConfig(BaseModel):
    note_min: int = 21
    note_max: int = 108
    num_note: int = 88
    num_velocity: int = 128


class ExtractorModelConfig(BaseModel):
    cnn_channel: int = 4
    cnn_kernel: int = 5
    dropout: float = 0.1
    transformer_hid_dim: int = 256
    transformer_pf_dim: int = 512
    encoder_n_head: int = 4
    encoder_n_layer: int = 3
    decoder_n_head: int = 4
    decoder_n_layer: int = 3
    sv_dim: int = 24


class ExtractorInferConfig(BaseModel):
    onset_threshold: float = 0.5
    offset_threshold: float = 1.0
    frame_threshold: float = 0.5
    min_duration: float = 0.08
    # How many 512-frame segments to batch per device step (TPU batching of
    # the reference's serial per-segment loop).
    segment_batch: int = 8


class ExtractorConfig(BaseModel):
    feature: ExtractorFeatureConfig = Field(default_factory=ExtractorFeatureConfig)
    input: ExtractorInputConfig = Field(default_factory=ExtractorInputConfig)
    midi: ExtractorMidiConfig = Field(default_factory=ExtractorMidiConfig)
    model: ExtractorModelConfig = Field(default_factory=ExtractorModelConfig)
    infer: ExtractorInferConfig = Field(default_factory=ExtractorInferConfig)


# -------------------------------------------------------------- beat detector
class BeatDetectorModelConfig(BaseModel):
    attn_len: int = 5
    instr: int = 5
    ntoken: int = 2
    dmodel: int = 256
    nhead: int = 8
    d_hid: int = 1024
    nlayers: int = 9
    norm_first: bool = True


class BeatDetectorConfig(BaseModel):
    min_bpm: float = 70.0
    max_bpm: float = 250.0
    fps_divisor: int = 1024
    threshold: float = 0.2
    beats_per_bar: List[int] = Field(default=[3, 4])
    # Tempo-octave disambiguation pass over the DBN output
    # (ops/beat_octave.py): re-scores half/double-time candidates against
    # the activation curve. Off by default until corpus-validated.
    octave_disambiguation: bool = False
    model: BeatDetectorModelConfig = Field(default_factory=BeatDetectorModelConfig)


# ---------------------------------------------------------------- separation
class SeparatorConfig(BaseModel):
    """In-graph JAX source-separation model (replaces the reference's
    Spleeter/Demucs subprocess)."""

    sr: int = 44100
    n_fft: int = 4096
    hop: int = 1024
    num_stems: int = 5
    mel_bins: int = 128
    mel_fmin: float = 30.0
    mel_fmax: float = 11000.0
    base_channels: int = 24
    depth: int = 5
    freq_bins: int = 1024
    channel_cap: int = 192


# ------------------------------------------------------------------------ hft
class HFTInputConfig(BaseModel):
    margin_b: int = 32
    margin_f: int = 32
    num_frame: int = 128
    min_value: float = -80.0


class HFTInferConfig(BaseModel):
    mode: str = "combination"
    thred_mpe: float = 0.5
    thred_onset: float = 0.75
    thred_offset: float = 0.5
    n_stride: int = 32
    bpm: float = 120.0


class HFTConfig(BaseModel):
    feature: ExtractorFeatureConfig = Field(default_factory=ExtractorFeatureConfig)
    input: HFTInputConfig = Field(default_factory=HFTInputConfig)
    midi: ExtractorMidiConfig = Field(default_factory=ExtractorMidiConfig)
    infer: HFTInferConfig = Field(default_factory=HFTInferConfig)


# -------------------------------------------------------------------- decoder
class DecoderConfig(BaseModel):
    hidden_size: int = 512
    num_hidden_layers: int = 8
    num_attention_heads: int = 8
    intermediate_size: int = 2048
    max_position_embeddings: int = 1024

    num_classes: int = 3
    num_attribute_bins: int = 3
    attribute_emb_dim: int = 64
    pad_class_id: int = 0
    attribute_pad_id: int = 0
    context_num_past_xy_pairs: int = 4

    temperature: float = 0.0
    top_p: float = 0.9
    max_output_tokens: int = 25600
    max_bar_token_limit: int = 512

    # TPU generation engine: static prompt-length buckets used to avoid
    # recompiles across variable-length bar prompts.
    prompt_buckets: List[int] = Field(default=[128, 256, 512, 1024])


# ------------------------------------------------------------------ pipelines
class PrepareAlignConfig(BaseModel):
    wp_std_threshold: float = 1.0


class PrepareTokenizeConfig(BaseModel):
    save_format: str = "npy"


class PrepareConfig(BaseModel):
    align: PrepareAlignConfig = Field(default_factory=PrepareAlignConfig)
    tokenize: PrepareTokenizeConfig = Field(default_factory=PrepareTokenizeConfig)


class TrainConfig(BaseModel):
    run_id: str = ""
    resume_from_checkpoint: Optional[str] = None

    data_format: str = "npy"
    num_workers: int = 4

    batch_size: int = 8
    learning_rate: float = 2e-4
    weight_decay: float = 0.01
    adam_beta1: float = 0.9
    adam_beta2: float = 0.98
    num_epochs: int = 200
    # Fractional values are allowed (warmup_steps = steps_per_epoch * this);
    # useful for short warm-start fine-tunes on large datasets.
    warmup_epochs: float = 10
    gradient_accumulation_steps: int = 4
    clip_grad_norm: float = 1.0
    scheduler: str = "cosine_with_warmup"
    max_seq_len: int = 1024

    save_every_n_epochs: int = 10

    # DAgger-style exposure-bias fine-tuning: history Y bars come from the
    # model's own rollouts (NNNN_hist.npy, scripts/dagger_rollouts.py)
    # instead of the teacher bars. Opt-in so generating rollout files never
    # silently changes a plain training run.
    dagger_history: bool = False
    # Per-chunk probability of actually substituting the rollout history
    # when dagger_history is on; the remaining chunks keep the teacher
    # history. <1.0 preserves the teacher-forced conditional while training
    # the free-running one (see data/dataset.py).
    dagger_history_prob: float = 1.0
    # Sample-level attribute dropout (see data/dataset.py): probability of
    # replacing a chunk's attribute bins with the neutral bin 1, matching
    # default serving's constant-neutral conditioning.
    attr_dropout: float = 0.0
    # Warm-start params from a checkpoint's model dir (fresh optimizer /
    # schedule — unlike resume_from_checkpoint which restores both).
    init_from: Optional[Path] = None


class InferConfig(BaseModel):
    cleanup_intermediate: bool = False


class EvalMetricsConfig(BaseModel):
    wpd_subsample_step: int = 1
    wpd_trim_seconds: int = 10
    rgc_top_k: int = 8
    ipe_n_gram: int = 8
    ipe_n_clusters: int = 16


class EvalConfig(BaseModel):
    eval_dir: Path = Path("docs/songs")
    metadata_path: Path = Path("docs/songs/metadata.json")
    report_image_filename: str = "evaluation_summary.png"
    report_csv_filename: str = "evaluation_results.csv"

    versions: Dict[str, str] = Field(
        default={
            "human": "Human",
            "etude_e": "Etude Extractor",
            "etude_d_d": "Etude Decoder - Default",
            "etude_d": "Etude Decoder - Prompted",
            "picogen": "PiCoGen",
            "amtapc": "AMT-APC",
            "music2midi": "Music2MIDI",
        }
    )

    metrics: EvalMetricsConfig = Field(default_factory=EvalMetricsConfig)


# ----------------------------------------------------------------------- root
class EtudeConfig(BaseModel):
    """Root configuration. All parameters have defaults; override via YAML or
    programmatically."""

    env: EnvConfig = Field(default_factory=EnvConfig)
    mesh: MeshConfig = Field(default_factory=MeshConfig)
    paths: PathConfig = Field(default_factory=PathConfig)

    extractor: ExtractorConfig = Field(default_factory=ExtractorConfig)
    beat_detector: BeatDetectorConfig = Field(default_factory=BeatDetectorConfig)
    separator: SeparatorConfig = Field(default_factory=SeparatorConfig)
    hft: HFTConfig = Field(default_factory=HFTConfig)
    decoder: DecoderConfig = Field(default_factory=DecoderConfig)

    prepare: PrepareConfig = Field(default_factory=PrepareConfig)
    train: TrainConfig = Field(default_factory=TrainConfig)
    infer: InferConfig = Field(default_factory=InferConfig)
    eval: EvalConfig = Field(default_factory=EvalConfig)
