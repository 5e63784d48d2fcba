"""Typed configuration tree for the whole framework.

The reference scatters its tunables as class constants
(`platform/backend/trust_engine.py:21-32,47-48`,
`platform/backend/signal_analyzer.py:21-34`,
`platform/backend/anomaly_simulator.py:22-24`,
`platform/backend/video_source.py:29-30`, `platform/backend/main.py:97,122`).
Here every tunable lives in one frozen dataclass tree; the defaults below are
the reference's values and MUST stay equal to them for behavioral parity.

Overrides come from (in priority order): explicit constructor kwargs,
environment variables ``FAV_<SECTION>_<FIELD>``, and defaults.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any


# ── Vision status / policy codes ──────────────────────────────────────────
# Integer codes shared by the host and JAX trust paths. Order encodes failure
# severity (reference uses strings: trust_engine.py:21-26).
STATUS_OK = 0
STATUS_FROZEN = 1
STATUS_BLANK = 2
STATUS_CORRUPTED = 3
STATUS_UNSET = -1

STATUS_NAMES = ("VISION_OK", "VISION_FROZEN", "VISION_BLANK", "VISION_CORRUPTED")
STATUS_CODES = {name: i for i, name in enumerate(STATUS_NAMES)}

POLICY_ALLOWED = 0
POLICY_DECLINING = 1
POLICY_DEGRADED = 2
POLICY_BLOCKED = 3
POLICY_NAMES = ("VISION_ALLOWED", "VISION_DECLINING", "VISION_DEGRADED", "VISION_BLOCKED")
POLICY_CODES = {name: i for i, name in enumerate(POLICY_NAMES)}


def status_code(name: str) -> int:
    return STATUS_CODES[name]


def status_name(code: int) -> str:
    return "UNKNOWN" if code < 0 else STATUS_NAMES[code]


def policy_name(code: int) -> str:
    return POLICY_NAMES[code]


@dataclass(frozen=True)
class TrustParams:
    """Trust-engine constants (reference: trust_engine.py:21-32,47-48,53,61,79-86)."""

    # Per-second reliability rates by status. OK is a recovery (positive);
    # failures decay (trust_engine.py:21-26,190,207,215,223).
    recovery_rate: float = 0.10
    decay_frozen: float = 0.30
    decay_blank: float = 0.60
    decay_corrupted: float = 1.00

    # Bounded ML influence — penalty-only, active only while VISION_OK
    # (trust_engine.py:47-48,192-200).
    ml_gain: float = 0.15
    ml_leak: float = 0.5

    # Asymmetric recovery debt (trust_engine.py:29-32,180-189,203-224).
    debt_max: float = 10.0
    debt_gain: float = 0.008
    recovery_min_coeff: float = 0.03
    debt_drain: float = 0.10

    # Trust velocity EMA (trust_engine.py:50-53,229-235).
    velocity_alpha: float = 0.12
    velocity_dt_floor: float = 0.001

    # Policy gating (trust_engine.py:79-86).
    allowed_threshold: float = 0.7
    degraded_threshold: float = 0.3
    declining_velocity: float = -0.15

    # Contradiction detector (trust_engine.py:92-137).
    contra_window: int = 60
    contra_min_total: int = 30
    contra_min_status: int = 10
    contra_z: float = 3.0
    contra_std_floor: float = 0.001


@dataclass(frozen=True)
class AnalyzerParams:
    """Signal-analyzer constants (reference: signal_analyzer.py:21-34,107-112)."""

    w_blur: float = 0.35
    w_brightness: float = 0.25
    w_freeze: float = 0.15
    w_entropy: float = 0.25

    freeze_diff_threshold: float = 1.0
    freeze_consec_needed: int = 5
    blank_brightness_lo: float = 15.0
    blank_brightness_hi: float = 245.0
    corrupt_entropy_lo: float = 2.0
    corrupt_entropy_hi: float = 7.5
    blur_baseline: float = 500.0

    # entropy scoring bands (signal_analyzer.py:107-112)
    entropy_healthy_lo: float = 4.0
    entropy_healthy_hi: float = 7.0
    entropy_hi_scale: float = 1.5


@dataclass(frozen=True)
class AnomalySimParams:
    """Anomaly-simulator constants (reference: anomaly_simulator.py:22-24,49-77)."""

    baseline_normal: float = 0.019
    baseline_jitter: float = 0.0005
    noise_gain: float = 0.015
    noise_exponent: float = 1.5
    brightness_gain: float = 0.008
    drift_gain: float = 0.001
    drift_freq: float = 0.05
    frozen_factor: float = 0.5
    blank_base: float = 0.005
    blank_jitter: float = 0.001
    corrupted_factor: float = 3.0
    corrupted_jitter: float = 0.005
    floor: float = 0.001


@dataclass(frozen=True)
class VideoParams:
    """Capture / streaming constants (reference: video_source.py:29-30, main.py:97,122)."""

    process_width: int = 320
    process_height: int = 240
    jpeg_quality: int = 40
    default_tick_rate: int = 30
    min_tick_rate: int = 1
    max_tick_rate: int = 60
    playground_dt: float = 1.0 / 30.0
    upload_extensions: tuple = (".mp4", ".avi", ".mov", ".mkv", ".webm")


@dataclass(frozen=True)
class ModelParams:
    """CNN classifier / uncertainty configuration (new — the reference's
    autoencoder lives outside its repo; see SURVEY.md §2.4)."""

    num_classes: int = 10
    image_size: int = 32
    channels: int = 3
    arch: str = "vgg"  # 'vgg' (FailureAwareCNN) | 'resnet' (ResNetSmall) | 'vit'
    widths: tuple = (64, 128, 256)
    dense_width: int = 256
    # ViT family (models/vit.py); heads must divide the mesh 'model' size
    vit_dim: int = 128
    vit_depth: int = 4
    vit_heads: int = 4
    dropout_rate: float = 0.1
    ensemble_size: int = 5
    mc_samples: int = 20
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    # per-image standardization at the forward's front door — invariance to
    # affine luminance veils by construction (the snow/fog/contrast base
    # mechanism; models/cnn.py _standardize docstring). Checkpoint metadata
    # records it so serving/evaluate rebuild the exact forward.
    standardize_input: bool = False


def model_params_from_metadata(base: "ModelParams", meta: dict) -> "ModelParams":
    """Rebuild the architecture a checkpoint was trained with: metadata wins
    over config/CLI defaults — restoring into the wrong template must be
    impossible, not a silent fall-through to random weights (the serving
    integrity rule; used by serving/inference.py and models/evaluate.py)."""
    overrides: dict[str, Any] = {
        k: meta[k]
        for k in ("arch", "dense_width", "vit_dim", "vit_depth", "vit_heads",
                  "standardize_input")
        if meta.get(k) is not None
    }
    if meta.get("widths"):
        overrides["widths"] = tuple(meta["widths"])
    return dataclasses.replace(base, **overrides) if overrides else base


@dataclass(frozen=True)
class MeshParams:
    """Device-mesh layout for pjit sharding (SURVEY.md §2.5)."""

    data_axis: str = "data"
    ensemble_axis: str = "ensemble"
    model_axis: str = "model"
    # default single-chip: (1,1,1); dryrun/multi-chip overrides at call time
    shape: tuple = (1, 1, 1)


@dataclass(frozen=True)
class ServerParams:
    host: str = "0.0.0.0"
    port: int = 8000
    upload_dir: str = "uploads"
    # live-mode CNN scoring via the micro-batched InferenceService. Scores are
    # always attached to the state for display; use_model_anomaly additionally
    # feeds max(analyzer, model) anomaly into the trust engine (default off —
    # the reference's live loop uses the analyzer's fused score alone).
    model_scoring: bool = True
    use_model_anomaly: bool = False
    inference_max_wait_ms: float = 4.0
    # 'msp' | 'mc_dropout' | 'ensemble' | 'autoencoder'
    # (fav_tpu/serving/inference.py; 'autoencoder' serves the reference's
    # canonical reconstruction-error design from the shipped AE checkpoint)
    uncertainty: str = "msp"
    # explicit checkpoint dir for the serving model ("" = per-mode default
    # under fav_tpu/checkpoints/). Point FAV_SERVER_CHECKPOINT at e.g.
    # checkpoints/student_compact to serve the ensemble-distilled compact
    # student (arch is rebuilt from checkpoint metadata either way).
    checkpoint: str = ""
    # decoupled predictor/monitor serving (BENCH.md "Decoupled
    # predictor/monitor deployment"): FAV_SERVER_MONITOR=<checkpoint dir>
    # runs an independent calibrated model in the same micro-batched forward
    # and min-gates the reported confidence ("explicit failure dominates"
    # applied to the pair — the measured fix for accuracy-champion
    # checkpoints that are confidently wrong under shift). "" = single-model
    # serving, unchanged.
    monitor: str = ""
    # micro-batch frame analysis across connections (one device call for N
    # live streams instead of N calls; fav_tpu/serving/analysis.py)
    batched_analysis: bool = True
    # A/B arm only (FAV_SERVER_ENCODE_SYNC=1): await the JPEG encode inside
    # the per-frame gather — the round-4 behavior whose thread-pool queueing
    # (encode p50 93 ms at 8 clients) gated the fresh-analysis rate. The
    # shipped path fire-and-forgets encode with <=1 in flight (serving/app.py).
    encode_sync: bool = False
    # horizontal scale-out: N serving processes sharing one port via
    # SO_REUSEPORT (the kernel load-balances accepts) and one TPU chip via
    # their own tunnel clients. The measured single-process ceiling is the
    # host wire stack (~60 analyzed Hz/core, BENCH.md Serving) while the
    # chip idles at ~2% — workers scale the host side. FAV_SERVER_WORKERS=N.
    workers: int = 1


@dataclass(frozen=True)
class FrameworkConfig:
    trust: TrustParams = field(default_factory=TrustParams)
    analyzer: AnalyzerParams = field(default_factory=AnalyzerParams)
    anomaly_sim: AnomalySimParams = field(default_factory=AnomalySimParams)
    video: VideoParams = field(default_factory=VideoParams)
    model: ModelParams = field(default_factory=ModelParams)
    mesh: MeshParams = field(default_factory=MeshParams)
    server: ServerParams = field(default_factory=ServerParams)

    def replace(self, **sections: Any) -> "FrameworkConfig":
        return dataclasses.replace(self, **sections)


def _coerce(raw: str, target_type: type) -> Any:
    if target_type is bool:
        return raw.lower() in ("1", "true", "yes", "on")
    if target_type is tuple:
        return tuple(part.strip() for part in raw.split(","))
    return target_type(raw)


def _ckpt(name: str) -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "checkpoints", name)


#: One-flag deployment presets (``FAV_PRESET=<name>``), applied BEFORE the
#: per-field env overrides so any ``FAV_SERVER_*`` variable still wins.
#:
#: ``gated`` — the min-gated predictor/monitor pair: the standardized
#: AugMix-KD student predicts (per-image input standardization,
#: models/cnn.py:standardize_image — affine-veil invariance by
#: construction, so the contrast column is solved exactly: 0.831 flat at
#: every severity), the deployed AugMix-KD nano student independently
#: monitors, and the wire confidence is min(predictor, monitor) — the
#: trust lattice's explicit-failure-dominates rule applied to the model
#: pair (reference platform/README.md:58-64 bounded-ML invariant). Two
#: nano forwards per frame ride ONE micro-batched program.
#:
#: Why this pair (round-4 cross-draw study, BENCH.md "Multi-draw
#: validation"): single-model confidence-honesty under shift did NOT
#: replicate across independent data draws, so production serving never
#: rests on one model's intrinsic calibration; and among measured pairings
#: this one is the only deployment with <=2 confident-wrong cells on EVERY
#: draw (0/2/0 vs the occl pairing's 0/3/4; the two residual draw-1 cells
#: are L1-flagged at 0.94-0.97) while winning corrupted accuracy on 2/3
#: draws (0.751/0.835/0.612). Trade-offs, measured: grid ECE 0.093 vs the
#: occl pairing's 0.065 — dominated by SAFE-direction underconfidence
#: where the monitor fails on cells the predictor solved — and -0.033
#: accuracy on the hostile draw 2 in exchange for zeroing its 4
#: confident-wrong cells.
PRESETS: dict[str, dict[str, dict[str, Any]]] = {
    "gated": {
        "server": {
            "checkpoint": _ckpt("student_std"),
            "monitor": _ckpt("student_nano"),
        },
    },
}


def config_from_env(base: FrameworkConfig | None = None) -> FrameworkConfig:
    """Build a config applying ``FAV_<SECTION>_<FIELD>`` environment overrides.

    Example: ``FAV_SERVER_PORT=9000 FAV_MODEL_ENSEMBLE_SIZE=3``.
    ``FAV_PRESET=<name>`` first applies a named deployment preset
    (:data:`PRESETS`); explicit per-field variables override preset values.
    """
    cfg = base or FrameworkConfig()
    preset_name = os.environ.get("FAV_PRESET", "")
    if preset_name:
        if preset_name not in PRESETS:
            raise ValueError(
                f"FAV_PRESET={preset_name!r} unknown (available: {sorted(PRESETS)})"
            )
        for section_name, fields in PRESETS[preset_name].items():
            section = getattr(cfg, section_name)
            cfg = cfg.replace(**{section_name: dataclasses.replace(section, **fields)})
    updates: dict[str, Any] = {}
    for section_field in dataclasses.fields(cfg):
        section = getattr(cfg, section_field.name)
        sec_updates: dict[str, Any] = {}
        for f in dataclasses.fields(section):
            env_key = f"FAV_{section_field.name.upper()}_{f.name.upper()}"
            # empty value = unset (an empty string coerced to tuple would
            # produce ("",) and poison downstream shapes)
            if os.environ.get(env_key):
                base_val = getattr(section, f.name)
                sec_updates[f.name] = _coerce(os.environ[env_key], type(base_val))
        if sec_updates:
            updates[section_field.name] = dataclasses.replace(section, **sec_updates)
    return cfg.replace(**updates) if updates else cfg


DEFAULT_CONFIG = FrameworkConfig()
