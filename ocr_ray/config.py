"""Engine / pipeline configuration.

Mirrors the knob surface of the reference's per-engine configs
(`/root/reference/app/config.py:85-118` — preprocessing + splitting
overrides per OCR engine) as plain dataclasses that are cheap to
broadcast into Ray tasks/actors by closure capture (SURVEY.md §2.7 J3).
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class PreprocessConfig:
    """Knobs for the preprocessing chain (reference: app/config.py:16-40)."""

    auto_invert: bool = True
    denoise: bool = True
    denoise_threshold: float = 0.10      # apply when noise_level > this
    auto_deskew: bool = True
    deskew_min_angle: float = 0.3        # degrees; reference uses 1.0 (deskew.py)
    normalize: bool = True
    contrast_threshold: float = 0.5      # Michelson contrast below this => normalize
    binarization: str = "otsu"           # "otsu" | "adaptive" | "none"
    adaptive_block_divisor: int = 20     # block = clamp(min(h,w)//divisor, 11, 101)
    adaptive_c: int = 11
    scale_to_dpi: int = 0                # 0 disables ScalingStep (synthetic corpus is exact-scale)
    max_scale_factor: float = 3.0


@dataclass(frozen=True)
class SplitConfig:
    """Splitting thresholds (reference: app/config.py:11-13, splitting/base.py:177-194)."""

    max_megapixels: float = 2.0
    max_dimension: int = 2048
    min_gap_pixels: int = 12
    gap_threshold: float = 0.95          # projection rows with <5% ink are gap candidates
    min_chunk_size: int = 64
    overlap_percent: float = 0.40        # grid fallback overlap (reference 40%)
    target_chunk_dim: int = 1024
    rtl: bool = False


@dataclass(frozen=True)
class MergeConfig:
    """Chunk-merge behavior (reference: app/ocr/splitting/merger.py:56-74)."""

    rtl: bool = False
    min_overlap_chars: int = 10
    similarity_threshold: float = 0.95
    fuzzy_window_words: int = 10
    separator: str = "\n\n"


@dataclass(frozen=True)
class StitchConfig:
    """Doc re-stitch behavior (reference page concat: app/worker/tasks.py:177-223)."""

    page_marker: str = "=== Page {i} of {n} ==="
    page_separator: str = "\n\n"
    # salted two-level stitch: pages are pre-merged per (doc_id, offset,
    # page_number // salt_width) so one 200-page doc never lands in a
    # single reduce task (SURVEY.md §4.2 "salted keys").
    salt_width: int = 32


@dataclass(frozen=True)
class EngineConfig:
    """One OCR 'engine' = preprocessing + splitting + merge personality.

    The reference registers engines in a registry keyed by name
    (app/ocr/registry.py:7-87) with per-engine config overrides
    (app/config.py:85-118); we mirror that with ENGINE_CONFIGS below.
    """

    name: str = "synth"
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    split: SplitConfig = field(default_factory=SplitConfig)
    merge: MergeConfig = field(default_factory=MergeConfig)
    stitch: StitchConfig = field(default_factory=StitchConfig)


@dataclass(frozen=True)
class PipelineConfig:
    """Top-level pipeline knobs (actor pool sizing etc.)."""

    engine: EngineConfig = field(default_factory=EngineConfig)
    # OCR actor pool: sized at pipeline build time from ray.cluster_resources()
    # when 0 so the N vs 4N bench runs exercise proportional pools (SURVEY §7.3).
    ocr_pool_size: int = 0
    ocr_batch_size: int = 16             # media rows per batch (rows are image-scale)
    text_batch_size: int = 4096          # text/html rows per batch
    num_output_partitions: int = 16      # checkpointable output partition count
    stitch_partitions: int = 0           # shuffle width for the stitch groupbys
                                         # (0 -> auto: max(8, CPUs // 2))
    salt_premerge: bool | str = "auto"   # skew escape hatch: salted partial merge
                                         # of heavy multi-unit spans (extra shuffle).
                                         # True/False force it; "auto" lets
                                         # run_extraction sample the corpus and
                                         # enable it when any sampled doc exceeds
                                         # salt_auto_units units
    salt_auto_units: int = 2048          # "auto" trigger: sampled max units/doc
                                         # above this would overload one stitch
                                         # task (stitch holds every unit of a doc)


DEFAULT_ENGINE = EngineConfig()

# Per-engine overrides, analogous to reference app/config.py:95-118
# (e.g. qari: bigger split threshold + RTL merge).
ENGINE_CONFIGS: dict[str, EngineConfig] = {
    "synth": DEFAULT_ENGINE,
    "synth-rtl": replace(
        DEFAULT_ENGINE,
        name="synth-rtl",
        split=replace(DEFAULT_ENGINE.split, max_megapixels=2.5, max_dimension=2560, rtl=True),
        merge=replace(DEFAULT_ENGINE.merge, rtl=True),
    ),
    # small thresholds so tests exercise the split path without huge arrays
    "synth-small": replace(
        DEFAULT_ENGINE,
        name="synth-small",
        split=replace(DEFAULT_ENGINE.split, max_megapixels=0.25, max_dimension=700),
    ),
}


def get_engine(name: str) -> EngineConfig:
    try:
        return ENGINE_CONFIGS[name]
    except KeyError:
        raise KeyError(
            f"unknown engine {name!r}; registered: {sorted(ENGINE_CONFIGS)}"
        ) from None
