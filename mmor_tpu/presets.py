"""Named presets mirroring the reference's published configurations.

The reference's config families (`configs/dvis_Plus/{4DOR,MMOR,HybridOR}/
{Base,MinVIS,CTVIS,DVIS_Plus_Online,DVIS_Plus_Offline}.yaml` and the README
training commands) map onto these constructors; values cite the yamls.
"""

from __future__ import annotations

from mmor_tpu.models.mask2former_decoder import MaskDecoderConfig
from mmor_tpu.models.meta_arch import DVISConfig
from mmor_tpu.models.refiner import RefinerConfig
from mmor_tpu.models.segmenter import SegmenterConfig
from mmor_tpu.models.tracker import TrackerConfig
from mmor_tpu.train.criterion import CriterionConfig
from mmor_tpu.train.panoptic_trainer import PanopticTrainConfig

# NUM_CLASSES=124 carried from VSPW pretraining even though OR uses 24 live
# classes (reference quirk, MinVIS_R50.yaml:9)
HYBRIDOR_NUM_CLASSES = 124


def hybrid_or_r50(backbone: str = "resnet50") -> DVISConfig:
    """HybridOR R50 geometry: 100 queries, hidden 256, 9+1 decoder layers,
    test window 3 (Base yaml)."""
    return DVISConfig(
        segmenter=SegmenterConfig(
            decoder=MaskDecoderConfig(num_classes=HYBRIDOR_NUM_CLASSES),
            backbone=backbone,
        ),
        tracker=TrackerConfig(num_classes=HYBRIDOR_NUM_CLASSES),
        refiner=RefinerConfig(num_classes=HYBRIDOR_NUM_CLASSES),
        window_size=3,
        object_mask_threshold=0.8,
        overlap_threshold=0.8,
    )


def _criterion() -> CriterionConfig:
    return CriterionConfig(
        num_classes=HYBRIDOR_NUM_CLASSES,
        class_weight=2.0, mask_weight=5.0, dice_weight=5.0,
        num_points=12544, oversample_ratio=3.0, importance_sample_ratio=0.75,
    )


def ctvis_stage() -> tuple[PanopticTrainConfig, dict]:
    """Stage 1: 100k iters, 10 frames/clip, lr 1e-4 (CTVIS_r50.yaml:11-27)."""
    return (
        PanopticTrainConfig(stage="ctvis", criterion=_criterion(),
                            num_negatives=99, learning_rate=1e-4),
        {"steps": 100_000, "frames": 10, "save_every": 10_000},
    )


def online_stage(match_from_segmenter: bool = True) -> tuple[PanopticTrainConfig, dict]:
    """Stage 2: 40k iters, 5 frames range 2, frozen segmenter
    (DVIS_Plus_Online_R50.yaml:12-22); segmenter-guided matching for the
    first half of training."""
    return (
        PanopticTrainConfig(stage="online", criterion=_criterion(),
                            match_from_segmenter=match_from_segmenter,
                            learning_rate=1e-4),
        {"steps": 40_000, "frames": 5, "save_every": 10_000},
    )


def offline_stage() -> tuple[PanopticTrainConfig, dict]:
    """Stage 3: 40k iters, reverse-order augment + crop, frozen
    segmenter+tracker (DVIS_Plus_Offline_R50.yaml:5-20)."""
    return (
        PanopticTrainConfig(stage="offline", criterion=_criterion(),
                            learning_rate=1e-4),
        {"steps": 40_000, "frames": 5, "save_every": 10_000,
         "reverse_augment": True, "crop": True},
    )


MM2SG_TRAIN_DEFAULTS = {
    # README training command block
    "batch_size": 4,
    "grad_accum": 4,
    "lr": 2e-5,
    "lora_rank": 128,
    "lora_alpha": 256.0,
    "unfreeze_vision_layers": 12,
    "max_len": 2048,
    "epochs": 1,
    "n_permutations": 20,
    "multimodal_drop_prop": 0.5,
}
