"""Evaluation harnesses: scene-graph triplet F1, panoptic VPQ/STQ."""

from mmor_tpu.eval.sg_eval import (
    RELATION_NAMES,
    CLASS_NAMES,
    SceneGraphEvaluator,
    classification_metrics,
)

__all__ = [
    "RELATION_NAMES",
    "CLASS_NAMES",
    "SceneGraphEvaluator",
    "classification_metrics",
]
