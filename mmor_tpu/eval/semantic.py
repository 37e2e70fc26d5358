"""Semantic video metrics: mIoU and Video Consistency (VC).

Equivalents of the reference's VSPW tooling
(`utils/eval_miou_vspw.py`, `utils/eval_vc_vspw.py`):

- mIoU: class-wise IoU over all frames of all videos;
- VC_n: for each length-n window, the fraction of pixels whose GT class is
  stable across the window that the prediction also keeps stable and correct
  (VSPW's video-consistency measure), averaged over windows and videos.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def miou(
    gt_frames: Sequence[np.ndarray],
    pred_frames: Sequence[np.ndarray],
    num_classes: int,
    ignore_label: int = 255,
) -> dict:
    inter = np.zeros(num_classes, np.int64)
    union = np.zeros(num_classes, np.int64)
    for gt, pred in zip(gt_frames, pred_frames):
        valid = gt != ignore_label
        for c in range(num_classes):
            g = (gt == c) & valid
            p = (pred == c) & valid
            inter[c] += np.logical_and(g, p).sum()
            union[c] += np.logical_or(g, p).sum()
    present = union > 0
    per_class = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    return {
        "miou": float(per_class[present].mean()) if present.any() else 0.0,
        "per_class": per_class,
    }


def video_consistency(
    gt_frames: Sequence[np.ndarray],
    pred_frames: Sequence[np.ndarray],
    n: int = 8,
    ignore_label: int = 255,
) -> float:
    """VC_n over one video (eval_vc_vspw.py semantics)."""
    t = len(gt_frames)
    if t < n:
        return 0.0
    scores = []
    for start in range(0, t - n + 1):
        gt_win = np.stack(gt_frames[start : start + n])
        pred_win = np.stack(pred_frames[start : start + n])
        stable = np.all(gt_win == gt_win[0], axis=0) & (gt_win[0] != ignore_label)
        if not stable.any():
            continue
        pred_ok = np.all(pred_win == gt_win[0], axis=0)
        scores.append((stable & pred_ok).sum() / stable.sum())
    return float(np.mean(scores)) if scores else 0.0
