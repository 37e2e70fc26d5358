"""YTVIS-style video-instance-segmentation AP (dependency-free).

Rebuild of the reference's `dvis_Plus/data_video/ytvis_eval.py`, which wraps
the external YTVOS COCO-eval fork: predictions are per-video instance TRACKS
(a score, a category, and a per-frame mask tube); matching uses
spatio-temporal mask IoU (summed per-frame intersections over summed unions
across the whole video — the YTVIS definition), AP averages the 101-point
interpolated precision over IoU thresholds .50:.05:.95 per category, and AR
is the threshold-averaged recall at a detections-per-video cap. Instead of
RLE-JSON round trips through pycocotools, tracks stay in-memory numpy bool
tubes (same style as eval/vpq.py).

Reference roles: `ytvis_eval.py:280-318` (track extraction),
`:321-352` (YTVOSeval driver), `:217-278` (result table).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

IOU_THRESHOLDS = tuple(np.arange(0.5, 0.96, 0.05).round(2))


@dataclass
class InstanceTrack:
    """One video-instance track: ``masks`` is (T, H, W) bool (frames where
    the instance is absent are all-False rows)."""

    video_id: int
    category_id: int
    masks: np.ndarray
    score: float = 1.0

    def __post_init__(self):
        self.masks = np.asarray(self.masks, dtype=bool)


def video_mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    """Spatio-temporal tube IoU: sum_t |A_t ∩ B_t| / sum_t |A_t ∪ B_t|."""
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / float(union) if union else 0.0


def _interp_ap(recall: np.ndarray, precision: np.ndarray) -> float:
    """COCO 101-point interpolated AP from a (sorted-by-score) PR curve."""
    if recall.size == 0:
        return 0.0
    # monotone-decreasing precision envelope
    prec = precision.copy()
    for i in range(prec.size - 1, 0, -1):
        prec[i - 1] = max(prec[i - 1], prec[i])
    points = np.linspace(0.0, 1.0, 101)
    idx = np.searchsorted(recall, points, side="left")
    vals = np.where(idx < prec.size, prec[np.clip(idx, 0, prec.size - 1)], 0.0)
    return float(vals.mean())


@dataclass
class _CatEval:
    ap_per_t: dict = field(default_factory=dict)
    recall_per_t: dict = field(default_factory=dict)
    n_gt: int = 0


def ytvis_ap(
    predictions: list[InstanceTrack],
    ground_truths: list[InstanceTrack],
    *,
    iou_thresholds: tuple[float, ...] = IOU_THRESHOLDS,
    max_dets: int = 100,
) -> dict:
    """Evaluate video-instance AP/AR.

    Returns {"AP", "AP50", "AP75", "AR@1", "AR@{max_dets}",
    "per_category": {cat: AP}} with AP in [0, 1]. Categories with no GT
    tracks are excluded from the means (COCO convention).
    """
    cats = sorted({g.category_id for g in ground_truths})
    by_video_gt: dict = {}
    for g in ground_truths:
        by_video_gt.setdefault((g.video_id, g.category_id), []).append(g)

    preds_by_cat: dict = {c: [] for c in cats}
    for p in predictions:
        if p.category_id in preds_by_cat:
            preds_by_cat[p.category_id].append(p)

    results: dict[int, _CatEval] = {}
    ar1_acc, ar_acc = [], []
    for cat in cats:
        gts = [g for g in ground_truths if g.category_id == cat]
        ce = _CatEval(n_gt=len(gts))
        # cap detections per video, then order globally by score
        per_video: dict = {}
        for p in preds_by_cat[cat]:
            per_video.setdefault(p.video_id, []).append(p)
        capped = []
        for vid, plist in per_video.items():
            plist.sort(key=lambda p: -p.score)
            capped.extend(plist[:max_dets])
        capped.sort(key=lambda p: -p.score)

        # precompute IoUs pred x gt within each video
        ious: dict = {}
        for pi, p in enumerate(capped):
            for (vid, c), glist in by_video_gt.items():
                if vid != p.video_id or c != cat:
                    continue
                for gi, g in enumerate(glist):
                    ious[(pi, id(g))] = video_mask_iou(p.masks, g.masks)

        for t in iou_thresholds:
            matched: set = set()
            tp = np.zeros(len(capped))
            for pi, p in enumerate(capped):
                best, best_g = t, None
                glist = by_video_gt.get((p.video_id, cat), [])
                for g in glist:
                    if id(g) in matched:
                        continue
                    iou = ious.get((pi, id(g)), 0.0)
                    if iou >= best:
                        best, best_g = iou, g
                if best_g is not None:
                    matched.add(id(best_g))
                    tp[pi] = 1.0
            fp = 1.0 - tp
            ctp, cfp = np.cumsum(tp), np.cumsum(fp)
            recall = ctp / max(ce.n_gt, 1)
            precision = ctp / np.maximum(ctp + cfp, 1e-9)
            ce.ap_per_t[t] = _interp_ap(recall, precision) if ce.n_gt else 0.0
            ce.recall_per_t[t] = float(recall[-1]) if recall.size else 0.0
            # AR@1: recall counting only each video's single best detection
            top1 = set()
            r1_hits = 0
            matched1: set = set()
            for pi, p in enumerate(capped):
                if p.video_id in top1:
                    continue
                top1.add(p.video_id)
                glist = by_video_gt.get((p.video_id, cat), [])
                best, best_g = t, None
                for g in glist:
                    if id(g) in matched1:
                        continue
                    iou = ious.get((pi, id(g)), 0.0)
                    if iou >= best:
                        best, best_g = iou, g
                if best_g is not None:
                    matched1.add(id(best_g))
                    r1_hits += 1
            ce.recall_per_t[(t, 1)] = r1_hits / max(ce.n_gt, 1)
        results[cat] = ce
        ar_acc.append(np.mean([ce.recall_per_t[t] for t in iou_thresholds]))
        ar1_acc.append(np.mean([ce.recall_per_t[(t, 1)]
                                for t in iou_thresholds]))

    def mean_ap(ts):
        vals = [results[c].ap_per_t[t] for c in cats for t in ts
                if results[c].n_gt]
        return float(np.mean(vals)) if vals else 0.0

    return {
        "AP": mean_ap(iou_thresholds),
        "AP50": mean_ap([iou_thresholds[0]]),
        "AP75": mean_ap([0.75]) if 0.75 in iou_thresholds else None,
        "AR@1": float(np.mean(ar1_acc)) if ar1_acc else 0.0,
        f"AR@{max_dets}": float(np.mean(ar_acc)) if ar_acc else 0.0,
        "per_category": {
            c: float(np.mean([results[c].ap_per_t[t]
                              for t in iou_thresholds]))
            for c in cats
        },
    }


def tracks_from_video_outputs(
    video_id: int,
    pred_logits: np.ndarray,   # (Q, K+1) class logits (avg over frames)
    pred_masks: np.ndarray,    # (Q, T, H, W) mask logits
    *,
    topk: int = 10,
    mask_threshold: float = 0.0,
) -> list[InstanceTrack]:
    """DVIS/MinVIS query outputs -> scored instance tracks (the VIS branch
    of the reference's inference_video, scores = softmax class prob)."""
    probs = _softmax(pred_logits)[:, :-1]  # drop no-object
    q, k = probs.shape
    flat = probs.reshape(-1)
    order = np.argsort(-flat)[:topk]
    out = []
    for idx in order:
        qi, ci = divmod(int(idx), k)
        out.append(InstanceTrack(
            video_id=video_id,
            category_id=ci,
            masks=pred_masks[qi] > mask_threshold,
            score=float(flat[idx]),
        ))
    return out


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)
