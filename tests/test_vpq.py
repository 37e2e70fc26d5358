"""VPQ: perfect prediction, misses, tube consistency penalties."""

import numpy as np
import pytest

from mmor_tpu.eval.vpq import PQStat, vpq_compute, vpq_single_video

CATEGORIES = {
    1: {"isthing": 1},
    2: {"isthing": 0},
}


def _frame(ids, segments):
    return np.asarray(ids, dtype=np.int64), segments


def _simple_video(t=4, flip_pred_at=None):
    """Two segments: thing id 10 (cat 1) left, stuff id 20 (cat 2) right."""
    h, w = 8, 8
    gt_frames, pred_frames = [], []
    for i in range(t):
        id_map = np.zeros((h, w), np.int64)
        id_map[:, : w // 2] = 10
        id_map[:, w // 2 :] = 20
        segs = [
            {"id": 10, "category_id": 1, "iscrowd": 0},
            {"id": 20, "category_id": 2, "iscrowd": 0},
        ]
        gt_frames.append(_frame(id_map, segs))
        pred_map = id_map.copy()
        if flip_pred_at is not None and i >= flip_pred_at:
            # identity swap mid-video: tube IoU collapses
            pred_map = np.where(pred_map == 10, 99, pred_map)
            pred_map = np.where(pred_map == 20, 10, pred_map)
            pred_map = np.where(pred_map == 99, 20, pred_map)
            segs = [
                {"id": 20, "category_id": 1, "iscrowd": 0},
                {"id": 10, "category_id": 2, "iscrowd": 0},
            ]
        pred_frames.append(_frame(pred_map, segs))
    return gt_frames, pred_frames


def test_perfect_prediction_vpq_one():
    video = _simple_video()
    for k in (1, 2, 4):
        out = vpq_compute([video], CATEGORIES, nframes=k)
        assert out["all"]["pq"] == pytest.approx(1.0)
        assert out["things"]["pq"] == pytest.approx(1.0)
        assert out["stuff"]["pq"] == pytest.approx(1.0)


def test_identity_swap_hurts_multiframe_only():
    video = _simple_video(t=4, flip_pred_at=2)
    per_frame = vpq_compute([video], CATEGORIES, nframes=1)
    tube = vpq_compute([video], CATEGORIES, nframes=4)
    # single-frame PQ unaffected by the swap (categories still correct)
    assert per_frame["all"]["pq"] == pytest.approx(1.0)
    # 4-frame tubes straddle the swap: IoU 0.5 fails the >0.5 match
    assert tube["all"]["pq"] < 1.0


def test_missing_segment_counts_fn():
    gt, pred = _simple_video(t=2)
    # predictions miss the stuff segment entirely
    pred = [
        (np.where(m == 20, 0, m), [s for s in segs if s["id"] == 10])
        for m, segs in pred
    ]
    stat = vpq_single_video(gt, pred, nframes=1)
    assert stat[2].fn == 2  # stuff missed in both windows
    assert stat[1].tp == 2


def test_void_heavy_prediction_not_fp():
    h, w = 8, 8
    gt_map = np.zeros((h, w), np.int64)
    gt_map[:2, :2] = 10
    gt = [(gt_map, [{"id": 10, "category_id": 1, "iscrowd": 0}])]
    # prediction covers mostly VOID gt area
    pred_map = np.zeros((h, w), np.int64)
    pred_map[:, :] = 7
    pred = [(pred_map, [{"id": 7, "category_id": 2, "iscrowd": 0}])]
    stat = vpq_single_video(gt, pred, nframes=1)
    # 60/64 pixels of the prediction are VOID in gt -> ignored, not FP
    assert stat[2].fp == 0
    assert stat[1].fn == 1


def test_pqstat_accumulation():
    a, b = PQStat(), PQStat()
    a[1].tp = 1
    a[1].iou = 0.9
    b[1].fp = 2
    a += b
    assert a[1].tp == 1 and a[1].fp == 2
    avg, per_class = a.average({1: {"isthing": 1}})
    assert avg["pq"] == pytest.approx(0.9 / (1 + 1))
