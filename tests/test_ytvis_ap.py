"""YTVIS video-instance AP: tube IoU, interpolated AP, AR, track extraction.

Analytic oracles: tiny strip masks with hand-computable IoUs, checked
against the COCO 101-point interpolation rules the reference's YTVOSeval
implements (`ytvis_eval.py:321-352`).
"""

import numpy as np

from mmor_tpu.eval.ytvis_ap import (
    InstanceTrack,
    tracks_from_video_outputs,
    video_mask_iou,
    ytvis_ap,
)


def _strip(lo, hi, t=2, h=1, w=100):
    m = np.zeros((t, h, w), bool)
    m[:, :, lo:hi] = True
    return m


def test_video_mask_iou_accumulates_over_frames():
    a = np.zeros((2, 1, 10), bool)
    b = np.zeros((2, 1, 10), bool)
    a[0, 0, :6] = True          # frame 0: a=6 px
    b[0, 0, 3:9] = True         # frame 0: b=6 px, inter 3, union 9
    b[1, 0, :2] = True          # frame 1: a empty, b=2 -> union only
    assert video_mask_iou(a, b) == (3.0) / (9 + 2)


def test_perfect_prediction_is_ap1():
    gt = [InstanceTrack(0, 1, _strip(0, 50))]
    pred = [InstanceTrack(0, 1, _strip(0, 50), score=0.9)]
    r = ytvis_ap(pred, gt)
    assert r["AP"] == 1.0 and r["AP50"] == 1.0 and r["AR@1"] == 1.0


def test_iou_06_counts_below_threshold_only():
    # pred [20,100) vs gt [0,80): inter 60, union 100 -> IoU 0.6 exactly:
    # TP at t in {.50,.55,.60}, FP at the other 7 -> AP = 0.3
    gt = [InstanceTrack(0, 1, _strip(0, 80))]
    pred = [InstanceTrack(0, 1, _strip(20, 100), score=0.9)]
    r = ytvis_ap(pred, gt)
    np.testing.assert_allclose(r["AP"], 0.3, atol=1e-9)
    assert r["AP50"] == 1.0
    assert r["AP75"] == 0.0


def test_duplicate_after_full_recall_does_not_hurt():
    gt = [InstanceTrack(0, 1, _strip(0, 50))]
    pred = [InstanceTrack(0, 1, _strip(0, 50), score=0.9),
            InstanceTrack(0, 1, _strip(0, 50), score=0.5)]  # duplicate
    assert ytvis_ap(pred, gt)["AP"] == 1.0


def test_high_scored_false_positive_halves_ap():
    # wrong detection outranks the correct one: precision at full recall
    # is 0.5 and the envelope makes AP 0.5 at every threshold
    gt = [InstanceTrack(0, 1, _strip(0, 50))]
    pred = [InstanceTrack(0, 1, _strip(60, 90), score=0.9),   # IoU 0
            InstanceTrack(0, 1, _strip(0, 50), score=0.5)]
    np.testing.assert_allclose(ytvis_ap(pred, gt)["AP"], 0.5, atol=1e-9)


def test_category_means_exclude_empty_categories():
    gt = [InstanceTrack(0, 1, _strip(0, 50))]
    pred = [InstanceTrack(0, 1, _strip(0, 50), score=0.9),
            InstanceTrack(0, 7, _strip(0, 50), score=0.9)]  # cat 7 has no GT
    r = ytvis_ap(pred, gt)
    assert r["AP"] == 1.0
    assert set(r["per_category"]) == {1}


def test_cross_video_matching_is_isolated():
    gt = [InstanceTrack(0, 1, _strip(0, 50)),
          InstanceTrack(1, 1, _strip(0, 50))]
    # a video-1 prediction cannot match the video-0 GT
    pred = [InstanceTrack(1, 1, _strip(0, 50), score=0.9)]
    r = ytvis_ap(pred, gt)
    # one of two GTs found: recall caps at 0.5 -> 51 of the 101
    # interpolation points (0.00..0.50) see precision 1
    np.testing.assert_allclose(r["AP"], 51 / 101, atol=1e-9)


def test_tracks_from_video_outputs_topk_and_scores():
    q, k, t, h, w = 4, 3, 2, 4, 4
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((q, k + 1))
    masks = rng.standard_normal((q, t, h, w))
    tracks = tracks_from_video_outputs(5, logits, masks, topk=6)
    assert len(tracks) == 6
    assert all(tr.video_id == 5 for tr in tracks)
    scores = [tr.score for tr in tracks]
    assert scores == sorted(scores, reverse=True)
    assert all(0 <= tr.category_id < k for tr in tracks)
    assert tracks[0].masks.shape == (t, h, w) and tracks[0].masks.dtype == bool
