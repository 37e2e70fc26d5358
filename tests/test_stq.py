"""STQ: perfect = 1; identity swaps hurt AQ, not SQ."""

import numpy as np
import pytest

from mmor_tpu.eval.stq import stq


def _video(t=4, swap_at=None):
    gt, pred = [], []
    for i in range(t):
        sem = np.zeros((8, 8), np.int64)
        sem[:, :4] = 1
        sem[:, 4:] = 2
        inst = np.zeros((8, 8), np.int64)
        inst[:, :4] = 1
        inst[:, 4:] = 2
        gt.append((sem, inst))
        p_inst = inst.copy()
        if swap_at is not None and i >= swap_at:
            p_inst = np.where(inst == 1, 2, np.where(inst == 2, 1, inst))
        pred.append((sem.copy(), p_inst))
    return gt, pred


def test_perfect_stq():
    gt, pred = _video()
    out = stq(gt, pred, num_classes=3)
    assert out["sq"] == pytest.approx(1.0)
    assert out["aq"] == pytest.approx(1.0)
    assert out["stq"] == pytest.approx(1.0)


def test_id_swap_hurts_aq_only():
    gt, pred = _video(t=4, swap_at=2)
    out = stq(gt, pred, num_classes=3)
    assert out["sq"] == pytest.approx(1.0)  # semantics identical
    assert out["aq"] < 1.0
    assert out["stq"] == pytest.approx(np.sqrt(out["aq"]))


def test_wrong_semantics_hurt_sq():
    gt, pred = _video()
    pred = [(np.where(sem == 2, 1, sem), inst) for sem, inst in pred]
    out = stq(gt, pred, num_classes=3)
    assert out["sq"] < 1.0


def test_ignore_label_excluded():
    gt, pred = _video(t=1)
    sem, inst = gt[0]
    sem[0, :] = 255  # ignored row
    out = stq([(sem, inst)], [pred[0]], num_classes=3)
    assert out["stq"] == pytest.approx(1.0)


def test_miou_and_vc():
    from mmor_tpu.eval.semantic import miou, video_consistency

    gt = [np.full((8, 8), 1, np.int64) for _ in range(4)]
    pred_good = [g.copy() for g in gt]
    assert miou(gt, pred_good, 3)["miou"] == 1.0
    assert video_consistency(gt, pred_good, n=2) == 1.0
    pred_flicker = [g.copy() for g in gt]
    pred_flicker[1][:] = 2  # one flickering frame
    assert video_consistency(gt, pred_flicker, n=2) < 1.0
    assert miou(gt, pred_flicker, 3)["miou"] < 1.0
