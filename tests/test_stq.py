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


def test_vss_evaluator_dump_and_score(tmp_path):
    """VSS harness: VSPW-layout PNG dump with id remap + self-contained
    mIoU/VC scoring (reference vss_eval.py dumps only)."""
    import numpy as np
    from PIL import Image

    from mmor_tpu.eval.vss_eval import VSSEvaluator

    rng = np.random.default_rng(0)
    t, h, w = 4, 16, 16
    gt = rng.integers(0, 3, size=(t, h, w)).astype(np.uint8)
    gt_dir = tmp_path / "gt"
    for i in range(t):
        (gt_dir / "vid0").mkdir(parents=True, exist_ok=True)
        Image.fromarray(gt[i]).save(gt_dir / "vid0" / f"f{i:03d}.png")

    ev = VSSEvaluator(tmp_path / "pred", contiguous_id_to_dataset_id=None)
    names = [f"f{i:03d}.jpg" for i in range(t)]
    ev.process("vid0", names, gt)  # perfect prediction
    assert (tmp_path / "pred" / "vid0" / "f000.png").exists()
    res = ev.evaluate(gt_dir=gt_dir, num_classes=3)
    assert res["mIoU"] > 0.999
    assert res["VC2"] > 0.999
    # no GT -> dump-only harness, like the reference
    assert ev.evaluate() == {}


def test_vss_evaluator_id_remap(tmp_path):
    import numpy as np
    from PIL import Image

    from mmor_tpu.eval.vss_eval import VSSEvaluator

    pred = np.zeros((1, 4, 4), np.uint8)
    pred[0, :2] = 1
    ev = VSSEvaluator(tmp_path / "p", contiguous_id_to_dataset_id={0: 10, 1: 20})
    ev.process("v", ["a.png"], pred)
    img = np.asarray(Image.open(tmp_path / "p" / "v" / "a.png"))
    assert set(np.unique(img)) == {10, 20}
