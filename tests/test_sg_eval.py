"""Scene-graph evaluator: pairwise scoring, support-filtered macro F1."""

import numpy as np
import pytest

from mmor_tpu.eval import SceneGraphEvaluator, classification_metrics
from mmor_tpu.eval.sg_eval import RELATION_NAMES, RELATION_NAMES_LOWER, _NONE_ID


def test_classification_metrics_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    gts = rng.integers(0, 5, size=200)
    preds = rng.integers(0, 5, size=200)
    ours = classification_metrics(gts, preds, 6)  # class 5 has zero support
    ref = sklearn.classification_report(
        gts, preds, labels=list(range(6)), output_dict=True, zero_division=0
    )
    for c in range(6):
        assert ours["per_class"][c]["precision"] == pytest.approx(ref[str(c)]["precision"])
        assert ours["per_class"][c]["recall"] == pytest.approx(ref[str(c)]["recall"])
        assert ours["per_class"][c]["f1"] == pytest.approx(ref[str(c)]["f1-score"])
        assert ours["per_class"][c]["support"] == ref[str(c)]["support"]
    assert ours["macro"]["f1"] == pytest.approx(ref["macro avg"]["f1-score"])
    # support-filtered macro excludes the empty class
    expected_real = np.mean([ours["per_class"][c]["f1"] for c in range(5)])
    assert ours["real_macro"]["f1"] == pytest.approx(expected_real)


def test_perfect_prediction_scores_one():
    ev = SceneGraphEvaluator()
    gt = [["head_surgeon", "patient", "cutting"]]  # (sub, obj, pred) JSON order
    ev.add_sample("001_MMOR", "<SG> head surgeon,patient,cutting; </SG>", gt)
    report = ev.report()
    assert report["macro_f1"] == pytest.approx(1.0)
    assert report["binary_interaction"]["real_macro"]["f1"] == pytest.approx(1.0)
    assert report["entities"]["real_macro"]["f1"] == pytest.approx(1.0)


def test_pairwise_none_filling():
    ev = SceneGraphEvaluator()
    # GT: surgeon cutting patient. Two GT entities -> 2 ordered pairs.
    ev.add_sample("001_MMOR", "<SG> </SG>", [["head_surgeon", "patient", "cutting"]])
    gts = ev.take_rel_gts["001_MMOR"]
    preds = ev.take_rel_preds["001_MMOR"]
    assert len(gts) == len(preds) == 2
    assert gts.count(_NONE_ID) == 1  # reverse direction is 'none'
    assert preds == [_NONE_ID, _NONE_ID]


def test_prediction_outside_gt_entities_ignored():
    ev = SceneGraphEvaluator()
    ev.add_sample(
        "001_MMOR",
        "<SG> nurse,drill,holding; head surgeon,patient,cutting; </SG>",
        [["head_surgeon", "patient", "cutting"]],
    )
    # nurse/drill are not GT entities: no pair rows for them
    assert len(ev.take_rel_gts["001_MMOR"]) == 2
    report = ev.report()
    assert report["macro_f1"] == pytest.approx(1.0)


def test_role_synonyms_and_oov_predictions():
    ev = SceneGraphEvaluator()
    ev.add_sample(
        "004_4DOR",
        # role synonyms only fire on the underscore form, as in the reference
        "<SG> head_surgent,patient,cutting; anesthetist,dragon,flying; </SG>",
        [["head_surgeon", "patient", "cutting"]],
    )
    report = ev.report()
    assert report["macro_f1"] == pytest.approx(1.0)
    assert "4DOR" in report["datatypes"]


def test_wrong_predicate_counts_against():
    ev = SceneGraphEvaluator()
    ev.add_sample(
        "001_MMOR",
        "<SG> head surgeon,patient,sawing; </SG>",
        [["head_surgeon", "patient", "cutting"]],
    )
    report = ev.report()
    cutting = RELATION_NAMES.index("cutting")
    sawing = RELATION_NAMES.index("sawing")
    assert report["relations"]["per_class"][cutting]["recall"] == 0.0
    assert report["relations"]["per_class"][sawing]["support"] == 0
    # binary interaction is still correct (an interaction was predicted)
    assert report["binary_interaction"]["per_class"][1]["recall"] == 1.0


def test_entity_detection_miss():
    ev = SceneGraphEvaluator()
    ev.add_sample(
        "001_MMOR",
        "<SG> head surgeon,drape,holding; </SG>",
        [["head_surgeon", "patient", "cutting"]],
    )
    ent = ev.report()["entities"]
    # head_surgeon found, patient missed
    assert ent["real_macro"]["recall"] == pytest.approx(0.5)


def test_relation_names_layout():
    assert len(RELATION_NAMES) == 17
    assert RELATION_NAMES_LOWER[-1] == "none"


def test_report_formatting():
    from mmor_tpu.eval.report_format import format_sg_report

    ev = SceneGraphEvaluator()
    ev.add_sample("001_MMOR", "<SG> head surgeon,patient,cutting; </SG>",
                  [["head_surgeon", "patient", "cutting"]])
    text = format_sg_report(ev.report())
    assert "Take 001_MMOR" in text
    assert "Macro F1: 1.000" in text
    assert "cutting" in text and "real macro" in text
