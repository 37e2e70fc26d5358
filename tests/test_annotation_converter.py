"""Annotation converter: name normalization + rule-based inference."""

import json

import pytest

from mmor_tpu.data.annotation_converter import (
    check_unique_relation,
    convert_4dor_frame,
    convert_mmor_frame,
    convert_take,
    infer_holding_instrument,
    infer_lyingon,
    infer_operating_table_rels,
)


def test_infer_lyingon():
    objects, rels = {"patient"}, set()
    infer_lyingon(objects, rels)
    assert ("patient", "operating_table", "lyingOn") in rels
    assert "operating_table" in objects


def test_infer_holding_instrument():
    objects = {"head_surgeon", "patient"}
    rels = {("head_surgeon", "patient", "cutting")}
    infer_holding_instrument(objects, rels)
    assert ("head_surgeon", "instrument", "holding") in rels


def test_infer_operating_table_rels():
    objects = {"head_surgeon", "patient", "operating_table"}
    rels = {("head_surgeon", "patient", "cutting")}
    infer_operating_table_rels(objects, rels)
    assert ("head_surgeon", "operating_table", "closeTo") in rels


def test_convert_4dor_frame_roles_and_rules():
    info = {
        "rel_annotations": [
            ["human_0", "Cutting", "Patient", "hand", "leg"],
            ["human_7", "Touching", "Patient", "", ""],  # dropped
            ["human_1", "Operating", "Operating-Table", "", ""],
        ],
        "human_name_annotations": {"human_0": "head-surgeon", "human_1": "none"},
    }
    objects, rels = convert_4dor_frame(info)
    assert ("head_surgeon", "patient", "cutting") in rels
    # human_1 has no name -> defaults to circulator; Operating -> manipulating
    assert ("circulator", "operating_table", "manipulating") in rels
    assert ("patient", "operating_table", "lyingOn") in rels
    assert ("head_surgeon", "instrument", "holding") in rels
    assert not any("human_7" in r for rel in rels for r in rel)


def test_convert_mmor_frame_aliases():
    info = {"rel_annotations": [["Anest", "Touching", "AE"]]}
    objects, rels = convert_mmor_frame(info)
    assert ("anaesthetist", "anesthesia_equipment", "touching") in rels


def test_check_unique_relation():
    check_unique_relation({("a", "b", "x"), ("b", "a", "y")})
    with pytest.raises(AssertionError):
        check_unique_relation([("a", "b", "x"), ("a", "b", "y")])


def test_convert_take_with_subsampling(tmp_path):
    for i in range(6):
        (tmp_path / f"{i:06d}.json").write_text(json.dumps(
            {"rel_annotations": [["Head-Surgeon", "Cutting", "Patient"]]}
        ))
    samples = convert_take(tmp_path, "007_TKA_MMOR", is_4dor=False, sample_every=3)
    assert len(samples) == 2  # every 3rd frame
    assert samples[0]["frame_id"] == "000000"
    assert ("patient", "operating_table", "lyingOn") in samples[0]["relationships"]
