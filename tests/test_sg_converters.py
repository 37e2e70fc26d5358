"""Scene-graph text engine: parsing, change log, memory strings, vocab."""

import random

import pytest

from mmor_tpu.sg import (
    collapse_sgs,
    change_log_to_memory_str,
    parse_sg_string,
    sg_history_to_change_log,
    triplets_to_sg_string,
    vocab_id,
    normalize_role,
)
from mmor_tpu.sg.vocab import ENTITIES, PREDICATES, VOCAB


def test_vocab_layout():
    assert len(ENTITIES) == 23
    assert len(PREDICATES) == 16
    assert VOCAB["anaesthetist"] == 0
    assert VOCAB["unrelated_person"] == 22
    assert VOCAB["assisting"] == 23
    assert VOCAB["touching"] == 38


def test_vocab_synonyms():
    assert vocab_id("anaesthesia_equipment") == vocab_id("anesthesia_equipment")
    assert vocab_id("Tool") == vocab_id("instrument")
    assert vocab_id("close to") == vocab_id("closeto")
    assert vocab_id("closeTo") == vocab_id("closeto")
    assert normalize_role("head_surgent") == "head_surgeon"
    assert normalize_role("anesthetist") == "anaesthetist"
    with pytest.raises(KeyError):
        vocab_id("flux_capacitor")


def test_parse_sg_string_basic():
    text = "<SG> head surgeon,patient,cutting; nurse,instrument table,closeTo; </SG>"
    assert parse_sg_string(text) == [
        ("head surgeon", "cutting", "patient"),
        ("nurse", "closeTo", "instrument table"),
    ]


def test_parse_sg_string_without_tags_and_garbage():
    text = "head surgeon,patient,cutting; oops; a,b; x,y,z,w; nurse,patient,touching.</s>"
    assert parse_sg_string(text) == [
        ("head surgeon", "cutting", "patient"),
        ("nurse", "touching", "patient"),
    ]


def test_parse_sg_string_reversed_tags_falls_back():
    text = "</SG> a,b,c <SG>"
    # malformed tag order -> raw split on ';', tags end up inside fields
    assert parse_sg_string(text) == [("</SG> a", "c <SG>", "b")]


def test_roundtrip_sg_string():
    triplets = [("head_surgeon", "cutting", "patient")]
    assert parse_sg_string(triplets_to_sg_string(triplets)) == triplets


def test_collapse_sgs_removal():
    log = [
        (0, ("a", "holding", "b")),
        (1, ("a", "not holding", "b")),
        (2, ("a", "cutting", "b")),
    ]
    assert collapse_sgs(log) == {("a", "b"): "cutting"}


def test_change_log_additions_and_removals():
    history = [
        {"timepoint_idx": 0, "scene_graph": [("s", "holding", "o")]},
        {"timepoint_idx": 1, "scene_graph": []},
        {"timepoint_idx": 2, "scene_graph": [("s", "holding", "o")]},
    ]
    log = sg_history_to_change_log(history, rng=random.Random(0))
    assert log == [
        (0, ("s", "holding", "o")),
        (1, ("s", "not holding", "o")),
        (2, ("s", "holding", "o")),
    ]


def test_change_log_filters_none_and_irrelevant():
    history = [
        {
            "timepoint_idx": 0,
            "scene_graph": [
                ("s", "closeto", "o"),
                ("none", "holding", "o"),
                ("s", "cutting", "o2"),
            ],
        }
    ]
    log = sg_history_to_change_log(
        history, irrelevant_preds=["closeto", "closeTo"], rng=random.Random(0)
    )
    assert [t for _, t in log] == [("s", "cutting", "o2")]


def test_memory_str_longshort():
    log = [(i, (f"s{i}", "holding", f"o{i}")) for i in range(7)]
    memory = change_log_to_memory_str(log, current_timepoint=8, style="longshort")
    assert memory.startswith("Long: s0,o0,holding; s1,o1,holding; ")
    assert "Short: s2,o2,holding" in memory
    # reference strips the final '; ' leaving no trailing separator
    assert memory.endswith("s6,o6,holding")


def test_memory_str_long_skips_not_and_dups():
    log = [
        (0, ("s", "holding", "o")),
        (1, ("s", "not holding", "o")),
        (2, ("s", "holding", "o")),
        (3, ("a", "cutting", "b")),
        (4, ("a", "x", "b")),
        (5, ("a", "x", "b")),
        (6, ("a", "x", "b")),
        (7, ("a", "x", "b")),
        (8, ("a", "x", "b")),
    ]
    memory = change_log_to_memory_str(log, current_timepoint=9, style="long")
    # long-term memory covers log[:-5]: holding appears once, `not` is skipped
    assert memory == "Long: s,o,holding; a,b,cutting"


def test_memory_str_empty():
    assert change_log_to_memory_str([], current_timepoint=0, style="short") == "Short"
    assert change_log_to_memory_str([], current_timepoint=0, style="long") == "Long"


def test_memory_str_drop_history_deterministic():
    log = [(i, (f"s{i}", "p", f"o{i}")) for i in range(5)]
    keep_all = change_log_to_memory_str(
        log, current_timepoint=5, style="short", drop_history=0.0, rng=random.Random(1)
    )
    drop_all = change_log_to_memory_str(
        log, current_timepoint=5, style="short", drop_history=1.0, rng=random.Random(1)
    )
    assert keep_all.count(";") == 4
    assert drop_all == "Short"


def test_golden_full_prompt():
    """Exact final prompt string for a fully-loaded sample, hand-derived from
    the reference construction (scene_graph_prediction_model.py:140-205)."""
    from mmor_tpu.sg.prompts import (
        build_sg_prompt,
        format_robot_metadata,
        format_tracker_metadata,
    )

    robot = format_robot_metadata({
        "1": {"type": "phase", "template_name": "drilling_phase"},
        "0": {"type": "alert", "template_name": "none"},
    })
    assert robot == "alert: none, phase: drilling_phase"  # sorted by key

    tracker = format_tracker_metadata(
        [{"unique_id": "8000057", "button_state": 2,
          "Translation": [100.7, -3.2, 0.0], "euler_rot": [0.0, 89.6, -1.0]}],
        {"8000057": "upper_tracker"},
    )
    assert tracker == "upper_tracker: state 2, translation 100 -3 0, euler angles 0 89 -1"

    prompt = build_sg_prompt(
        robot_metadata_str=robot,
        tracker_metadata_str=tracker,
        speech_transcript="give me the saw",
        memory_str="Long: a,b,holding",
    )
    expected = (
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's questions. "
        "USER: <image>\n"
        "<memory_start>: Long: a,b,holding<memory_end>.\n"
        "<robot_metadata_start>: alert: none, phase: drilling_phase <robot_metadata_end>. "
        "<tracker_metadata_start>: upper_tracker: state 2, translation 100 -3 0, "
        "euler angles 0 89 -1 <tracker_metadata_end>. "
        "<speech_transcript_start>: give me the saw <speech_transcript_end>. "
        "Entities: [head surgeon, assistant surgeon, circulator, nurse, anaesthetist, mps, "
        "patient, student, instrument table, operating table, secondary table, anesthesia "
        "equipment, c_arm, mako_robot, monitor, mps_station, tracker, drape, drill, hammer, "
        "saw, instrument]. Predicates: [assisting, calibrating, cementing, cleaning, closeTo, "
        "cutting, drilling, hammering, holding, lyingOn, manipulating, preparing, sawing, "
        "scanning, suturing, touching]. Given the following scene graph memory representation, "
        "generate a scene graph for timepoint T. The output should strictly be a list of "
        'triplets, each in the format "entity1,entity2,predicate;". Do not provide a narrative '
        "or descriptive text. ASSISTANT:"
    )
    assert prompt == expected
