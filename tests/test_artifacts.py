"""Artifact generators: priority downsample, color codec, SRT transcripts."""

import json

import numpy as np
from PIL import Image

from mmor_tpu.data.artifacts import (
    color_mask_to_labels,
    downsample_mask_preserve_classes,
    export_segmask_artifact,
    export_take_transcripts,
    parse_srt,
    transcript_for_timepoint,
)
from mmor_tpu.data.panoptic import TRACK_TO_METAINFO


def test_downsample_rare_class_wins():
    mask = np.zeros((64, 64), np.uint8)
    mask[:32] = 5  # common class
    mask[0, 0] = 13  # single rare pixel inside the first pooling cell
    small = downsample_mask_preserve_classes(mask, output_res=32)
    assert small.shape == (32, 32)
    assert small[0, 0] == 13  # rare class outranks the common one in its cell
    assert small[0, 1] == 5
    assert small[31, 0] == 0  # background region stays background


def test_downsample_identity_when_uniform():
    mask = np.full((64, 64), 7, np.uint8)
    small = downsample_mask_preserve_classes(mask, 32)
    assert (small == 7).all()


def test_color_mask_to_labels_roundtrip():
    labels = np.zeros((8, 8), np.uint8)
    labels[:4] = 5
    labels[4:] = 10
    colored = np.zeros((8, 8, 3), np.uint8)
    for name, info in TRACK_TO_METAINFO.items():
        colored[labels == info["label"]] = info["color"]
    np.testing.assert_array_equal(color_mask_to_labels(colored), labels)


def test_export_segmask_artifact(tmp_path):
    mask = np.zeros((64, 64), np.uint8)
    mask[:32] = 5
    path = export_segmask_artifact(mask, tmp_path, timestamp=7, view_index=1,
                                   use_gt=False)
    assert path.name == "7_1_GTFalse.png"
    loaded = np.asarray(Image.open(path))
    assert loaded.shape == (32, 32)
    assert (loaded[:16] == 5).all()


SRT = """1
00:00:01,000 --> 00:00:02,500
first line

2
00:00:03,000 --> 00:00:04,000
second line

3
00:00:05,000 --> 00:00:06,000
third
multi line

4
00:00:07,000 --> 00:00:08,000
fourth

5
00:00:09,000 --> 00:00:10,000
fifth
"""


def test_parse_srt():
    subs = parse_srt(SRT)
    assert len(subs) == 5
    assert subs[0].start == 1.0 and subs[0].end == 2.5
    assert subs[2].text == "third multi line"


def test_transcript_for_timepoint():
    subs = parse_srt(SRT)
    assert transcript_for_timepoint(subs, 0) == ""
    assert transcript_for_timepoint(subs, 4) == "first line second line"
    # at t=10: last 4 of the five subs
    assert transcript_for_timepoint(subs, 10) == "second line third multi line fourth fifth"


def test_export_take_transcripts(tmp_path):
    srt = tmp_path / "take.srt"
    srt.write_text(SRT)
    export_take_transcripts(srt, [0, 4, 10], tmp_path / "out")
    data = json.loads((tmp_path / "out" / "4.json").read_text())
    assert data["text"] == "first line second line"
