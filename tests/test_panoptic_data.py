"""Panoptic data layer: mask processing, chunking, codecs, dataset records."""

import json
from collections import OrderedDict
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from mmor_tpu.data.panoptic import (
    LABEL_TO_CATEGORY_ID,
    MMORPanopticDataset,
    SORTED_CLASSES,
    TRACK_TO_METAINFO,
    categories,
    clean_mask,
    decode_panoptic,
    encode_panoptic,
    id2rgb,
    process_panoptic_mask,
    rgb2id,
    split_video_samples,
)


def test_class_table():
    assert len(TRACK_TO_METAINFO) == 24  # 23 fg + background
    assert SORTED_CLASSES[0] == "__background__"
    assert LABEL_TO_CATEGORY_ID[0] == 0
    cats = categories()
    assert all(cats[i]["isthing"] == 1 for i in cats)


def test_panoptic_codec_roundtrip():
    pan = encode_panoptic(7, 3)
    assert decode_panoptic(pan) == (7, 3)
    ids = np.array([[0, 12345], [70000, 255]])
    np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)


def test_clean_mask_removes_specks():
    mask = np.zeros((32, 32), np.uint8)
    mask[:16, :16] = 5  # big region survives
    mask[30, 30] = 7  # single-pixel speck removed
    out = clean_mask(mask, area_threshold=10)
    assert (out[:16, :16] == 5).all()
    assert (out != 7).all()


def test_process_panoptic_mask():
    mask = np.zeros((64, 64), np.uint8)
    mask[:32] = 5  # patient (label 5)
    mask[32:] = 10  # head_surgeon (label 10)
    mask[0, 0] = 19  # LIKELY_MISTAKES artifact -> skipped
    infos, pan, cat = process_panoptic_mask(mask, image_res=None, area_threshold=1)
    assert len(infos) == 2
    cat_patient = LABEL_TO_CATEGORY_ID[5]
    assert {i["category_id"] for i in infos} == {cat_patient, LABEL_TO_CATEGORY_ID[10]}
    assert pan[5, 5] == encode_panoptic(cat_patient, 0)
    assert cat[5, 5] == cat_patient
    assert pan[0, 1] == encode_panoptic(cat_patient, 0)  # artifact pixel cleaned


def test_split_video_samples():
    samples = OrderedDict(a=list(range(10)), b=list(range(3)))
    out = split_video_samples(samples, max_video_length=4, overlap=1)
    assert "b" in out and out["b"] == [0, 1, 2]
    parts = [k for k in out if k.startswith("a_part")]
    assert len(parts) == 4  # step 3: starts 0,3,6,9
    assert out["a_part0"] == [0, 1, 2, 3]
    assert out["a_part1"] == [3, 4, 5, 6]


@pytest.fixture()
def mmor_tree(tmp_path):
    root = tmp_path / "MM-OR_data"
    take = "013_PKA"
    folder = root / take
    (root / "take_jsons").mkdir(parents=True)
    timestamps = {}
    for f in range(3):
        idx = f"{f:06d}"
        timestamps[str(f)] = {"azure": idx, "simstation": idx}
        for cam in (1, 4, 5):
            rgb = folder / "colorimage" / f"camera0{cam}_colorimage-{idx}.jpg"
            rgb.parent.mkdir(parents=True, exist_ok=True)
            Image.new("RGB", (32, 24)).save(rgb)
            mask = np.zeros((24, 32), np.uint8)
            mask[:12] = 5
            mp = folder / f"segmentation_export_{cam}" / f"{rgb.stem}.png"
            mp.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(mask).save(mp)
    (root / "take_jsons" / f"{take}.json").write_text(
        json.dumps({"timestamps": timestamps})
    )
    return root


def test_mmor_dataset_records(mmor_tree, tmp_path):
    ds = MMORPanopticDataset(
        mmor_tree, split="mini_train", cache_dir=tmp_path / "cache",
        max_video_length=None, overlap=0,
    )
    assert len(ds) == 3  # azure cams 1/4/5 (no simstation masks present)
    records = list(ds.video_records())
    assert len(records) == 3
    rec = records[0]
    assert len(rec["file_names"]) == 3
    assert rec["pan_seg"].shape == (3, 1536, 2048)
    assert rec["segments_infos"][0][0]["category_id"] == LABEL_TO_CATEGORY_ID[5]
    # second pass hits the cache
    records2 = list(ds.video_records())
    np.testing.assert_array_equal(records2[0]["pan_seg"], rec["pan_seg"])


def test_gt_export_and_class_freqs(mmor_tree, tmp_path):
    from mmor_tpu.data.panoptic import MMORPanopticDataset
    from mmor_tpu.eval.gt_export import class_pixel_frequencies, export_ground_truth

    ds = MMORPanopticDataset(mmor_tree, split="mini_train",
                             cache_dir=tmp_path / "cache2",
                             max_video_length=None, overlap=0)
    records = list(ds.video_records())
    gt = export_ground_truth(records, tmp_path / "gt", split="mini_train")
    assert len(gt["videos"]) == 3
    assert (tmp_path / "gt" / "mini_train_gt.json").exists()
    assert (tmp_path / "gt" / "pan_gt" / records[0]["video_id"] / "000000.png").exists()
    freqs = class_pixel_frequencies(records)
    assert sum(freqs.values()) > 0
    from mmor_tpu.data.panoptic import LABEL_TO_CATEGORY_ID
    assert LABEL_TO_CATEGORY_ID[5] in freqs
