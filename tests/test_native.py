"""Native C++ kernels: build, parity with numpy implementations."""

import numpy as np
import pytest

from mmor_tpu import native
from mmor_tpu.data.artifacts import (
    color_mask_to_labels,
    downsample_mask_preserve_classes,
)
from mmor_tpu.data.panoptic import (
    LABEL_TO_CATEGORY_ID,
    TRACK_TO_METAINFO,
    clean_mask as np_clean_mask,
)


def test_native_builds():
    assert native.available(), "g++ build of libmmor_native.so failed"


def test_priority_downsample_parity():
    rng = np.random.default_rng(0)
    mask = rng.choice([0, 5, 10, 13], size=(96, 128), p=[0.6, 0.25, 0.13, 0.02])
    mask = mask.astype(np.uint8)
    got = native.priority_downsample(mask, 32)
    want = downsample_mask_preserve_classes(mask, 32)
    np.testing.assert_array_equal(got, want)


def test_clean_mask_parity():
    mask = np.zeros((40, 40), np.uint8)
    mask[:20, :20] = 5
    mask[30, 30] = 7  # speck
    mask[35:38, 35:38] = 9  # 9 px component, under threshold 10
    got = native.clean_mask(mask, 10)
    want = np_clean_mask(mask, 10)
    np.testing.assert_array_equal(got, want)
    assert (got != 7).all() and (got != 9).all()


def test_rgb_to_labels_parity():
    labels = np.zeros((16, 16), np.uint8)
    labels[:8] = 5
    labels[8:] = 25
    rgb = np.zeros((16, 16, 3), np.uint8)
    for name, info in TRACK_TO_METAINFO.items():
        rgb[labels == info["label"]] = info["color"]
    got = native.rgb_to_labels(rgb)
    np.testing.assert_array_equal(got, color_mask_to_labels(rgb))
    np.testing.assert_array_equal(got, labels)


def test_panoptic_encode():
    mask = np.zeros((8, 8), np.uint8)
    mask[:4] = 5  # patient
    mask[4:] = 19  # unknown artifact label -> background
    pan, cat, areas = native.panoptic_encode(mask, LABEL_TO_CATEGORY_ID)
    c_patient = LABEL_TO_CATEGORY_ID[5]
    assert (cat[:4] == c_patient).all()
    assert (cat[4:] == 0).all()
    assert (pan[:4] == c_patient * 10).all()
    assert areas[c_patient] == 32


def test_native_faster_than_numpy():
    import time

    rng = np.random.default_rng(1)
    mask = rng.choice([0, 5, 10], size=(1536, 2048)).astype(np.uint8)
    t0 = time.perf_counter()
    native.priority_downsample(mask, 32)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    downsample_mask_preserve_classes(mask, 32)
    t_numpy = time.perf_counter() - t0
    # informational bound: native should not be slower than 2x numpy
    assert t_native < t_numpy * 2, (t_native, t_numpy)
