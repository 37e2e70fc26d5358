"""Video clip sampler + target building."""

import random

import numpy as np

from mmor_tpu.data.video_mapper import (
    VideoClipSampler,
    build_clip_targets,
    consistent_crop,
    consistent_hflip,
)


def test_continuous_window():
    s = VideoClipSampler(sampling_frame_num=5, sampling_frame_range=2,
                         rng=random.Random(0))
    for _ in range(20):
        idx = s.sample_indices(100)
        assert len(idx) == 5
        assert idx == list(range(idx[0], idx[0] + 5))


def test_random_window_sorted():
    s = VideoClipSampler(sampling_frame_num=4, sampling_frame_range=10,
                         rng=random.Random(0))
    idx = s.sample_indices(100)
    assert len(idx) == 4
    assert idx == sorted(idx)
    assert max(idx) - min(idx) <= 21


def test_short_video_pads():
    s = VideoClipSampler(sampling_frame_num=5, rng=random.Random(0))
    idx = s.sample_indices(3)
    assert len(idx) == 5
    assert idx[:3] == [0, 1, 2] and idx[-1] == 2


def test_reverse_augment():
    s = VideoClipSampler(sampling_frame_num=5, sampling_frame_range=2,
                         reverse_augment=True, rng=random.Random(1))
    reversed_seen = any(
        s.sample_indices(50)[0] > s.sample_indices(50)[-1] for _ in range(20)
    )
    assert reversed_seen


def test_build_clip_targets():
    pan = np.zeros((2, 16, 16), np.int64)
    pan[:, :8] = 50  # category 5 * divisor 10
    pan[1, 8:] = 70  # appears only in frame 1
    targets = build_clip_targets(pan, label_divisor=10, capacity=4, out_hw=(8, 8))
    assert targets["labels"][0, 0] == 5 and targets["labels"][0, 1] == 7
    assert targets["valid"][0, :2].all() and not targets["valid"][0, 2:].any()
    assert targets["frame_valid"][0, 1, 0] == False  # noqa: E712
    assert targets["frame_valid"][0, 1, 1] == True  # noqa: E712
    assert targets["masks"].shape == (1, 4, 2, 8, 8)


def test_consistent_transforms():
    rng = random.Random(0)
    frames = np.arange(2 * 4 * 6 * 3, dtype=np.float32).reshape(2, 4, 6, 3)
    pan = np.arange(2 * 4 * 6, dtype=np.int64).reshape(2, 4, 6)
    f2, p2 = consistent_crop(frames, pan, (2, 3), rng)
    assert f2.shape == (2, 2, 3, 3) and p2.shape == (2, 2, 3)
    f3, p3 = consistent_hflip(frames, pan, random.Random(3))
    assert f3.shape == frames.shape
