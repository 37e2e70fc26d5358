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


def test_consistent_resize_shortest_edge():
    from mmor_tpu.data.video_mapper import consistent_resize_shortest_edge

    rng = random.Random(0)
    frames = np.random.randint(0, 255, (3, 60, 100, 3), np.uint8)
    pan = np.random.randint(0, 5, (3, 60, 100), np.int32) * 10
    fr, pn = consistent_resize_shortest_edge(frames, pan, [30], 1000, rng)
    assert fr.shape == (3, 30, 50, 3) and pn.shape == (3, 30, 50)
    assert set(np.unique(pn)) <= set(np.unique(pan))  # nearest keeps ids
    # max_size clamps the long edge
    fr2, _ = consistent_resize_shortest_edge(frames, pan, [60], 80, rng)
    assert max(fr2.shape[1:3]) <= 80


def test_consistent_photometric_is_clip_consistent():
    from mmor_tpu.data.video_mapper import consistent_photometric

    frames = np.tile(np.random.randint(0, 255, (1, 16, 16, 3), np.uint8),
                     (4, 1, 1, 1))
    out = consistent_photometric(frames, random.Random(1))
    assert out.shape == frames.shape and out.dtype == np.uint8
    # identical input frames -> identical augmented frames (one draw per clip)
    for t in range(1, 4):
        np.testing.assert_array_equal(out[0], out[t])
    # factors near 1.0 keep the image in a sane range
    assert 0 < out.mean() < 255


def test_consistent_rotation_alignment():
    from mmor_tpu.data.video_mapper import consistent_rotation

    rng = random.Random(2)
    frames = np.zeros((2, 64, 64, 3), np.uint8)
    pan = np.zeros((2, 64, 64), np.int32)
    frames[:, 20:40, 20:40] = 255
    pan[:, 20:40, 20:40] = 70
    fr, pn = consistent_rotation(frames, pan, rng)
    assert fr.shape == frames.shape and pn.shape == pan.shape
    # image brightness and mask stay aligned after the same rotation
    overlap = ((fr[0, :, :, 0] > 127) & (pn[0] == 70)).sum()
    mask_area = (pn[0] == 70).sum()
    assert mask_area > 200  # object survives expand=False rotation
    assert overlap / mask_area > 0.9
    np.testing.assert_array_equal(pn[0], pn[1])  # clip-consistent


def test_pseudo_video_clip_varies_per_frame():
    from mmor_tpu.data.video_mapper import pseudo_video_clip

    rng = random.Random(3)
    img = np.random.randint(0, 255, (48, 48, 3), np.uint8)
    pan = np.random.randint(0, 4, (48, 48), np.int32) * 10
    fr, pn = pseudo_video_clip(img, pan, 4, rng)
    assert fr.shape == (4, 48, 48, 3) and pn.shape == (4, 48, 48)
    # independent crops: frames differ (overwhelmingly likely)
    assert any(not np.array_equal(fr[0], fr[t]) for t in range(1, 4))


def test_apply_train_augmentations_pipeline():
    from mmor_tpu.data.video_mapper import apply_train_augmentations

    rng = random.Random(4)
    frames = np.random.randint(0, 255, (3, 80, 120, 3), np.uint8)
    pan = np.random.randint(0, 6, (3, 80, 120), np.int32) * 10
    fr, pn = apply_train_augmentations(
        frames, pan, rng, min_sizes=(64,), max_size=500,
        crop_hw=(72, 96), photometric=True, rotation=True)
    assert fr.shape[:3] == pn.shape
    assert fr.dtype == np.uint8
    assert min(fr.shape[1:3]) == 64
