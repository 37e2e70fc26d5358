"""Video clip sampling for panoptic training.

Equivalent of the reference ``PanopticDatasetVideoMapper``
(`dvis_Plus/data_video/dataset_mapper_vps.py:20-342`) + augmentation
(`augmentation.py`):

- train: sample a frame window per video — a continuous window when
  ``sampling_frame_range*2 + 1 == num_frames`` (the DVIS online/offline
  setting), otherwise a random sorted subset around a reference frame;
- reverse-order augmentation flips the clip with p=0.5 (offline stage,
  `dataset_mapper_vps.py:161-162`, REVERSE_AGU yaml);
- consistent (whole-clip) horizontal flip and crop augmentations;
- masks resize to the 1/4 feature grid; instances build per-video with a
  static capacity.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

import numpy as np


@dataclass
class VideoClipSampler:
    sampling_frame_num: int = 5  # DVIS_Plus_Online_R50.yaml SAMPLING_FRAME_NUM
    sampling_frame_range: int = 2  # SAMPLING_FRAME_RANGE
    reverse_augment: bool = False  # offline REVERSE_AGU
    rng: random.Random = None

    def __post_init__(self):
        if self.rng is None:
            self.rng = random.Random()

    def sample_indices(self, video_length: int) -> list[int]:
        t = self.sampling_frame_num
        if video_length <= t:
            idx = list(range(video_length))
            while len(idx) < t:
                idx.append(idx[-1])
        elif self.sampling_frame_range * 2 + 1 == t:
            # continuous window (dataset_mapper_vps.py:143-151)
            ref = self.rng.randrange(video_length)
            start = min(max(ref - self.sampling_frame_range, 0), video_length - t)
            idx = list(range(start, start + t))
        else:
            ref = self.rng.randrange(video_length)
            lo = max(0, ref - self.sampling_frame_range)
            hi = min(video_length, ref + self.sampling_frame_range + 1)
            pool = [i for i in range(lo, hi) if i != ref]
            picks = self.rng.sample(pool, min(t - 1, len(pool)))
            idx = sorted(picks + [ref])
            while len(idx) < t:
                idx.append(idx[-1])
        if self.reverse_augment and self.rng.random() < 0.5:
            idx = idx[::-1]
        return idx


def build_clip_targets(
    pan_frames: np.ndarray,  # (T, H, W) panoptic id maps of the clip
    label_divisor: int,
    capacity: int,
    out_hw: tuple[int, int],
) -> dict[str, np.ndarray]:
    """Panoptic id maps -> static-capacity video instance targets.

    Returns labels (1, N), masks (1, N, T, h, w) float, valid (1, N),
    frame_valid (1, N, T) for per-frame visibility.
    """
    from PIL import Image

    t = pan_frames.shape[0]
    h, w = out_hw
    ids = [int(i) for i in np.unique(pan_frames) if i != 0][:capacity]
    labels = np.zeros((1, capacity), np.int32)
    masks = np.zeros((1, capacity, t, h, w), np.float32)
    valid = np.zeros((1, capacity), bool)
    frame_valid = np.zeros((1, capacity, t), bool)
    for k, pid in enumerate(ids):
        labels[0, k] = pid // label_divisor
        valid[0, k] = True
        for f in range(t):
            m = (pan_frames[f] == pid).astype(np.uint8)
            if m.shape != (h, w):
                m = np.asarray(
                    Image.fromarray(m * 255).resize((w, h), Image.NEAREST)
                ) > 127
            masks[0, k, f] = m.astype(np.float32)
            frame_valid[0, k, f] = m.any()
    return {"labels": labels, "masks": masks, "valid": valid,
            "frame_valid": frame_valid}


def consistent_hflip(frames: np.ndarray, pan: np.ndarray, rng: random.Random):
    """Whole-clip horizontal flip with p=0.5 (video-consistent transform)."""
    if rng.random() < 0.5:
        return frames[:, :, ::-1].copy(), pan[:, :, ::-1].copy()
    return frames, pan


def consistent_crop(
    frames: np.ndarray, pan: np.ndarray, crop_hw: tuple[int, int],
    rng: random.Random,
):
    """Whole-clip random crop (offline stage adds crops, DVIS_Plus_Offline
    yaml CROP.ENABLED)."""
    t, h, w = frames.shape[:3]
    ch, cw = min(crop_hw[0], h), min(crop_hw[1], w)
    y = rng.randint(0, h - ch) if h > ch else 0
    x = rng.randint(0, w - cw) if w > cw else 0
    return (frames[:, y : y + ch, x : x + cw].copy(),
            pan[:, y : y + ch, x : x + cw].copy())
