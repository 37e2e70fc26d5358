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


# ---------------------------------------------------------------------------
# Remaining reference augmentations (`dvis_Plus/data_video/augmentation.py`):
# video-consistent resize-shortest-edge, photometric jitter, rotation, and
# pseudo-video clips. "Consistent" = one random draw applied to every frame
# of the clip (the reference's *Clip variants / flip_by_clip semantics).
# ---------------------------------------------------------------------------


def consistent_resize_shortest_edge(
    frames: np.ndarray,  # (T, H, W, 3) uint8
    pan: np.ndarray,  # (T, H, W) int
    min_sizes, max_size: int, rng: random.Random,
):
    """One shortest-edge target sampled per CLIP (min_size_train_sampling
    'choice_by_clip'); bilinear frames, nearest panoptic ids."""
    from PIL import Image

    t, h, w = frames.shape[:3]
    short = rng.choice(list(min_sizes))
    scale = short / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    if (nh, nw) == (h, w):
        return frames, pan
    fr = np.stack([
        np.asarray(Image.fromarray(f).resize((nw, nh), Image.BILINEAR))
        for f in frames
    ])
    pn = np.stack([
        np.asarray(Image.fromarray(p.astype(np.int32), mode="I")
                   .resize((nw, nh), Image.NEAREST))
        for p in pan
    ])
    return fr, pn.astype(pan.dtype)


def consistent_photometric(
    frames: np.ndarray,  # (T, H, W, 3) uint8
    rng: random.Random,
    brightness=(0.9, 1.1), contrast=(0.9, 1.1), saturation=(0.9, 1.1),
):
    """detectron2 RandomBrightness/Contrast/Saturation semantics with one
    factor per clip: brightness scales; contrast blends with the per-frame
    grayscale mean; saturation blends with the grayscale image."""
    wb = rng.uniform(*brightness)
    wc = rng.uniform(*contrast)
    ws = rng.uniform(*saturation)
    out = frames.astype(np.float32) * wb
    gray = (out @ np.asarray([0.299, 0.587, 0.114], np.float32))
    mean = gray.mean(axis=(1, 2), keepdims=True)[..., None]
    out = mean + wc * (out - mean)
    out = gray[..., None] + ws * (out - gray[..., None])
    return np.clip(out, 0, 255).astype(np.uint8)


def consistent_rotation(
    frames: np.ndarray,  # (T, H, W, 3) uint8
    pan: np.ndarray,  # (T, H, W) int
    rng: random.Random,
    angle_range=(-15.0, 15.0),
    center_range=((0.4, 0.4), (0.6, 0.6)),
):
    """Whole-clip rotation, detectron2 RandomRotation(expand=False) recipe:
    angle uniform in [-15, 15], center uniform in the middle 20% of the
    image. Frames rotate bilinear, panoptic ids nearest (fill 0 = VOID)."""
    from PIL import Image

    t, h, w = frames.shape[:3]
    angle = rng.uniform(*angle_range)
    (cx0, cy0), (cx1, cy1) = center_range
    center = (w * rng.uniform(cx0, cx1), h * rng.uniform(cy0, cy1))
    fr = np.stack([
        np.asarray(Image.fromarray(f).rotate(
            angle, resample=Image.BILINEAR, center=center))
        for f in frames
    ])
    pn = np.stack([
        np.asarray(Image.fromarray(p.astype(np.int32), mode="I").rotate(
            angle, resample=Image.NEAREST, center=center, fillcolor=0))
        for p in pan
    ])
    return fr, pn.astype(pan.dtype)


def pseudo_video_clip(
    frame: np.ndarray,  # (H, W, 3) uint8 single image
    pan: np.ndarray,  # (H, W) int
    num_frames: int,
    rng: random.Random,
    crop_frac: float = 0.8,
):
    """Fabricate a clip from ONE image: each frame takes an INDEPENDENT
    random crop of the same image, resized back — the reference's
    pseudo-video path (`build_pseudo_augmentation` + RandomCropClip with
    per-frame crops) used to turn image datasets into training videos."""
    from PIL import Image

    h, w = frame.shape[:2]
    ch, cw = max(1, int(h * crop_frac)), max(1, int(w * crop_frac))
    frames, pans = [], []
    for _ in range(num_frames):
        y = rng.randint(0, h - ch) if h > ch else 0
        x = rng.randint(0, w - cw) if w > cw else 0
        f = frame[y:y + ch, x:x + cw]
        p = pan[y:y + ch, x:x + cw]
        frames.append(np.asarray(
            Image.fromarray(f).resize((w, h), Image.BILINEAR)))
        pans.append(np.asarray(
            Image.fromarray(p.astype(np.int32), mode="I")
            .resize((w, h), Image.NEAREST)))
    return np.stack(frames), np.stack(pans).astype(pan.dtype)


def apply_train_augmentations(
    frames: np.ndarray,
    pan: np.ndarray,
    rng: random.Random,
    *,
    min_sizes=(480,), max_size: int = 1333,
    crop_hw: tuple[int, int] | None = None,
    photometric: bool = False,
    rotation: bool = False,
):
    """The reference's non-LSJ train recipe in order (`build_augmentation`):
    [crop] -> resize-shortest-edge -> flip -> [photometric] -> [rotation]."""
    if crop_hw is not None:
        frames, pan = consistent_crop(frames, pan, crop_hw, rng)
    frames, pan = consistent_resize_shortest_edge(
        frames, pan, min_sizes, max_size, rng)
    frames, pan = consistent_hflip(frames, pan, rng)
    if photometric:
        frames = consistent_photometric(frames, rng)
    if rotation and rng.random() < 0.5:
        frames, pan = consistent_rotation(frames, pan, rng)
    return frames, pan
