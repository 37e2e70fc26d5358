"""Video panoptic meta-architectures: MinVIS / DVIS+ online / DVIS+ offline.

Equivalent of the reference ``MinVIS`` / ``CTMinVIS`` / ``DVIS_Plus_online`` /
``DVIS_Plus_offline`` (`dvis_Plus/meta_architecture.py`, `dvis_Plus/ctvis.py`):

- MinVIS: frame-wise segmenter; identity across frames recovered post-hoc by
  cosine-Hungarian query matching (``match_from_embds``) — no tracker params;
- DVIS+ online: frozen segmenter + referring tracker (frame-recurrent state
  supports window-resumed inference);
- DVIS+ offline: additionally a temporal refiner over the full video.

Freezing is an optimizer concern here (see train/panoptic_trainer.py): the
module exposes the staged forward passes; host-side window drivers live in
eval/video_inference.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmor_tpu.models.refiner import RefinerConfig, TemporalRefiner
from mmor_tpu.models.segmenter import SegmenterConfig, VideoSegmenter
from mmor_tpu.models.tracker import ReferringTracker, TrackerConfig, TrackerState


@dataclass(frozen=True)
class DVISConfig:
    segmenter: SegmenterConfig = field(default_factory=SegmenterConfig)
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    refiner: RefinerConfig = field(default_factory=RefinerConfig)
    window_size: int = 3  # test-time window (Base yaml TEST.WINDOW_SIZE)
    object_mask_threshold: float = 0.8
    overlap_threshold: float = 0.8

    @classmethod
    def tiny(cls, **kw):
        base = dict(
            segmenter=SegmenterConfig.tiny(),
            tracker=TrackerConfig.tiny(),
            refiner=RefinerConfig.tiny(),
        )
        base.update(kw)
        return cls(**base)


class DVISPlus(nn.Module):
    """Composite module; stages are separate methods so each training phase
    jits only what it needs."""

    cfg: DVISConfig

    def setup(self):
        self.segmenter = VideoSegmenter(self.cfg.segmenter, name="segmenter")
        self.tracker = ReferringTracker(self.cfg.tracker, name="tracker")
        self.refiner = TemporalRefiner(self.cfg.refiner, name="refiner")

    def segment(self, images: jax.Array, num_frames: int, train: bool = False):
        """(B*T, H, W, 3) normalized frames -> segmenter outputs.

        For the video stages the segmenter runs frame-independent (T folded
        into the batch, one query set per frame) like the reference's
        ``segmentor_windows_inference`` — pass num_frames=1 and reshape."""
        return self.segmenter(images, num_frames, train)

    def segment_frames(self, images: jax.Array, train: bool = False):
        """Frame-independent segmentation: every frame gets its own queries.

        images: (B*T, H, W, 3) -> dict with pred_embds (B*T, Q, C), masks
        (B*T, Q, 1, H/4, W/4), logits (B*T, Q, K+1). ``train=True`` turns on
        backbone stochastic depth (swin/vit_adapter)."""
        return self.segmenter(images, 1, train)

    def track(
        self,
        frame_embeds: jax.Array,  # (B, T, Q, C)
        frame_embeds_no_norm: jax.Array,
        mask_features: jax.Array,  # (B, T, H/4, W/4, C)
        state: TrackerState | None = None,
        noise_key: jax.Array | None = None,
        train: bool = False,
    ):
        return self.tracker(
            frame_embeds, frame_embeds_no_norm, mask_features,
            state=state, noise_key=noise_key, train=train,
        )

    def refine(
        self,
        instance_embeds: jax.Array,
        frame_embeds: jax.Array,
        mask_features: jax.Array,
        train: bool = False,
    ):
        return self.refiner(instance_embeds, frame_embeds, mask_features, train=train)

    def __call__(
        self,
        images: jax.Array,
        num_frames: int,
        train: bool = False,
        with_refiner: bool = True,
    ):
        """Full path (segment -> track [-> refine]) for init/compile checks.

        images: (B*T, H, W, 3). The frame-independent segmenter yields one
        query set per frame; queries regroup to (B, T, Q, C) for the tracker.
        ``with_refiner=True`` also traces the offline refiner so one ``init``
        materializes every stage's parameters.
        """
        seg = self.segment_frames(images)
        bt, q, c = seg["pred_embds"].shape
        b = bt // num_frames
        embds = seg["pred_embds"].reshape(b, num_frames, q, c)
        norm = embds / (jnp.linalg.norm(embds, axis=-1, keepdims=True) + 1e-6)
        # frame-independent segmenter ran with T=1: mask_features (B*T,1,h,w,C)
        mf = seg["mask_features"]
        mask_features = mf.reshape(b, num_frames, *mf.shape[2:])
        out, state = self.track(norm, embds, mask_features, train=train)
        if with_refiner:
            out = self.refine(
                out["pred_embds"], out["pred_embds"], mask_features, train=train
            )
        out["segmenter_outputs"] = seg
        return out, state
