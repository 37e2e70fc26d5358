"""Panoptic e2e proof: overfit the tiny segmenter on one clip until the
VPS post-processing + VPQ pipeline scores the prediction highly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.eval.video_inference import vps_inference
from mmor_tpu.eval.vpq import vpq_compute
from mmor_tpu.models.meta_arch import DVISConfig, DVISPlus
from mmor_tpu.train.criterion import CriterionConfig
from mmor_tpu.train.panoptic_trainer import (
    PanopticTrainConfig,
    make_panoptic_train_step,
)


@pytest.mark.slow
def test_ctvis_overfit_reaches_high_vpq():
    cfg = DVISConfig.tiny()
    model = DVISPlus(cfg)
    b, t, h, w = 1, 2, 64, 64
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((b * t, h, w, 3)), jnp.float32)
    masks = jnp.zeros((b, 3, t, 16, 16)).at[:, 0, :, :, :8].set(1.0)
    targets = {"labels": jnp.array([[2, 0, 0]], jnp.int32), "masks": masks,
               "valid": jnp.array([[True, False, False]])}
    batch = {"images": frames, "targets": targets}
    params = model.init(jax.random.PRNGKey(1), frames, num_frames=t)
    tcfg = PanopticTrainConfig(
        stage="ctvis",
        criterion=CriterionConfig.tiny(num_classes=cfg.segmenter.decoder.num_classes),
        num_negatives=4, learning_rate=5e-4,
    )
    step_fn, state, rebuild = make_panoptic_train_step(model, tcfg, params)
    step_fn = jax.jit(step_fn, donate_argnums=(0,))
    key = jax.random.PRNGKey(0)
    first_loss = None
    for _ in range(120):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, batch, k)
        if first_loss is None:
            first_loss = float(metrics["total"])
    assert float(metrics["total"]) < first_loss * 0.4

    full = rebuild(state["trainable"])
    seg = model.apply(full, frames, method=DVISPlus.segment_frames)
    logits = np.asarray(seg["pred_logits"]).mean(0)
    pred_masks = np.asarray(seg["pred_masks"])[:, :, 0].transpose(1, 0, 2, 3)
    result = vps_inference(
        logits, pred_masks, np.arange(logits.shape[0]),
        num_classes=cfg.segmenter.decoder.num_classes, num_thing_classes=24,
        object_mask_threshold=0.3,
    )
    assert result["segments_infos"], "no segments survived post-processing"
    assert result["segments_infos"][0]["category_id"] == 2

    gt_map = np.zeros((t, 16, 16), np.int64)
    gt_map[:, :, :8] = 20
    gt_frames = [(gt_map[i], [{"id": 20, "category_id": 2, "iscrowd": 0}])
                 for i in range(t)]
    pan = result["pred_masks"]
    pred_frames = []
    for i in range(t):
        ids = set(np.unique(pan[i])) - {0}
        infos = [dict(s) for s in result["segments_infos"] if s["id"] in ids]
        pred_frames.append((pan[i], infos))
    out = vpq_compute([(gt_frames, pred_frames)],
                      {i: {"isthing": 1} for i in range(11)}, nframes=2)
    # the GT class must be learned and tube-matched (IoU > 0.5); other
    # categories may pick up spurious low-score segments on a random image
    assert out["per_class"][2]["pq"] > 0.6, out["per_class"][2]
    assert out["all"]["pq"] > 0.3, out["all"]
