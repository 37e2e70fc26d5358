"""Panoptic evaluation CLI — the reference's ``train_net_video.py --eval-only``.

Runs windowed DVIS inference over video records (tracker state folded across
windows, meta_architecture.py:779-840), builds per-frame panoptic maps
(inference_video_vps) and computes VPQ@{4,8} + STQ via the VPSEvaluator.

Smoke: --synthetic fabricates a tiny video dataset.
"""

from __future__ import annotations

import argparse
import json
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.data.panoptic import LABEL_DIVISOR, categories
from mmor_tpu.eval.video_inference import run_window_inference, vps_inference
from mmor_tpu.eval.vps_eval import VPSEvaluator
from mmor_tpu.models.meta_arch import DVISConfig, DVISPlus
from mmor_tpu.models.segmenter import normalize_pixels
from mmor_tpu.utils.checkpoint import restore_pytree


def make_window_step(model: DVISPlus, params, window_size: int,
                     arch: str = "dvis"):
    """jitted (frames (T,H,W,3), tracker state) -> frame-first outputs.

    ``arch='dvis'`` runs the referring tracker (window-resumed state);
    ``arch='minvis'`` returns per-frame segmenter outputs for post-hoc
    cosine-Hungarian alignment (MinVIS, meta_architecture.py:258-305).
    """

    @jax.jit
    def step(frames, state):
        images = normalize_pixels(frames)
        seg = model.apply(params, images, method=DVISPlus.segment_frames)
        t = window_size
        q, c = seg["pred_embds"].shape[1:]
        if arch == "minvis":
            return {
                "pred_logits": seg["pred_logits"],  # (T, Q, K+1)
                "pred_masks": seg["pred_masks"][:, :, 0],  # (T, Q, H, W)
                "pred_embds": seg["pred_embds"],  # (T, Q, C)
            }, state
        embds = seg["pred_embds"].reshape(1, t, q, c)
        norm = embds / (jnp.linalg.norm(embds, axis=-1, keepdims=True) + 1e-6)
        mf = seg["mask_features"]
        mask_features = mf.reshape(1, t, *mf.shape[2:])
        out, new_state = model.apply(
            params, norm, embds, mask_features, state=state,
            method=DVISPlus.track,
        )
        return {
            "pred_logits": out["pred_logits"][0],  # (T, Q, K+1)
            "pred_masks": out["pred_masks"][0].transpose(1, 0, 2, 3),  # (T,Q,H,W)
        }, new_state

    def wrapper(frames, state):
        outputs, new_state = step(jnp.asarray(frames), state)
        return {k: np.asarray(v) for k, v in outputs.items()}, new_state

    return wrapper


def evaluate_videos(model, params, video_iter, cfg: DVISConfig,
                    output_dir=None, num_workers: int = 0,
                    arch: str = "dvis") -> dict:
    evaluator = VPSEvaluator(output_dir=output_dir)
    num_classes = cfg.segmenter.decoder.num_classes
    n_things = len(categories())  # all OR classes tracked as things
    window_step = make_window_step(model, params, cfg.window_size, arch=arch)

    from PIL import Image

    for record in video_iter:
        frames = np.stack([
            np.asarray(Image.open(f).convert("RGB"), dtype=np.float32)
            for f in record["file_names"]
        ])
        out = run_window_inference(window_step, frames, cfg.window_size)
        if arch == "minvis":
            from mmor_tpu.eval.video_inference import minvis_post_process

            video_logits, pred_masks = minvis_post_process(
                out["pred_logits"], out["pred_masks"], out["pred_embds"]
            )
        else:
            # tracker keeps query ids aligned, so a plain mean is the analogue
            video_logits = out["pred_logits"].mean(axis=0)  # (Q, K+1)
            pred_masks = out["pred_masks"].transpose(1, 0, 2, 3)  # (Q, T, H, W)
        # upsample to GT resolution
        gt = record["pan_seg"]
        if pred_masks.shape[-2:] != gt.shape[-2:]:
            import jax.image

            pred_masks = np.asarray(jax.image.resize(
                jnp.asarray(pred_masks),
                pred_masks.shape[:2] + gt.shape[-2:],
                method="bilinear",
            ))
        result = vps_inference(
            video_logits, pred_masks, np.arange(video_logits.shape[0]),
            num_classes=num_classes, num_thing_classes=n_things,
            object_mask_threshold=cfg.object_mask_threshold,
            overlap_threshold=cfg.overlap_threshold,
        )
        # panoptic ids in VPQ must carry category: re-encode as cat*divisor
        pan = result["pred_masks"]
        remap = np.zeros((len(result["segments_infos"]) + 1,), np.int64)
        infos = []
        for s in result["segments_infos"]:
            remap[s["id"]] = s["category_id"] * LABEL_DIVISOR
            infos.append({"id": s["category_id"] * LABEL_DIVISOR,
                          "category_id": s["category_id"], "iscrowd": 0})
        pan = remap[pan]
        # dedupe infos by id (stuff merge)
        infos = list({i["id"]: i for i in infos}.values())
        evaluator.process(
            record["video_id"], pan, infos, gt,
            record["segments_infos"],
        )
    return evaluator.evaluate(num_workers=num_workers)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="../MM-OR_data")
    p.add_argument("--split", default="test")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--arch", choices=["dvis", "minvis"], default="dvis")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    cfg = DVISConfig.tiny() if args.tiny else DVISConfig()
    model = DVISPlus(cfg)
    h = w = 64 if args.tiny else 512
    t = cfg.window_size
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((t, h, w, 3)), num_frames=t,
    )
    if args.checkpoint:
        params = restore_pytree(args.checkpoint, params)

    if args.synthetic:
        videos = _synthetic_videos(h, w, cfg)
    else:
        from mmor_tpu.data.panoptic import MMORPanopticDataset

        ds = MMORPanopticDataset(args.data_root, split=args.split)
        videos = ds.video_records()

    result = evaluate_videos(model, params, videos, cfg,
                             output_dir=args.output_dir, arch=args.arch)
    summary = {
        "vpq": result["vpq"], "stq": result["stq"],
        "vpq_per_window": {str(k): v["all"]["pq"]
                           for k, v in result["per_window"].items()},
    }
    if args.output_dir:
        # per-class PQ/precision/recall dump (the reference's wandb surface,
        # vps_eval.py:354-375)
        from mmor_tpu.utils.logging import MetricsLogger

        logger = MetricsLogger(args.output_dir, echo=False)
        per_class = result["per_window"][max(result["per_window"])]["per_class"]
        record = {f"pq_class_{c}": m["pq"] for c, m in per_class.items()}
        record.update({f"vpq_w{k}": v for k, v in summary["vpq_per_window"].items()})
        logger.log(0, vpq=result["vpq"], stq=result["stq"], **record)
    print(json.dumps(summary, indent=2))


def _synthetic_videos(h, w, cfg):
    import tempfile

    from PIL import Image

    tmp = Path(tempfile.mkdtemp(prefix="mmor_panoptic_"))
    rng = np.random.default_rng(0)
    for t in range(4):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            tmp / f"{t}.jpg"
        )
    gt = np.zeros((4, h // 4, w // 4), np.int64)
    gt[:, :, : w // 8] = 5 * LABEL_DIVISOR
    infos = [[{"id": 5 * LABEL_DIVISOR, "category_id": 5, "iscrowd": 0}]] * 4
    yield {
        "video_id": "synthetic_0",
        "file_names": [str(tmp / f"{t}.jpg") for t in range(4)],
        "pan_seg": gt,
        "segments_infos": infos,
    }


if __name__ == "__main__":
    main()
