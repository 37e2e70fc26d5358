"""Panoptic training CLI — the reference's ``train_net_video.py`` staged runs.

Stages hand off through the shared param tree: ``ctvis`` trains the segmenter
(frame-level set prediction + contrastive ReID), ``online`` trains the
tracker over a frozen segmenter, ``offline`` trains the refiner
(`configs/dvis_Plus/HybridOR/*.yaml`). Checkpoints save the FULL param tree
so the next stage starts from them (`--init_from`).

Smoke: --synthetic --tiny --steps 2
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.models.meta_arch import DVISConfig, DVISPlus
from mmor_tpu.models.segmenter import normalize_pixels
from mmor_tpu.train.criterion import CriterionConfig, build_class_weights
from mmor_tpu.train.panoptic_trainer import (
    PanopticTrainConfig,
    make_panoptic_train_step,
)
from mmor_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_pytree,
    save_train_checkpoint,
)


def synthetic_batches(cfg: DVISConfig, t: int, h: int, w: int,
                      n_targets: int = 4, batch: int = 1):
    rng = np.random.default_rng(0)
    while True:
        images = rng.standard_normal((batch * t, h, w, 3)).astype(np.float32)
        masks = np.zeros((batch, n_targets, t, h // 4, w // 4), np.float32)
        masks[:, 0, :, : h // 8] = 1.0
        labels = np.zeros((batch, n_targets), np.int32)
        labels[:, 0] = 1
        valid = np.zeros((batch, n_targets), bool)
        valid[:, 0] = True
        yield {
            "images": jnp.asarray(images),
            "targets": {
                "labels": jnp.asarray(labels),
                "masks": jnp.asarray(masks),
                "valid": jnp.asarray(valid),
            },
        }


def real_batches(args, cfg: DVISConfig, t: int, n_targets: int = 25):
    """Clip sampler over processed video records (dataset_mapper_vps-style):
    random continuous windows, masks resized to 1/4 feature scale."""
    from PIL import Image

    from mmor_tpu.data.panoptic import LABEL_DIVISOR, MMORPanopticDataset

    ds = MMORPanopticDataset(args.data_root, split=args.split)
    records = list(ds.video_records())
    rng = np.random.default_rng(0)
    while True:
        rec = records[rng.integers(len(records))]
        n_frames = len(rec["file_names"])
        start = int(rng.integers(max(n_frames - t, 1)))
        frames, pan = [], []
        for i in range(start, min(start + t, n_frames)):
            frames.append(np.asarray(
                Image.open(rec["file_names"][i]).convert("RGB"), np.float32
            ))
            pan.append(rec["pan_seg"][i])
        while len(frames) < t:
            frames.append(frames[-1])
            pan.append(pan[-1])
        frames_u8 = np.stack(frames).astype(np.uint8)
        pan = np.stack(pan)
        if getattr(args, "augment", False):
            import random as _random

            from mmor_tpu.data.video_mapper import apply_train_augmentations

            frames_u8, pan = apply_train_augmentations(
                frames_u8, pan, _random.Random(int(rng.integers(1 << 31))),
                min_sizes=(args.min_size,), max_size=args.max_size,
                crop_hw=None, photometric=args.photometric,
                rotation=args.rotation)
        images = normalize_pixels(frames_u8.astype(np.float32))
        h4, w4 = images.shape[1] // 4, images.shape[2] // 4
        ids = [i for i in np.unique(pan) if i != 0][:n_targets]
        masks = np.zeros((1, n_targets, t, h4, w4), np.float32)
        labels = np.zeros((1, n_targets), np.int32)
        valid = np.zeros((1, n_targets), bool)
        for k, pid in enumerate(ids):
            m = (pan == pid).astype(np.float32)
            m = np.asarray(jax.image.resize(jnp.asarray(m), (t, h4, w4), "nearest"))
            masks[0, k] = m
            labels[0, k] = pid // LABEL_DIVISOR
            valid[0, k] = True
        yield {
            "images": jnp.asarray(images),
            "targets": {
                "labels": jnp.asarray(labels),
                "masks": jnp.asarray(masks),
                "valid": jnp.asarray(valid),
            },
        }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["ctvis", "online", "offline"], default="ctvis")
    p.add_argument("--data_root", default="../MM-OR_data")
    p.add_argument("--split", default="train")
    p.add_argument("--run_dir", default="runs/panoptic")
    p.add_argument("--init_from", default=None)
    p.add_argument("--steps", type=int, default=100000)  # CTVIS_r50.yaml MAX_ITER
    p.add_argument("--frames", type=int, default=None,
                   help="frames/clip (default: 10 ctvis, 5 online/offline)")
    p.add_argument("--class_freqs", default=None,
                   help="mmor_class_freqs.json for CE weighting")
    p.add_argument("--weighting", default=None, choices=[None, "linear", "log"])
    p.add_argument("--save_every", type=int, default=10000)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--augment", action="store_true",
                   help="clip-consistent resize/flip (+ optional extras)")
    p.add_argument("--min_size", type=int, default=480)
    p.add_argument("--max_size", type=int, default=1333)
    p.add_argument("--photometric", action="store_true",
                   help="brightness/contrast/saturation 0.9-1.1 per clip")
    p.add_argument("--rotation", action="store_true",
                   help="[-15,15] deg clip-consistent rotation p=0.5")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel ways (reference: train_net_video.py "
                        "--num-gpus; here a ('data','model') jax mesh)")
    p.add_argument("--batch_size", type=int, default=1,
                   help="clips per step (synthetic path; must divide by --dp)")
    args = p.parse_args(argv)

    cfg = DVISConfig.tiny() if args.tiny else DVISConfig()
    t = args.frames or (10 if args.stage == "ctvis" else 5)  # yaml budgets
    h = w = 64 if args.tiny else 512
    model = DVISPlus(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((t, h, w, 3)), num_frames=t)

    source = latest_checkpoint(args.run_dir) or (
        latest_checkpoint(args.init_from) if args.init_from else None
    )
    if source is not None and (source / "state").exists():
        params = restore_pytree(source / "state", params)
        print(f"initialized params from {source}")

    crit = CriterionConfig.tiny(num_classes=cfg.segmenter.decoder.num_classes) \
        if args.tiny else CriterionConfig(num_classes=cfg.segmenter.decoder.num_classes)
    tcfg = PanopticTrainConfig(stage=args.stage, criterion=crit,
                               num_negatives=4 if args.tiny else 99)
    class_weights = None
    if args.class_freqs:
        freqs = {int(k): v for k, v in
                 json.loads(Path(args.class_freqs).read_text()).items()}
        class_weights = build_class_weights(crit, freqs, args.weighting)

    mesh = None
    if args.dp > 1:
        from mmor_tpu.parallel.mesh import make_mesh
        from mmor_tpu.train.panoptic_trainer import (
            make_sharded_panoptic_train_step,
        )

        mesh = make_mesh(n_data=args.dp)
        step_fn, state, rebuild = make_sharded_panoptic_train_step(
            mesh, model, tcfg, params, class_weights=class_weights
        )
    else:
        step_fn, state, rebuild = make_panoptic_train_step(
            model, tcfg, params, class_weights=class_weights
        )
        step_fn = jax.jit(step_fn, donate_argnums=(0,))

    batches = (synthetic_batches(cfg, t, h, w, batch=args.batch_size)
               if args.synthetic else real_batches(args, cfg, t))
    key = jax.random.PRNGKey(0)
    for step, batch in enumerate(batches, start=1):
        key, k = jax.random.split(key)
        if mesh is not None:
            from mmor_tpu.parallel.mesh import shard_batch

            batch = shard_batch(mesh, batch)
        state, metrics = step_fn(state, batch, k)
        if step % 20 == 0 or step == args.steps or step == 1:
            print(json.dumps({"step": step, **{m: float(v) for m, v in
                                               metrics.items()}}))
        if step % args.save_every == 0 or step == args.steps:
            full = rebuild(state["trainable"])
            save_train_checkpoint(args.run_dir, step, full_state=full)
        if step >= args.steps:
            break
    print(f"stage {args.stage} done; checkpoints in {args.run_dir}")


if __name__ == "__main__":
    main()
