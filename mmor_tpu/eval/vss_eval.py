"""VSS (video semantic segmentation) evaluator harness.

Equivalent of the reference's ``VSSEvaluator``
(`panoptic_segmentation/dvis_Plus/data_video/vss_eval.py:13-112`): a
dump/gather harness that writes per-frame semantic predictions as VSPW-layout
PNGs (``<out>/<video_id>/<frame>.png``) after remapping contiguous training
ids back to dataset ids (255 = ignore). The reference's ``evaluate()`` is a
no-op (``_do_evaluation=False`` — metrics run via the offline VSPW scripts);
here ``evaluate()`` optionally computes mIoU and VC_{2,4} directly from the
dump against a ground-truth directory using `eval/semantic.py`, so the
harness is self-contained.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from mmor_tpu.eval.semantic import miou, video_consistency


class VSSEvaluator:
    """Dump semantic predictions in VSPW layout; optionally score them.

    Args:
        output_dir: root for ``<video_id>/<frame>.png`` dumps.
        contiguous_id_to_dataset_id: remap applied before writing
            (reference `vss_eval.py:72-76`); identity if None.
        ignore_val: prediction value treated as ignore -> 255.
    """

    def __init__(self, output_dir, contiguous_id_to_dataset_id=None,
                 ignore_val: int = 255):
        self.output_dir = Path(output_dir)
        self.id_map = contiguous_id_to_dataset_id
        self.ignore_val = ignore_val
        self.reset()

    def reset(self):
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self._videos: list[str] = []

    def process(self, video_id: str, frame_names: list[str],
                sem_seg: np.ndarray) -> None:
        """sem_seg: (T, H, W) integer class map (contiguous training ids)."""
        from PIL import Image

        sem_seg = np.asarray(sem_seg)
        out = np.full_like(sem_seg, 255, dtype=np.uint8)
        for cls in np.unique(sem_seg):
            if cls == self.ignore_val:
                continue
            mapped = self.id_map[int(cls)] if self.id_map else int(cls)
            out[sem_seg == cls] = mapped
        vdir = self.output_dir / str(video_id)
        vdir.mkdir(parents=True, exist_ok=True)
        for i, name in enumerate(frame_names):
            stem = Path(name).stem
            Image.fromarray(out[i]).save(vdir / f"{stem}.png")
        self._videos.append(str(video_id))

    def evaluate(self, gt_dir=None, num_classes: int | None = None,
                 vc_windows: tuple[int, ...] = (2, 4)) -> dict:
        """Score the dump against ``gt_dir`` (same layout). Returns {} when no
        GT is given — matching the reference harness, which only dumps."""
        if gt_dir is None:
            return {}
        from PIL import Image

        gt_dir = Path(gt_dir)
        preds, gts = [], []
        for vid in sorted(set(self._videos)):
            frames = sorted((self.output_dir / vid).glob("*.png"))
            p = np.stack([np.asarray(Image.open(f)) for f in frames])
            g = np.stack([
                np.asarray(Image.open(gt_dir / vid / f.name)) for f in frames
            ])
            preds.append(p)
            gts.append(g)
        if num_classes is None:
            num_classes = int(max(g[g != 255].max() for g in gts)) + 1
        gt_frames = [f for g in gts for f in g]
        pred_frames = [f for p in preds for f in p]
        result = {"mIoU": miou(gt_frames, pred_frames, num_classes,
                               ignore_label=255)["miou"]}
        for n in vc_windows:
            vcs = [video_consistency(g, p, n, ignore_label=255)
                   for g, p in zip(gts, preds)]
            result[f"VC{n}"] = float(np.mean(vcs))
        return result
