"""Ground-truth export for panoptic evaluation.

Equivalent of the reference's GT-JSON generators
(`datasets/or_dataset.py:314-390`, `utils/gen_VIPSeg_test_json.py`): per
split, write the panopticapi-style ground-truth JSON (videos -> annotations
-> segments_info) and the color-coded GT PNGs the external VPQ tooling
expects, plus per-class pixel frequencies (feeds the CE class weighting,
`datasets/mmor_class_freqs.json`).
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

import numpy as np
from PIL import Image

from mmor_tpu.data.panoptic import categories, id2rgb


def export_ground_truth(
    video_records,
    output_dir: str | Path,
    split: str = "val",
    write_pngs: bool = True,
) -> dict:
    """Video records (data/panoptic.py) -> gt JSON (+ PNG dumps).

    Returns the JSON dict (also written to ``{split}_gt.json``).
    """
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    cats = categories()
    gt = {
        "categories": [
            {"id": i, "name": c["name"], "isthing": c["isthing"]}
            for i, c in cats.items()
        ],
        "videos": [],
        "annotations": [],
    }
    for rec in video_records:
        video_id = rec["video_id"]
        gt["videos"].append({
            "video_id": video_id,
            "images": [{"id": f"{video_id}_{i}", "file_name": str(f)}
                       for i, f in enumerate(rec["file_names"])],
        })
        annotations = []
        for i, infos in enumerate(rec["segments_infos"]):
            annotations.append({
                "image_id": f"{video_id}_{i}",
                "segments_info": [dict(s) for s in infos],
            })
            if write_pngs:
                png_dir = output_dir / "pan_gt" / video_id
                png_dir.mkdir(parents=True, exist_ok=True)
                Image.fromarray(id2rgb(rec["pan_seg"][i])).save(
                    png_dir / f"{i:06d}.png"
                )
        gt["annotations"].append({"video_id": video_id,
                                  "annotations": annotations})
    (output_dir / f"{split}_gt.json").write_text(json.dumps(gt))
    return gt


def class_pixel_frequencies(video_records) -> dict[int, int]:
    """Per-category pixel counts over a dataset — the reference's
    ``mmor_class_freqs.json`` generator (or_dataset.py:314-331)."""
    freqs: dict[int, int] = defaultdict(int)
    for rec in video_records:
        cat_seg = rec.get("category_seg")
        if cat_seg is None:
            cat_seg = rec["pan_seg"] // 10
        ids, counts = np.unique(cat_seg, return_counts=True)
        for c, n in zip(ids, counts):
            freqs[int(c)] += int(n)
    return dict(freqs)
