"""Downstream-task evaluation CLI — the reference's ``main_downstream.py``.

Loads predicted scene graphs (from ``evaluate_sg --mode infer``) and per-take
metalabel JSONs (``take_timestamp_to_{task}/``), runs the text-only
classifier prompts, and prints classification reports.

Usage:
  python -m mmor_tpu.cli.evaluate_downstream --task next_action \
      --scene_graphs scene_graph_predictions.json --metalabel_root ../MM-OR_data
  # smoke: --synthetic
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp

from mmor_tpu.cli.common import load_tokenizer
from mmor_tpu.config import LlamaConfig
from mmor_tpu.downstream import DownstreamPredictor, TASK_CLASSES
from mmor_tpu.models.llama import LlamaModel
from mmor_tpu.utils.checkpoint import restore_pytree


def load_scene_graphs(path: Path) -> list[dict]:
    """Accepts either the infer dump ({sample_id: triplets}) or the list
    format [{take_name, timepoint_idx, scene_graph}]."""
    data = json.loads(path.read_text())
    if isinstance(data, list):
        return data
    out = []
    for sid, triplets in data.items():
        take, frame = sid.rsplit("_", 1)
        out.append({"take_name": take, "timepoint_idx": int(frame),
                    "scene_graph": [tuple(t) for t in triplets]})
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=sorted(TASK_CLASSES), default="next_action")
    p.add_argument("--scene_graphs", default=None)
    p.add_argument("--metalabel_root", default="../MM-OR_data")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--preset", default="tiny")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args(argv)

    tokenizer = load_tokenizer(args.tokenizer)
    if args.preset == "7b":
        cfg = LlamaConfig()
    else:
        cfg = LlamaConfig.tiny(vocab_size=max(tokenizer.vocab_size, 259))
    model = LlamaModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=jnp.ones((1, 8), jnp.int32),
                        attention_mask=jnp.ones((1, 8), jnp.int32))
    if args.checkpoint:
        params = restore_pytree(args.checkpoint, params)

    if args.synthetic:
        scene_graphs = [
            {"take_name": "001_PKA_MMOR", "timepoint_idx": t,
             "scene_graph": [("head surgeon", "cutting", "patient")]}
            for t in range(4)
        ]
        metalabels = {"001_PKA": {str(t): "drill" for t in range(4)}}
    else:
        scene_graphs = load_scene_graphs(Path(args.scene_graphs))
        metalabels = {}
        root = Path(args.metalabel_root) / f"take_timestamp_to_{args.task}"
        for f in root.glob("*.json"):
            metalabels[f.stem] = json.loads(f.read_text())

    predictor = DownstreamPredictor(cfg=cfg, model=model, params=params,
                                    tokenizer=tokenizer, task=args.task)
    report = predictor.validate(scene_graphs, metalabels,
                                batch_size=args.batch_size)
    print(json.dumps({
        "task": args.task,
        "macro_f1": report["overall"]["real_macro"]["f1"],
        "accuracy": report["overall"]["accuracy"],
        "total": report["overall"]["total"],
    }, indent=2))


if __name__ == "__main__":
    main()
