"""Scene-graph evaluation CLI — the reference's ``scene_graph_prediction.main``.

Modes (main.py:47-133):
- ``evaluate``: run the predictor over the test split, print the report;
- ``eval_all``: sweep every ``checkpoint-*`` under --run_dir, skipping ones
  recorded in ``evaluated_checkpoints.json`` (main.py:28-44);
- ``infer``: dump raw predicted scene graphs to JSON (consumed by the
  downstream tasks and the temporal-PRED curriculum).

Usage:
  python -m mmor_tpu.cli.evaluate_sg --data_path data --mode evaluate \
      --checkpoint <orbax dir> [--temporality PRED] [--preset 7b|small|tiny]

With --synthetic N a synthetic dataset is fabricated for smoke runs.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax

from mmor_tpu.cli.common import build_predictor, load_tokenizer, make_dataset
from mmor_tpu.utils.checkpoint import latest_checkpoint, restore_pytree


def summarize(report: dict) -> dict:
    return {
        "macro_f1": report["macro_f1"],
        "precision": report["relations"]["real_macro"]["precision"],
        "recall": report["relations"]["real_macro"]["recall"],
        "binary_interaction_f1": report["binary_interaction"]["real_macro"]["f1"],
        "entity_f1": report["entities"]["real_macro"]["f1"],
        "datatypes": {
            dt: r["real_macro"]["f1"] for dt, r in report["datatypes"].items()
        },
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["evaluate", "eval_all", "infer"],
                   default="evaluate")
    p.add_argument("--data_path", default="data")
    p.add_argument("--split", default="test")  # evaluate/infer use test (main.py:66)
    p.add_argument("--preset", default="tiny")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--run_dir", default=None, help="for eval_all sweeps")
    p.add_argument("--tokenizer", default=None, help="HF tokenizer dir (optional)")
    p.add_argument("--temporality", default=None, choices=[None, "PRED"])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--limit_batches", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="fabricate a synthetic dataset with N frames")
    p.add_argument("--output", default=None)
    p.add_argument("--quantize", nargs="?", const="int8", default=None,
                   choices=["int8", "int4"],
                   help="serving quantization: bare flag or 'int8' = packed "
                        "int8 W+KV (per-op decode); 'int4' = the megakernel "
                        "config (fused projections, int4 W + int4 KV, all "
                        "decoder layers in one pallas call per token)")
    p.add_argument("--verbose", action="store_true",
                   help="print the reference-style per-take tables")
    args = p.parse_args(argv)

    dataset = make_dataset(args)
    tokenizer = load_tokenizer(args.tokenizer)

    def run(checkpoint):
        predictor = build_predictor(args.preset, tokenizer, checkpoint,
                                    temporality=args.temporality,
                                    quantize=args.quantize)
        if args.temporality == "PRED":
            predictor.temporality = "PRED"
        items = [dataset[i] for i in range(len(dataset))]
        report, raw = predictor.validate(
            items, batch_size=args.batch_size, limit_batches=args.limit_batches
        )
        return report, raw

    if args.mode == "eval_all":
        run_dir = Path(args.run_dir)
        record_path = run_dir / "evaluated_checkpoints.json"
        done = json.loads(record_path.read_text()) if record_path.exists() else []
        for ckpt in sorted(run_dir.glob("checkpoint-*")):
            if ckpt.name in done:
                continue
            report, _ = run(ckpt)
            print(json.dumps({ckpt.name: summarize(report)}, indent=2))
            done.append(ckpt.name)
            record_path.write_text(json.dumps(done))
        return

    report, raw = run(args.checkpoint)
    if args.verbose:
        from mmor_tpu.eval.report_format import format_sg_report

        print(format_sg_report(report))
    print(json.dumps(summarize(report), indent=2))
    if args.mode == "infer":
        out = Path(args.output or "scene_graph_predictions.json")
        out.write_text(json.dumps({
            sid: [list(t) for t in triplets] for sid, triplets in raw.items()
        }))
        print(f"wrote raw predictions to {out}")


if __name__ == "__main__":
    main()
