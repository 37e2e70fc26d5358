"""End-to-end walkthrough on synthetic data — every stage of both stacks.

Runs in ~5 minutes on CPU (tiny presets):

  python examples/end_to_end_synthetic.py

1. fabricate a synthetic MM-OR/4D-OR tree;
2. generate LLaVA-format training samples (+ temporal memory);
3. LoRA-train tiny MM2SG a few steps and checkpoint;
4. evaluate scene-graph generation (triplet macro-F1 report);
5. train the tiny panoptic segmenter one CTVIS step;
6. run panoptic eval (VPQ/STQ).

Swap the tiny presets + synthetic data for the real datasets/weights per
docs/DATA.md and everything scales up unchanged.
"""

import random
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import jax

# tiny-preset walkthrough: CPU by default (remote TPU compiles are slow for
# throwaway tiny models); set MMOR_EXAMPLE_TPU=1 to run on the accelerator
if os.environ.get("MMOR_EXAMPLE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")


def main():
    root = Path(tempfile.mkdtemp(prefix="mmor_example_"))
    print(f"== workspace: {root}")

    # 1. synthetic dataset
    from mmor_tpu.data.synthetic import build_synthetic_dataset

    paths = build_synthetic_dataset(root / "datasets", n_frames=2)
    print("== built synthetic dataset")

    # 2. training samples
    from mmor_tpu.data.llava_json import (
        add_temporal_memory,
        generate_finetuning_samples,
    )
    from mmor_tpu.data.or_dataset import ORDataset

    train_ds = ORDataset(split="train", data_path=paths["data_path"],
                         mmor_root=paths["mmor_root"], or4d_root=paths["or4d_root"])
    samples = generate_finetuning_samples(train_ds, n_permutations=2,
                                          rng=random.Random(0))
    samples, _ = add_temporal_memory(samples, rng=random.Random(0))
    print(f"== generated {len(samples)} conversation samples")

    # 3. LoRA training
    from mmor_tpu.cli.train_mm2sg import main as train_main

    train_main(["--synthetic", "2", "--preset", "tiny", "--steps", "3",
                "--batch_size", "2", "--save_every", "3",
                "--run_dir", str(root / "mm2sg_run")])

    # 4. scene-graph evaluation — bf16, then the quantized serving config
    # (int4 weights; at 7B scale this also engages the whole-decode-step
    # megakernel and the int4 KV cache — ops/mega_decode.py)
    from mmor_tpu.cli.evaluate_sg import main as eval_main

    eval_main(["--synthetic", "2", "--preset", "tiny", "--batch_size", "2"])
    eval_main(["--synthetic", "2", "--preset", "tiny", "--batch_size", "2",
               "--quantize", "int4"])

    # 5. panoptic training (one CTVIS step)
    from mmor_tpu.cli.train_panoptic import main as pan_train

    pan_train(["--synthetic", "--tiny", "--steps", "1", "--frames", "2",
               "--save_every", "1", "--run_dir", str(root / "pan_run")])

    # 6. panoptic eval
    from mmor_tpu.cli.eval_panoptic import main as pan_eval

    pan_eval(["--synthetic", "--tiny"])

    print("== end-to-end walkthrough complete")


if __name__ == "__main__":
    main()
