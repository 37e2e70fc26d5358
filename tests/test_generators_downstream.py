"""Training-JSON generators + downstream tasks."""

import json
import random
from pathlib import Path

import jax
import pytest

from mmor_tpu.config import LlamaConfig
from mmor_tpu.data.llava_json import (
    add_temporal_memory,
    generate_finetuning_samples,
    scene_graph_to_string,
    token_frequencies,
)
from mmor_tpu.data.or_dataset import ORDataset
from mmor_tpu.data.synthetic import build_synthetic_dataset
from mmor_tpu.downstream import (
    DownstreamPredictor,
    TASK_CLASSES,
    build_downstream_prompt,
    classify_output,
    generate_downstream_samples,
    prepare_take_histories,
)
from mmor_tpu.inference import ByteTokenizer
from mmor_tpu.models.llama import LlamaModel


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    return build_synthetic_dataset(tmp_path_factory.mktemp("gen"), n_frames=3)


@pytest.fixture(scope="module")
def train_ds(synthetic):
    return ORDataset(split="train", data_path=synthetic["data_path"],
                     mmor_root=synthetic["mmor_root"],
                     or4d_root=synthetic["or4d_root"])


def test_scene_graph_to_string():
    s = scene_graph_to_string([["head_surgeon", "patient", "cutting"]])
    assert s == "<SG> head surgeon,patient,cutting </SG>"


def test_generate_finetuning_samples(train_ds):
    samples = generate_finetuning_samples(
        train_ds, n_permutations=3, rng=random.Random(0)
    )
    assert len(samples) == len(train_ds) * 3
    s = samples[0]
    assert s["conversations"][0]["value"].startswith("<image>\n")
    assert "<SG>" in s["conversations"][1]["value"]
    assert "image" in s
    # MM-OR samples carry the metadata injections
    mmor = [x for x in samples if "MMOR" in x["id"]][0]
    human = mmor["conversations"][0]["value"]
    assert "<robot_metadata_start>" in human
    assert "<tracker_metadata_start>" in human
    assert "<speech_transcript_start>" in human
    # 10 image slots for MM-OR: 5 azure + 4 simstation + 1 trackercam
    assert len(mmor["image"]) == 10


def test_mixed_modalities_swaps_from_similar(train_ds):
    samples = generate_finetuning_samples(
        train_ds, n_permutations=1, mixed_modalities=True, rng=random.Random(1)
    )
    assert len(samples) > 0  # smoke: swap path runs with similar_samples attached


def test_add_temporal_memory(train_ds):
    samples = generate_finetuning_samples(train_ds, n_permutations=1,
                                          rng=random.Random(0))
    samples, memory_index = add_temporal_memory(
        samples, with_augmentation=False, rng=random.Random(0)
    )
    later = [s for s in samples if s["timepoint"] > 0]
    assert any("<memory_start>" in s["conversations"][0]["value"] for s in later)
    assert len(memory_index) > 0


def test_token_frequencies(train_ds):
    samples = generate_finetuning_samples(train_ds, n_permutations=1,
                                          rng=random.Random(0))
    freq = token_frequencies(samples, tokenize=str.split)
    assert freq and all(isinstance(v, int) for v in freq.values())


def test_classify_output():
    assert classify_output("next_action", " Drill. ") == TASK_CLASSES["next_action"].index("drill")
    assert classify_output("sterility_breach", "yes") == 1
    assert classify_output("next_action", "gibberish") == len(TASK_CLASSES["next_action"]) - 1


def _fake_scene_graphs():
    return [
        {"take_name": "001_PKA_MMOR", "timepoint_idx": t,
         "scene_graph": [("head surgeon", "cutting", "patient")]}
        for t in range(3)
    ]


def test_prepare_take_histories():
    log, full = prepare_take_histories(_fake_scene_graphs())
    assert "001_PKA" in log
    assert len(full["001_PKA"]) == 3


def test_downstream_predictor_validate(tmp_path):
    tokenizer = ByteTokenizer()
    cfg = LlamaConfig.tiny(vocab_size=tokenizer.vocab_size)
    model = LlamaModel(cfg)
    import jax.numpy as jnp

    params = model.init(jax.random.PRNGKey(0),
                        input_ids=jnp.ones((1, 8), jnp.int32),
                        attention_mask=jnp.ones((1, 8), jnp.int32))
    pred = DownstreamPredictor(cfg=cfg, model=model, params=params,
                               tokenizer=tokenizer, task="next_action",
                               max_new_tokens=4, prompt_bucket=64)
    metalabels = {"001_PKA": {"0": "drill", "1": "saw", "2": "none"}}
    report = pred.validate(_fake_scene_graphs(), metalabels, batch_size=2)
    assert report["overall"]["total"] == 3
    assert "001_PKA" in report["takes"]


def test_generate_downstream_samples(tmp_path):
    roots = {}
    for task in TASK_CLASSES:
        d = tmp_path / task
        d.mkdir()
        roots[task] = d
    (roots["next_action"] / "001_PKA.json").write_text(
        json.dumps({"0": "drill", "1": "saw"}))
    (roots["sterility_breach"] / "001_PKA.json").write_text(
        json.dumps({"0": "no", "1": "yes"}))
    samples = generate_downstream_samples(
        _fake_scene_graphs(), roots, rng=random.Random(0),
        keep_empty_sterility_prob=0.0,
    )
    tasks = {s["task"] for s in samples}
    assert "next_action" in tasks
    breach = [s for s in samples if s["task"] == "sterility_breach"]
    # 'no' labels fully undersampled away; only the 'yes' remains
    assert len(breach) == 1 and breach[0]["conversations"][1]["value"] == "yes"
