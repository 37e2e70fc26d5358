"""MM2SG training pipeline: augmentation, masking, collation, grouped batches,
and a full overfit smoke (generator -> dataset -> LoRA step)."""

import random

import jax
import numpy as np
import pytest

from mmor_tpu.config import MM2SGConfig, LlamaConfig
from mmor_tpu.data.llava_json import generate_finetuning_samples
from mmor_tpu.data.or_dataset import ORDataset
from mmor_tpu.data.sg_train_data import (
    SGTrainDataConfig,
    SGTrainDataset,
    drop_metadata_span,
)
from mmor_tpu.data.synthetic import build_synthetic_dataset
from mmor_tpu.inference import ByteTokenizer
from mmor_tpu.models.mm2sg import MM2SG
from mmor_tpu.sg.prompts import IGNORE_INDEX, IMAGE_TOKEN_INDEX


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    synth = build_synthetic_dataset(tmp_path_factory.mktemp("train"), n_frames=2)
    ds = ORDataset(split="train", data_path=synth["data_path"],
                   mmor_root=synth["mmor_root"], or4d_root=synth["or4d_root"])
    samples = generate_finetuning_samples(ds, n_permutations=1, rng=random.Random(0))
    tokenizer = ByteTokenizer()
    mcfg = MM2SGConfig.tiny(
        llama=LlamaConfig.tiny(vocab_size=tokenizer.vocab_size, max_seq_len=4096)
    )
    data = SGTrainDataset(
        samples, tokenizer, mcfg,
        SGTrainDataConfig(prompt_bucket=256), rng=random.Random(1),
    )
    return mcfg, tokenizer, data


def test_drop_metadata_span():
    text = "<image>\nA <robot_metadata_start>: stuff <robot_metadata_end>. Entities: x"
    out = drop_metadata_span(text, "robot_metadata")
    assert out == "<image>\nA Entities: x"


def test_item_structure(pipeline):
    mcfg, tokenizer, data = pipeline
    item = data[0]
    assert item["images"].shape[0] == mcfg.pooler.max_views
    assert item["view_mask"].sum() >= 1
    ids = item["input_ids"]
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    # labels: prompt masked, answer supervised, ends with eos
    n_prompt_masked = sum(1 for l in item["labels"] if l == IGNORE_INDEX)
    assert 0 < n_prompt_masked < len(item["labels"])
    assert item["labels"][-1] == tokenizer.eos_token_id


def test_collate_shapes(pipeline):
    mcfg, tokenizer, data = pipeline
    batch = data.collate([data[0], data[1]])
    assert batch["input_ids"].shape == batch["labels"].shape
    assert batch["input_ids"].shape[1] % 256 == 0
    assert (batch["labels"][batch["attention_mask"] == 0] == IGNORE_INDEX).all()


def test_grouped_batches_cover_dataset(pipeline):
    mcfg, tokenizer, data = pipeline
    batches = list(data.grouped_batches(batch_size=2, shuffle=True))
    total = sum(b["input_ids"].shape[0] for b in batches)
    assert total == len(data)


def test_lora_overfit_step_on_real_pipeline(pipeline):
    from mmor_tpu.train import trainer as tr
    from mmor_tpu.train.lora import LoraConfig

    mcfg, tokenizer, data = pipeline
    model = MM2SG(mcfg)
    batch = data.collate([data[0]])
    import jax.numpy as jnp

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(
        jax.random.PRNGKey(0), jbatch["input_ids"], jbatch["attention_mask"],
        jbatch["images"], jbatch["view_mask"],
        audio_embedding=jbatch.get("audio_embedding"),
        pc_points=jbatch.get("pc_points"), pc_valid=jbatch.get("pc_valid"),
    )
    tx = tr.make_optimizer(tr.TrainConfig(learning_rate=1e-2, total_steps=10))
    step_fn, state = tr.make_lora_train_step(
        model, tx, LoraConfig(rank=2, alpha=4), params
    )
    step_fn = jax.jit(step_fn)
    losses = []
    for _ in range(5):
        state, metrics = step_fn(state, jbatch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_photometric_augment_preserves_shape():
    from PIL import Image as PILImage

    from mmor_tpu.data.sg_train_data import photometric_augment

    img = PILImage.new("RGB", (32, 24), (100, 150, 200))
    rng = random.Random(0)
    for _ in range(16):  # cycle through the op pool
        out = photometric_augment(img, rng)
        assert out.size == img.size and out.mode == "RGB"


def test_combined_records_ratio():
    import random as _random

    from mmor_tpu.data.panoptic import combined_records

    class Fake:
        def __init__(self, tag, n):
            self._recs = [{"video_id": f"{tag}{i}"} for i in range(n)]

        def video_records(self):
            return iter(self._recs)

    gen = combined_records([Fake("a", 3), Fake("b", 3)], [0.9, 0.1],
                           rng=_random.Random(0))
    tags = [next(gen)["video_id"][0] for _ in range(200)]
    assert tags.count("a") > 150  # ratio-weighted
    assert tags.count("b") > 0
