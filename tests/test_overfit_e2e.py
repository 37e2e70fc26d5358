"""Knock-out e2e proof: train MM2SG on one sample until greedy generation
reproduces the scene graph exactly (triplet F1 = 1.0 through the full
tokenize -> train -> KV-cache decode -> parse -> evaluate pipeline)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.config import LlamaConfig, MM2SGConfig
from mmor_tpu.data.sg_train_data import SGTrainDataConfig, SGTrainDataset
from mmor_tpu.eval.sg_eval import SceneGraphEvaluator
from mmor_tpu.inference import ByteTokenizer
from mmor_tpu.models.mm2sg import MM2SG, generate
from mmor_tpu.sg.prompts import VicunaConversation, left_pad_batch, tokenize_with_image_token
from mmor_tpu.train import trainer as tr

ANSWER = "<SG> head surgeon,patient,cutting </SG>"
PROMPT = "<image>\nGenerate the scene graph."


@pytest.mark.slow
def test_overfit_single_sample_reaches_perfect_f1():
    tok = ByteTokenizer()
    cfg = MM2SGConfig.tiny(
        llama=LlamaConfig.tiny(vocab_size=tok.vocab_size, dim=128, n_layers=2,
                               ffn_dim=256),
        max_new_tokens=48,
    )
    model = MM2SG(cfg)
    sample = {
        "id": "001_PKA_MMOR_0", "timepoint": 0, "vis_knowledge_paths": None,
        "conversations": [
            {"from": "human", "value": PROMPT},
            {"from": "gpt", "value": ANSWER},
        ],
    }
    data = SGTrainDataset(
        [sample], tok, cfg,
        SGTrainDataConfig(do_img_order_augment=False, do_multimodal_augment=False,
                          prompt_bucket=128),
        rng=random.Random(0),
    )
    jbatch = {k: jnp.asarray(v) for k, v in data.collate([data[0]]).items()}
    params = model.init(jax.random.PRNGKey(0), jbatch["input_ids"],
                        jbatch["attention_mask"], jbatch["images"],
                        jbatch["view_mask"])
    tx = tr.make_optimizer(tr.TrainConfig(learning_rate=2e-3, total_steps=800,
                                          warmup_ratio=0.02))
    state = tr.init_train_state(params, tx)
    step = jax.jit(lambda s, b: tr.train_step(model, tx, s, b))
    for _ in range(800):
        state, metrics = step(state, jbatch)
    assert float(metrics["loss"]) < 1e-3

    conv = VicunaConversation()
    conv.append("USER", PROMPT)
    conv.append("ASSISTANT", None)
    ids = tokenize_with_image_token(conv.prompt(), tok)
    pids, mask = left_pad_batch([ids], tok.pad_token_id, 128)
    gen_batch = {
        "input_ids": jnp.asarray(pids), "attention_mask": jnp.asarray(mask),
        "images": jbatch["images"], "view_mask": jbatch["view_mask"],
    }
    tokens = generate(model, state["params"], gen_batch, max_cache_len=256,
                      max_new_tokens=48, eos_token_id=tok.eos_token_id)
    row = [int(t) for t in np.asarray(tokens)[0]]
    if tok.eos_token_id in row:
        row = row[: row.index(tok.eos_token_id)]
    text = tok.decode(row).strip()
    assert text == ANSWER, text

    evaluator = SceneGraphEvaluator()
    evaluator.add_sample("001_PKA_MMOR", text, [["head_surgeon", "patient", "cutting"]])
    assert evaluator.report()["macro_f1"] == pytest.approx(1.0)
