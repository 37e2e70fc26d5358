"""MM2SG assembly: splice correctness, forward shapes, multimodal generate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.config import MM2SGConfig
from mmor_tpu.models.mm2sg import (
    MM2SG,
    find_sentinel,
    generate,
    splice_multimodal,
)
from mmor_tpu.sg.prompts import IGNORE_INDEX, IMAGE_TOKEN_INDEX


def _batch(cfg, key, batch=2, t=12):
    ks = jax.random.split(key, 6)
    v = cfg.pooler.max_views
    size = cfg.vision.image_size
    ids = jax.random.randint(ks[0], (batch, t), 3, cfg.llama.vocab_size)
    # one sentinel per row at different positions
    ids = ids.at[0, 4].set(IMAGE_TOKEN_INDEX).at[1, 2].set(IMAGE_TOKEN_INDEX)
    mask = jnp.ones((batch, t), jnp.int32).at[1, 0].set(0)  # row 1 left-padded by 1
    return {
        "input_ids": ids,
        "attention_mask": mask,
        "images": jax.random.normal(ks[1], (batch, v, size, size, 3)),
        "view_mask": jnp.ones((batch, v), jnp.int32).at[1, -1].set(0),
        "pc_feature": jax.random.normal(ks[2], (batch, cfg.pooler.pc_feature_dim)),
        "audio_embedding": jax.random.normal(ks[3], (batch, cfg.pooler.audio_dim)),
        "segmasks": jax.random.randint(
            ks[4], (batch, cfg.pooler.num_segmask_tokens, 32, 32), 0, cfg.segmask.num_classes
        ),
    }


@pytest.fixture(scope="module")
def tiny():
    cfg = MM2SGConfig.tiny()
    model = MM2SG(cfg)
    batch = _batch(cfg, jax.random.PRNGKey(0))
    params = model.init(
        jax.random.PRNGKey(1),
        batch["input_ids"],
        batch["attention_mask"],
        batch["images"],
        batch["view_mask"],
        pc_feature=batch["pc_feature"],
        audio_embedding=batch["audio_embedding"],
        segmasks=batch["segmasks"],
    )
    return cfg, model, params, batch


def test_splice_matches_python_reference():
    key = jax.random.PRNGKey(2)
    b, t, m, d = 2, 7, 3, 5
    tok = jax.random.normal(key, (b, t, d))
    mm = jax.random.normal(jax.random.PRNGKey(3), (b, m, d))
    pos = jnp.array([2, 5], jnp.int32)
    mask = jnp.ones((b, t), jnp.int32).at[0, 0].set(0)
    labels = jnp.arange(b * t).reshape(b, t)
    embeds, out_mask, out_labels = splice_multimodal(tok, pos, mm, mask, labels)
    assert embeds.shape == (b, t + m - 1, d)
    for row in range(b):
        p = int(pos[row])
        expected = np.concatenate(
            [np.asarray(tok[row, :p]), np.asarray(mm[row]), np.asarray(tok[row, p + 1 :])]
        )
        np.testing.assert_allclose(np.asarray(embeds[row]), expected, atol=1e-6)
        exp_mask = np.concatenate(
            [np.asarray(mask[row, :p]), np.ones(m), np.asarray(mask[row, p + 1 :])]
        )
        np.testing.assert_array_equal(np.asarray(out_mask[row]), exp_mask)
        exp_labels = np.concatenate(
            [
                np.asarray(labels[row, :p]),
                np.full(m, IGNORE_INDEX),
                np.asarray(labels[row, p + 1 :]),
            ]
        )
        np.testing.assert_array_equal(np.asarray(out_labels[row]), exp_labels)


def test_find_sentinel():
    ids = jnp.array([[1, IMAGE_TOKEN_INDEX, 3], [IMAGE_TOKEN_INDEX, 5, 6]])
    np.testing.assert_array_equal(np.asarray(find_sentinel(ids)), [1, 0])


def test_forward_shapes(tiny):
    cfg, model, params, batch = tiny
    t = batch["input_ids"].shape[1]
    labels = jnp.where(batch["attention_mask"] == 1, batch["input_ids"], IGNORE_INDEX)
    logits, out_labels, aux = model.apply(
        params,
        batch["input_ids"],
        batch["attention_mask"],
        batch["images"],
        batch["view_mask"],
        pc_feature=batch["pc_feature"],
        audio_embedding=batch["audio_embedding"],
        segmasks=batch["segmasks"],
        labels=labels,
    )
    t_out = t + cfg.num_multimodal_tokens - 1
    assert logits.shape == (2, t_out, cfg.llama.vocab_size)
    assert out_labels.shape == (2, t_out)
    assert aux["attention_mask"].shape == (2, t_out)
    # multimodal positions are ignored in the loss
    assert int(jnp.sum(out_labels == IGNORE_INDEX)) >= cfg.num_multimodal_tokens * 2


def test_generate_runs_and_is_deterministic(tiny):
    cfg, model, params, batch = tiny
    out1 = generate(
        model, params, batch, max_cache_len=64, max_new_tokens=5, eos_token_id=2
    )
    out2 = generate(
        model, params, batch, max_cache_len=64, max_new_tokens=5, eos_token_id=2
    )
    assert out1.shape == (2, 5)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_modalities_change_output(tiny):
    cfg, model, params, batch = tiny
    logits1, _, _ = model.apply(
        params, batch["input_ids"], batch["attention_mask"], batch["images"],
        batch["view_mask"], pc_feature=batch["pc_feature"],
    )
    logits2, _, _ = model.apply(
        params, batch["input_ids"], batch["attention_mask"], batch["images"],
        batch["view_mask"], pc_feature=batch["pc_feature"] * 2.0,
    )
    assert float(jnp.max(jnp.abs(logits1 - logits2))) > 1e-6


def test_raw_pointcloud_path(tiny):
    cfg, model, params, batch = tiny
    p = cfg.ptv3.max_points
    pts = jax.random.uniform(jax.random.PRNGKey(9), (2, p, 6))
    pc_valid = jnp.ones((2, p), bool).at[1, :].set(False)  # sample 1: no cloud
    params2 = model.init(
        jax.random.PRNGKey(10),
        batch["input_ids"], batch["attention_mask"], batch["images"],
        batch["view_mask"], pc_points=pts, pc_valid=pc_valid,
    )
    logits, _, _ = model.apply(
        params2, batch["input_ids"], batch["attention_mask"], batch["images"],
        batch["view_mask"], pc_points=pts, pc_valid=pc_valid,
    )
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_quantized_serving_path(tiny):
    """int8 weights + int8 KV generate runs and closely tracks the float path."""
    import dataclasses

    from mmor_tpu.models.llama import quantize_llama_params

    cfg, model, params, batch = tiny
    qcfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, weight_quant=True, kv_quant=True)
    )
    qmodel = MM2SG(qcfg)
    qparams = {"params": dict(params["params"])}
    qparams["params"]["language_model"] = quantize_llama_params(
        params["params"]["language_model"]
    )
    out_q = generate(qmodel, qparams, batch, max_cache_len=64, max_new_tokens=5,
                     eos_token_id=2)
    out_f = generate(model, params, batch, max_cache_len=64, max_new_tokens=5,
                     eos_token_id=2)
    assert out_q.shape == out_f.shape == (2, 5)
    # deterministic
    out_q2 = generate(qmodel, qparams, batch, max_cache_len=64, max_new_tokens=5,
                      eos_token_id=2)
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_q2))
