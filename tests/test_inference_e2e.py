"""End-to-end smoke: synthetic dataset -> ORDataset -> predictor -> report."""

import numpy as np
import pytest
import jax

from mmor_tpu.config import MM2SGConfig
from mmor_tpu.data.or_dataset import ORDataset
from mmor_tpu.data.preprocessing import load_pcd, pad_pointcloud
from mmor_tpu.data.synthetic import build_synthetic_dataset
from mmor_tpu.inference import ByteTokenizer, SceneGraphPredictor
from mmor_tpu.models.mm2sg import MM2SG


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    return build_synthetic_dataset(tmp_path_factory.mktemp("e2e"), n_frames=2)


@pytest.fixture(scope="module")
def predictor(synthetic):
    cfg = MM2SGConfig.tiny(max_new_tokens=6)
    tokenizer = ByteTokenizer()
    cfg = MM2SGConfig.tiny(
        llama=cfg.llama.__class__.tiny(vocab_size=tokenizer.vocab_size),
        max_new_tokens=6,
    )
    model = MM2SG(cfg)
    # init with all modalities present (point encoder params included)
    import jax.numpy as jnp

    b, v, s = 1, cfg.pooler.max_views, cfg.vision.image_size
    ids = jnp.full((b, 8), 3, jnp.int32).at[0, 2].set(-200)
    params = model.init(
        jax.random.PRNGKey(0),
        ids,
        jnp.ones((b, 8), jnp.int32),
        jnp.zeros((b, v, s, s, 3)),
        jnp.ones((b, v), jnp.int32),
        audio_embedding=jnp.zeros((b, cfg.pooler.audio_dim)),
        segmasks=jnp.zeros((b, cfg.pooler.num_segmask_tokens, 32, 32), jnp.int32),
        pc_points=jnp.zeros((b, cfg.ptv3.max_points, 6)),
        pc_valid=jnp.ones((b, cfg.ptv3.max_points), bool),
    )
    return SceneGraphPredictor(
        cfg=cfg, model=model, params=params, tokenizer=tokenizer, prompt_bucket=64
    )


def test_load_pcd_roundtrip(synthetic):
    ds = ORDataset(split="test", data_path=synthetic["data_path"],
                   mmor_root=synthetic["mmor_root"], or4d_root=synthetic["or4d_root"])
    item = next(ds[i] for i in range(len(ds)) if "MMOR" in ds.samples[i]["take_name"])
    pts = load_pcd(item["multimodal_data"]["pc"][0])
    assert pts.shape == (64, 6)
    assert pts[:, :3].max() < 3.0  # mm -> m scaling applied
    assert 0.0 <= pts[:, 3:].min() and pts[:, 3:].max() <= 1.0
    padded, valid = pad_pointcloud(pts, 128)
    assert padded.shape == (128, 6) and valid.sum() == 64


def test_validate_produces_report(synthetic, predictor):
    ds = ORDataset(split="test", data_path=synthetic["data_path"],
                   mmor_root=synthetic["mmor_root"], or4d_root=synthetic["or4d_root"])
    items = [ds[i] for i in range(len(ds))]
    report, raw = predictor.validate(items, batch_size=2)
    # untrained tiny model -> garbage text, but the full pipeline must hold up
    assert "relations" in report and "macro_f1" in report
    assert 0.0 <= report["macro_f1"] <= 1.0
    assert len(raw) == len(items)
    assert set(report["datatypes"]) <= {"MMOR", "4DOR"}


def test_temporal_pred_mode_builds_history(synthetic, predictor):
    ds = ORDataset(split="test", data_path=synthetic["data_path"],
                   mmor_root=synthetic["mmor_root"], or4d_root=synthetic["or4d_root"])
    items = [ds[i] for i in range(len(ds)) if "MMOR" in ds.samples[i]["take_name"]]
    predictor.temporality = "PRED"
    predictor.take_to_history.clear()
    report, _ = predictor.validate(items, batch_size=4)  # forced to 1 internally
    assert len(predictor.take_to_history) == 1
    history = next(iter(predictor.take_to_history.values()))
    assert len(history) == len(items)
    predictor.temporality = None
