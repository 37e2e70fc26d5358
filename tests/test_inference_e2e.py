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


def test_pointcloud_reaches_generation(synthetic, predictor):
    """The serving path must thread pc_points/pc_valid into generate():
    the round-1 bug dropped them, so the PC modality was silently ignored
    (ADVICE high #2). Logits for a batch with a real cloud must differ from
    the same batch with the cloud removed."""
    ds = ORDataset(split="test", data_path=synthetic["data_path"],
                   mmor_root=synthetic["mmor_root"], or4d_root=synthetic["or4d_root"])
    item = next(ds[i] for i in range(len(ds))
                if "MMOR" in ds.samples[i]["take_name"])
    assert item["multimodal_data"].get("pc"), "synthetic MMOR item must carry a pc"
    batch = predictor.build_batch([item])
    assert "pc_points" in batch and "pc_valid" in batch
    import jax.numpy as jnp

    with_pc = np.asarray(predictor._generate(predictor.params, batch))
    nul = dict(batch)
    nul["pc_points"] = jnp.zeros_like(batch["pc_points"])
    nul["pc_valid"] = jnp.zeros_like(batch["pc_valid"])
    without_pc = np.asarray(predictor._generate(predictor.params, nul))
    # compare prefill logits instead of argmax tokens (argmax can coincide)
    from mmor_tpu.models import mm2sg as mm

    if "images" in batch:
        images = batch["images"]
    else:  # fused path ships raw uint8 views
        from mmor_tpu.ops.image_preproc import preprocess_views

        images = jnp.stack(
            [preprocess_views(rv, predictor.cfg.vision.image_size)
             for rv in batch["raw_views"]], axis=1)
    batch = {**batch, "images": images}
    l1, _, _ = predictor.model.apply(
        predictor.params, batch["input_ids"], batch["attention_mask"],
        batch["images"], batch["view_mask"],
        audio_embedding=batch.get("audio_embedding"),
        pc_points=batch["pc_points"], pc_valid=batch["pc_valid"],
        last_logit_only=True,
    )
    l0, _, _ = predictor.model.apply(
        predictor.params, batch["input_ids"], batch["attention_mask"],
        batch["images"], batch["view_mask"],
        audio_embedding=batch.get("audio_embedding"),
        pc_points=nul["pc_points"], pc_valid=nul["pc_valid"],
        last_logit_only=True,
    )
    assert float(jnp.max(jnp.abs(l1 - l0))) > 1e-6, (
        "point cloud does not influence generation"
    )
    assert with_pc.shape == without_pc.shape


def test_memory_string_clamped_to_5000_chars(predictor):
    """Quirk parity: memory strings clamp to '...' + last 5000 chars
    (scene_graph_prediction_model.py:192-194)."""
    predictor.temporality = "PRED"
    predictor.take_to_history.clear()
    history = predictor.take_to_history["999_MMOR"]
    for t in range(400):
        history.append({
            "timepoint_idx": t,
            "scene_graph": [[f"instrument_{t:04d}", "patient", "touching"]],
        })
    item = {
        "sample": {"take_name": "999_MMOR", "frame_id": "400",
                   "relationships": []},
        "multimodal_data": {},
    }
    prompt = predictor._prompt_for(item)
    start = prompt.index("<memory_start>")
    end = prompt.index("<memory_end>")
    mem = prompt[start + len("<memory_start>: "):end]
    assert len(mem) <= 5003  # '...' + 5000
    assert mem.startswith("...")
    predictor.temporality = None
    predictor.take_to_history.clear()


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
