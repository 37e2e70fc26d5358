"""ORDataset path resolution + similar-sample matching on a synthetic tree."""

import json

import pytest

from mmor_tpu.data.or_dataset import ORDataset
from mmor_tpu.data.synthetic import build_synthetic_dataset


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return build_synthetic_dataset(root, n_frames=4)


def _dataset(synthetic, split="test", **kw):
    return ORDataset(
        split=split,
        data_path=synthetic["data_path"],
        mmor_root=synthetic["mmor_root"],
        or4d_root=synthetic["or4d_root"],
        **kw,
    )


def test_loads_samples_both_datasets(synthetic):
    ds = _dataset(synthetic)
    assert len(ds) == 8
    takes = {s["take_name"] for s in ds.samples}
    assert takes == {"001_PKA_MMOR", "001_4DOR"}


def test_mmor_multimodal_paths(synthetic):
    ds = _dataset(synthetic)
    item = next(ds[i] for i in range(len(ds))
                if "MMOR" in ds.samples[i]["take_name"])
    md = item["multimodal_data"]
    assert len(md["azure"]) == 5
    assert len(md["simstation"]) == 4
    assert len(md["trackercam"]) == 1
    assert len(md["pc"]) == 1
    assert "audio" in md and "speech_transcript" in md
    assert "robot_metadata" in md
    assert "tracker" in md and "unique_id_dicts" in md["tracker"][0]
    assert "segmasks" not in md  # reference quirk: not loaded by default
    for p in md["azure"] + md["simstation"] + md["trackercam"] + md["pc"]:
        assert p.exists()


def test_4dor_multimodal_paths(synthetic):
    ds = _dataset(synthetic)
    item = next(ds[i] for i in range(len(ds))
                if "4DOR" in ds.samples[i]["take_name"])
    md = item["multimodal_data"]
    assert len(md["azure"]) == 6
    assert "simstation" not in md  # MM-OR only
    assert "audio" not in md
    assert len(md["pc"]) == 1


def test_filtering_by_dataset(synthetic):
    only_mmor = _dataset(synthetic, load_4dor=False)
    assert all("MMOR" in s["take_name"] for s in only_mmor.samples)
    only_4dor = _dataset(synthetic, load_mmor=False)
    assert all("4DOR" in s["take_name"] for s in only_4dor.samples)


def test_similar_samples_attached_for_train(synthetic):
    ds = _dataset(synthetic, split="train")
    assert all("similar_samples" in s for s in ds.samples)
    for s in ds.samples:
        own_type = "4DOR" if "4DOR" in s["take_name"] else "MMOR"
        for ref in s["similar_samples"]:
            other = ds.samples[ref["sample_idx"]]
            other_type = "4DOR" if "4DOR" in other["take_name"] else "MMOR"
            assert other_type == own_type
    # cache file written next to annotations
    assert (synthetic["data_path"] / "sample_to_similar_samples_train.json").exists()


def test_similar_samples_share_distinctive_predicates(synthetic):
    ds = _dataset(synthetic, split="train")
    cache = json.loads(
        (synthetic["data_path"] / "sample_to_similar_samples_train.json").read_text()
    )
    sid_to_sample = {f'{s["take_name"]}_{s["frame_id"]}': s for s in ds.samples}
    for sid, sims in cache.items():
        preds = {p for _s, _o, p in sid_to_sample[sid]["relationships"]}
        for osid in sims:
            opreds = {p for _s, _o, p in sid_to_sample[osid]["relationships"]}
            # the tiers share at least the most-distinctive intersection
            most = {"calibrating", "cementing", "cleaning", "cutting", "drilling",
                    "hammering", "sawing", "scanning", "suturing"}
            assert (preds & most) == (opreds & most)
