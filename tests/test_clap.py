"""CLAP audio-embedding extraction: end-to-end with a tiny local ClapModel.

Mirrors `create_take_sample_audio_embeddings.py:13-60` without network
access: a ClapModel built from a small ClapConfig stands in for
``laion/larger_clap_general`` (the parity claim is the wiring — processor ->
get_audio_features -> artifact file — not the published weights).
"""

import wave
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_clap():
    from transformers import ClapAudioConfig, ClapConfig, ClapModel, ClapTextConfig

    cfg = ClapConfig(
        audio_config=ClapAudioConfig(
            window_size=4, spec_size=128, patch_size=4, patch_stride=(4, 4),
            patch_embeds_hidden_size=16, hidden_size=32, depths=[1, 1],
            num_attention_heads=[2, 2], num_mel_bins=64, projection_dim=20,
            enable_fusion=True,
        ).to_dict(),
        text_config=ClapTextConfig(
            hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=32, projection_dim=20,
        ).to_dict(),
        projection_dim=20,
    )
    torch.manual_seed(0)
    return ClapModel(cfg).eval()


@pytest.fixture(scope="module")
def tiny_processor():
    # audio-only processor stand-in: ClapProcessor requires a tokenizer
    # (network), but ClapEmbedder only exercises the audio front end
    from transformers import ClapFeatureExtractor

    feat = ClapFeatureExtractor(feature_size=64, sampling_rate=48000,
                                max_length_s=1, nb_max_frames=101)

    class _AudioOnly:
        def __call__(self, audios=None, return_tensors=None, sampling_rate=None):
            return feat(audios, return_tensors=return_tensors,
                        sampling_rate=sampling_rate)

    return _AudioOnly()


def _write_wav(path: Path, samples: np.ndarray, rate: int = 48000):
    pcm = np.clip(samples * 32767, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())


def test_clap_embedder_matches_direct_hf(tmp_path, tiny_clap, tiny_processor):
    from mmor_tpu.data.clap import ClapEmbedder

    t = np.arange(48000, dtype=np.float32) / 48000.0
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    wav = tmp_path / "000010.wav"
    _write_wav(wav, tone)

    emb = ClapEmbedder(model=tiny_clap, processor=tiny_processor)
    got = emb(wav)
    assert got.shape == (20,) and got.dtype == np.float32

    # direct HF call on the decoded samples (the reference's exact path)
    from mmor_tpu.data.clap import load_audio
    inputs = tiny_processor(audios=load_audio(wav), return_tensors="pt",
                            sampling_rate=48000)
    with torch.no_grad():
        ref = tiny_clap.get_audio_features(**inputs)[0].numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_export_audio_embeddings_end_to_end(tmp_path, tiny_clap, tiny_processor):
    from mmor_tpu.data.artifacts import export_audio_embeddings
    from mmor_tpu.data.clap import ClapEmbedder

    crop_dir = tmp_path / "crops"
    crop_dir.mkdir()
    rng = np.random.default_rng(0)
    for t in (10, 11):
        _write_wav(crop_dir / f"{t:06d}.wav", rng.normal(0, 0.1, 48000).astype(np.float32))

    out_dir = tmp_path / "embeddings"
    emb = ClapEmbedder(model=tiny_clap, processor=tiny_processor)
    export_audio_embeddings(crop_dir, out_dir, embed_fn=emb, pattern="*.wav")

    files = sorted(out_dir.glob("*.pt"))
    assert [f.name for f in files] == ["10.pt", "11.pt"]
    for f in files:
        vec = np.load(f)
        assert vec.shape == (20,) and np.isfinite(vec).all()


def test_load_audio_wav_resample(tmp_path):
    from mmor_tpu.data.clap import load_audio

    t = np.arange(16000, dtype=np.float32) / 16000.0
    _write_wav(tmp_path / "a.wav", 0.5 * np.sin(2 * np.pi * 100 * t), rate=16000)
    out = load_audio(tmp_path / "a.wav", sample_rate=48000)
    assert abs(len(out) - 48000) <= 3
