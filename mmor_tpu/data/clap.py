"""Concrete CLAP audio-embedding extraction (torch + transformers, offline).

The reference embeds each 1-second mp3 crop with HF ClapModel
``laion/larger_clap_general`` and saves a 512-d ``.pt`` per timepoint
(`create_take_sample_audio_embeddings.py:13-60`). This module provides the
same extraction as a plug-in for ``artifacts.export_audio_embeddings``:

- ``ClapEmbedder`` wraps any (model, processor) pair — the published
  checkpoint by name, or a locally-built tiny ClapModel in tests (zero
  egress);
- audio decode: WAV via the stdlib ``wave`` module, anything else through
  ``ffmpeg`` (the same dependency the reference's crop step already needs).

Embeddings are an offline artifact (as in the reference); the serving path
consumes them via data/preprocessing.load_audio_embedding.
"""

from __future__ import annotations

import shutil
import subprocess
import wave
from pathlib import Path

import numpy as np

CLAP_MODEL_NAME = "laion/larger_clap_general"
CLAP_SAMPLE_RATE = 48_000


def _read_wav(path: Path) -> tuple[np.ndarray, int]:
    with wave.open(str(path), "rb") as f:
        rate = f.getframerate()
        channels = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
    data = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if width == 1:
        data = data - 128.0
    if channels > 1:
        data = data.reshape(-1, channels).mean(axis=1)
    return data, rate


def load_audio(path: str | Path, sample_rate: int = CLAP_SAMPLE_RATE) -> np.ndarray:
    """Decode an audio file to mono float samples at ``sample_rate``.

    WAV decodes via the stdlib; other formats (mp3 crops from
    ``export_take_audio_crops``) go through ffmpeg, mirroring the
    reference's pydub/ffmpeg dependency.
    """
    path = Path(path)
    if path.suffix.lower() == ".wav":
        data, rate = _read_wav(path)
        if rate != sample_rate:
            # linear resample (1-second crops; quality is irrelevant to CLAP's
            # mel front end at these durations)
            n_out = int(round(len(data) * sample_rate / rate))
            data = np.interp(
                np.linspace(0.0, len(data) - 1.0, n_out),
                np.arange(len(data)), data,
            ).astype(np.float32)
        return data
    if shutil.which("ffmpeg") is None:
        raise RuntimeError(f"ffmpeg required to decode {path.suffix} audio")
    out = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", str(path), "-f", "s16le", "-ac", "1",
         "-ar", str(sample_rate), "-"],
        capture_output=True, check=True,
    )
    return np.frombuffer(out.stdout, dtype=np.int16).astype(np.float32)


class ClapEmbedder:
    """``embed(path) -> (proj_dim,) float32`` via ClapModel.get_audio_features.

    Pass ``model``/``processor`` to avoid network access (tests build tiny
    local ClapModel instances); otherwise loads ``model_name`` from the HF
    cache.
    """

    def __init__(self, model=None, processor=None,
                 model_name: str = CLAP_MODEL_NAME,
                 sample_rate: int = CLAP_SAMPLE_RATE):
        import torch  # local import: torch is an offline-artifact dependency

        self._torch = torch
        if model is None:
            from transformers import ClapModel

            model = ClapModel.from_pretrained(model_name)
        if processor is None:
            from transformers import ClapProcessor

            processor = ClapProcessor.from_pretrained(model_name)
        self.model = model.eval()
        self.processor = processor
        self.sample_rate = sample_rate

    def embed_samples(self, samples: np.ndarray) -> np.ndarray:
        inputs = self.processor(
            audios=np.asarray(samples, dtype=np.float32),
            return_tensors="pt", sampling_rate=self.sample_rate,
        )
        with self._torch.no_grad():
            feats = self.model.get_audio_features(**inputs)[0]
        return feats.cpu().numpy().astype(np.float32)

    def __call__(self, path: str | Path) -> np.ndarray:
        return self.embed_samples(load_audio(path, self.sample_rate))
