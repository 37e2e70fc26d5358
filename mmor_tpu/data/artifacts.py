"""Offline artifact generators: segmask tokens, transcripts, audio crops/embeddings.

TPU-framework equivalents of the reference's ``create_take_sample_*`` scripts:

- segmasks: class-priority-preserving 32x32 downsample of GT or predicted
  masks, written as ``{timestamp}_{i}_GT{bool}.png``
  (`create_take_sample_segmasks.py:12-231` — rare classes win pooling ties);
- transcripts: per timepoint, the last 4 SRT subtitles ending before it,
  truncated to the final 200 chars (`create_take_sample_speech_transcripts.py`);
  the SRT parser is dependency-free (pysrt replacement);
- audio: 1-second mp3 crops via ffmpeg when available
  (`create_take_sample_audios.py`); CLAP embeddings stay offline artifacts
  (the model class is pluggable — `create_take_sample_audio_embeddings.py`
  uses laion/larger_clap_general).
"""

from __future__ import annotations

import json
import re
import shutil
import subprocess
from dataclasses import dataclass
from pathlib import Path

import numpy as np
from PIL import Image

from mmor_tpu.data.panoptic import TRACK_TO_METAINFO


def downsample_mask_preserve_classes(mask: np.ndarray, output_res: int = 32) -> np.ndarray:
    """Max-pool each class's binary mask, then pick the rarest present class
    per output cell (create_take_sample_segmasks.py:47-81)."""
    h, w = mask.shape
    scale_h, scale_w = h // output_res, w // output_res
    mask = mask[: output_res * scale_h, : output_res * scale_w]
    num_classes = int(mask.max()) + 1
    freqs = np.bincount(mask.reshape(-1), minlength=num_classes)
    priorities = 1.0 / (freqs + 1e-6)

    pooled = np.zeros((output_res, output_res, num_classes), dtype=np.uint8)
    for c in range(num_classes):
        binary = (mask == c).astype(np.uint8)
        pooled[:, :, c] = binary.reshape(
            output_res, scale_h, output_res, scale_w
        ).max(axis=(1, 3))
    scores = pooled * priorities[None, None, :]
    return np.argmax(scores, axis=2).astype(np.uint8)


def color_mask_to_labels(colored: np.ndarray) -> np.ndarray:
    """Predicted RGB mask dump -> raw label map via the class color table
    (create_take_sample_segmasks.py:144-150)."""
    labels = np.zeros(colored.shape[:2], dtype=np.uint8)
    for _name, info in TRACK_TO_METAINFO.items():
        match = (colored == np.asarray(info["color"], np.uint8)).all(axis=2)
        labels[match] = info["label"]
    return labels


def export_segmask_artifact(
    label_mask: np.ndarray,
    out_dir: Path,
    timestamp: int,
    view_index: int,
    use_gt: bool,
    output_res: int = 32,
) -> Path:
    """Write one downsampled segmask artifact with the reference naming."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    small = downsample_mask_preserve_classes(label_mask, output_res)
    path = out_dir / f"{timestamp}_{view_index}_GT{use_gt}.png"
    Image.fromarray(small).save(path)
    return path


# --------------------------------------------------------------------- #
# transcripts
# --------------------------------------------------------------------- #

@dataclass
class Subtitle:
    start: float  # seconds
    end: float
    text: str


_SRT_TIME = re.compile(r"(\d+):(\d+):(\d+)[,.](\d+)")


def _parse_time(s: str) -> float:
    h, m, sec, ms = _SRT_TIME.match(s.strip()).groups()
    return int(h) * 3600 + int(m) * 60 + int(sec) + int(ms) / 1000.0


def parse_srt(text: str) -> list[Subtitle]:
    """Minimal SRT parser (pysrt replacement)."""
    subs = []
    for block in re.split(r"\n\s*\n", text.strip()):
        lines = [l for l in block.splitlines() if l.strip()]
        if len(lines) < 2:
            continue
        time_line = next((l for l in lines if "-->" in l), None)
        if time_line is None:
            continue
        start_s, end_s = [p.strip() for p in time_line.split("-->")]
        body = lines[lines.index(time_line) + 1:]
        subs.append(Subtitle(_parse_time(start_s), _parse_time(end_s), " ".join(body)))
    return subs


def transcript_for_timepoint(subs: list[Subtitle], timepoint_seconds: int) -> str:
    """Last 4 subtitles ending at/before the timepoint, last 200 chars
    (create_take_sample_speech_transcripts.py:11-28)."""
    before = [s for s in subs if s.end <= timepoint_seconds]
    return " ".join(s.text for s in before[-4:])[-200:]


def export_take_transcripts(
    srt_path: Path, timestamps: list[int], out_dir: Path
) -> None:
    subs = parse_srt(Path(srt_path).read_text())
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for t in timestamps:
        (out_dir / f"{t}.json").write_text(
            json.dumps({"text": transcript_for_timepoint(subs, t)})
        )


# --------------------------------------------------------------------- #
# audio
# --------------------------------------------------------------------- #

def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def export_take_audio_crops(
    take_audio: Path, timestamps: list[int], out_dir: Path, n_seconds: int = 1
) -> None:
    """1-second mp3 crops per timepoint (timestamps are 1 fps == seconds,
    create_take_sample_audios.py:11-41). Requires ffmpeg on PATH."""
    if not ffmpeg_available():
        raise RuntimeError("ffmpeg not found on PATH; audio crops unavailable")
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for t in timestamps:
        begin = max(0, t - n_seconds)
        subprocess.run(
            ["ffmpeg", "-y", "-i", str(take_audio), "-ss", str(begin),
             "-t", str(t - begin + 1), "-c:a", "copy",
             str(out_dir / f"{str(t).zfill(6)}.mp3")],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, check=False,
        )


def export_audio_embeddings(
    crop_dir: Path, out_dir: Path, embed_fn=None, pattern: str = "*.mp3"
) -> None:
    """CLAP 512-d embedding per crop. ``embed_fn(path) -> np.ndarray`` is the
    embedder — ``data.clap.ClapEmbedder`` is the concrete HF ClapModel path
    matching the reference ('laion/larger_clap_general',
    create_take_sample_audio_embeddings.py:13-60); artifacts are raw numpy
    blobs saved under the reference's ``.pt`` name."""
    if embed_fn is None:
        from mmor_tpu.data.clap import ClapEmbedder

        embed_fn = ClapEmbedder()
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for crop in sorted(Path(crop_dir).glob(pattern)):
        emb = np.asarray(embed_fn(crop), dtype=np.float32).reshape(-1)
        with open(out_dir / f"{crop.stem.lstrip('0') or '0'}.pt", "wb") as f:
            np.save(f, emb)
