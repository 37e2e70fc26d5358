"""Checkpointing: orbax-backed save/restore with the reference's artifact split.

Mirrors the reference's checkpoint layout semantics (SURVEY.md §5):
- SGG: per-step ``checkpoint-{N}`` directories holding the LoRA adapter and
  ``non_lora_trainables`` (pooler/projector/tuned-tower weights) separately
  (`train.py:1284-1297`), with auto-resume from the latest checkpoint
  (`train.py:1338-1341`) and curriculum init from a previous run's directory
  (`load_model_weights`, `train.py:1053-1085`);
- panoptic: periodic full-state checkpoints with staged hand-off (the next
  stage loads the previous stage's weights).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_pytree(path: str | Path, tree: Any) -> None:
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def restore_pytree(path: str | Path, like: Any | None = None) -> Any:
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, args=ocp.args.PyTreeRestore(like))
        return ckptr.restore(path)


def save_train_checkpoint(
    run_dir: str | Path,
    step: int,
    *,
    lora_params: Any | None = None,
    non_lora_trainables: Any | None = None,
    full_state: Any | None = None,
) -> Path:
    """Write ``checkpoint-{step}`` with adapter / non-LoRA / full-state parts."""
    ckpt_dir = Path(run_dir) / f"checkpoint-{step}"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    if lora_params is not None:
        save_pytree(ckpt_dir / "lora", lora_params)
    if non_lora_trainables is not None:
        save_pytree(ckpt_dir / "non_lora_trainables", non_lora_trainables)
    if full_state is not None:
        save_pytree(ckpt_dir / "state", full_state)
    return ckpt_dir


def latest_checkpoint(run_dir: str | Path) -> Path | None:
    """The highest-numbered ``checkpoint-*`` dir, for auto-resume."""
    run_dir = Path(run_dir)
    if not run_dir.exists():
        return None
    best, best_step = None, -1
    for p in run_dir.glob("checkpoint-*"):
        m = re.fullmatch(r"checkpoint-(\d+)", p.name)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best


def load_train_checkpoint(
    ckpt_dir: str | Path,
    *,
    lora_like: Any | None = None,
    non_lora_like: Any | None = None,
    full_like: Any | None = None,
) -> dict[str, Any]:
    ckpt_dir = Path(ckpt_dir)
    out: dict[str, Any] = {"step": int(ckpt_dir.name.split("-")[-1])}
    if (ckpt_dir / "lora").exists():
        out["lora"] = restore_pytree(ckpt_dir / "lora", lora_like)
    if (ckpt_dir / "non_lora_trainables").exists():
        out["non_lora_trainables"] = restore_pytree(
            ckpt_dir / "non_lora_trainables", non_lora_like
        )
    if (ckpt_dir / "state").exists():
        out["state"] = restore_pytree(ckpt_dir / "state", full_like)
    return out
