"""Downstream tasks over predicted scene graphs: next action / robot phase /
sterility breach.

Equivalent of the reference downstream stack
(`scene_graph_helpers/model/downstream_prediction_model.py:43-360`,
`llava_helpers/generate_downstream_dataset_format_for_llava.py:19-198`,
`scene_graph_prediction/main_downstream.py`): text-only prompting — the
take's memory string plus the current predicted scene graph — classified into
fixed label spaces; metalabels come from per-take
``take_timestamp_to_{task}`` JSONs; training-sample generation undersamples
empty sterility-breach labels (keep probability 0.01, `:124`).
"""

from __future__ import annotations

import json
import random
from collections import defaultdict
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.config import LlamaConfig
from mmor_tpu.data.llava_json import scene_graph_to_string
from mmor_tpu.eval.sg_eval import classification_metrics
from mmor_tpu.models.llama import LlamaModel, build_cache, greedy_decode
from mmor_tpu.sg.converters import change_log_to_memory_str, sg_history_to_change_log
from mmor_tpu.sg.prompts import VicunaConversation, left_pad_batch

NEXT_ACTIONS = ("bring in", "prepare", "clean", "cut", "drill", "saw", "hammer",
                "cement", "suture", "scan", "bring out", "none")
ROBOT_PHASES = ("turn on", "initial calibration by mps",
                "dressing the robot, to make it sterile", "install the saw by nurse",
                "install base array by nurse", "install calibration array",
                "calibrate the robot by nurse", "remove calibration array",
                "install actual saw tip")
STERILITY_BREACHES = ("no", "yes")

TASK_CLASSES = {
    "next_action": NEXT_ACTIONS,
    "robot_phase": ROBOT_PHASES,
    "sterility_breach": STERILITY_BREACHES,
}

TASK_PROMPTS = {
    "next_action": ("Given the following scene graph memory representation, predict "
                    "the next action. Do not provide a narrative or descriptive text."),
    "robot_phase": ("Given the following scene graph memory representation, predict "
                    "the robot phase. Do not provide a narrative or descriptive text."),
    "sterility_breach": ("Given the following scene graph memory representation, "
                         "predict the sterility breach. Do not provide a narrative "
                         "or descriptive text."),
}


def build_downstream_prompt(task: str, memory_str: str, current_sg: str) -> str:
    """Memory + current SG + task instruction in the vicuna template
    (downstream_prediction_model.py:118-144)."""
    context = f"<memory_start>: {memory_str}<memory_end>. {current_sg}."
    conv = VicunaConversation()
    conv.append(conv.roles[0], f"{context} {TASK_PROMPTS[task]}")
    conv.append(conv.roles[1], None)
    return conv.prompt()


def prepare_take_histories(scene_graphs: list[dict]):
    """Predicted scene-graph dumps -> per-take change logs + per-frame graphs.

    ``scene_graphs``: [{take_name, timepoint_idx, scene_graph: [triplets]}].
    """
    take_to_log = {}
    take_to_full = {}
    takes = {sg["take_name"].rsplit("_", 1)[0] for sg in scene_graphs}
    for take in takes:
        items = [s for s in scene_graphs
                 if s["take_name"].rsplit("_", 1)[0] == take]
        items = list({s["timepoint_idx"]: s for s in items}.values())
        items.sort(key=lambda s: s["timepoint_idx"])
        take_to_log[take] = sg_history_to_change_log(
            items, irrelevant_preds=["closeto", "closeTo"]
        )
        take_to_full[take] = {int(s["timepoint_idx"]): s["scene_graph"] for s in items}
    return take_to_log, take_to_full


def classify_output(task: str, text: str) -> int:
    """Map generated text onto the label space; unknown -> last class
    ('none' / final phase / 'no')-adjacent failure handling."""
    classes = TASK_CLASSES[task]
    norm = text.strip().strip(".").lower()
    for i, c in enumerate(classes):
        if norm == c:
            return i
    for i, c in enumerate(classes):  # prefix / containment fallback
        if norm.startswith(c) or c in norm:
            return i
    return len(classes) - 1


@dataclass
class DownstreamPredictor:
    """Text-only greedy decoding on the (LoRA-tuned) language model."""

    cfg: LlamaConfig
    model: LlamaModel
    params: dict
    tokenizer: object
    task: str = "next_action"
    max_new_tokens: int = 32
    prompt_bucket: int = 256

    def __post_init__(self):
        assert self.task in TASK_CLASSES

        def run(params, ids, mask):
            logits, kv = self.model.apply(
                params, input_ids=ids, attention_mask=mask, last_logit_only=True
            )
            need = ids.shape[1] + self.max_new_tokens
            cache = build_cache(self.cfg, kv, mask, -(-need // 128) * 128)
            return greedy_decode(
                self.model, params, logits, cache, self.max_new_tokens,
                eos_token_id=self.tokenizer.eos_token_id,
            )

        self._run = jax.jit(run)

    def predict(self, prompts: list[str]) -> list[str]:
        id_lists = [self.tokenizer.encode(p) for p in prompts]
        bucket = self.prompt_bucket
        longest = max(len(i) for i in id_lists)
        while bucket < longest:
            bucket *= 2
        ids, mask = left_pad_batch(id_lists, self.tokenizer.pad_token_id, bucket)
        tokens = np.asarray(self._run(self.params, jnp.asarray(ids), jnp.asarray(mask)))
        eos = self.tokenizer.eos_token_id
        outs = []
        for row in tokens:
            row = list(row)
            if eos in row:
                row = row[: row.index(eos)]
            outs.append(self.tokenizer.decode(row).strip())
        return outs

    def validate(
        self,
        scene_graphs: list[dict],
        metalabels: dict[str, dict[str, str]],  # take -> {timestamp: label}
        batch_size: int = 8,
    ) -> dict:
        """Classification report per take + global (4D-OR takes are skipped:
        downstream metalabels exist only for MM-OR)."""
        take_to_log, take_to_full = prepare_take_histories(scene_graphs)
        take_preds: dict[str, list[int]] = defaultdict(list)
        take_gts: dict[str, list[int]] = defaultdict(list)

        pending: list[tuple[str, int, str]] = []

        def flush():
            if not pending:
                return
            outputs = self.predict([p for _, _, p in pending])
            for (take, gt, _), text in zip(pending, outputs):
                take_preds[take].append(classify_output(self.task, text))
                take_gts[take].append(gt)
            pending.clear()

        for sg in scene_graphs:
            take = sg["take_name"].rsplit("_", 1)[0]
            if "4DOR" in sg["take_name"]:
                continue
            if self.task == "robot_phase" and "004_PKA" in take:
                continue  # robot pre-prepared in this take (reference `:224`)
            timepoint = int(sg["timepoint_idx"])
            labels = metalabels.get(take, {})
            label = labels.get(str(timepoint))
            if label is None:
                continue
            gt = TASK_CLASSES[self.task].index(label) if label in TASK_CLASSES[self.task] else -1
            log = [e for e in take_to_log[take] if e[0] < timepoint]
            memory = change_log_to_memory_str(log, timepoint, style="longshort")
            current = scene_graph_to_string(
                [[s, o, p] for s, p, o in take_to_full[take][timepoint]]
            )
            pending.append((take, gt, build_downstream_prompt(self.task, memory, current)))
            if len(pending) == batch_size:
                flush()
        flush()

        all_preds = [p for v in take_preds.values() for p in v]
        all_gts = [g for v in take_gts.values() for g in v]
        n_classes = len(TASK_CLASSES[self.task])
        return {
            "takes": {
                t: classification_metrics(take_gts[t], take_preds[t], n_classes)
                for t in take_preds
            },
            "overall": classification_metrics(all_gts, all_preds, n_classes),
        }


def generate_downstream_samples(
    scene_graphs: list[dict],
    metalabel_roots: dict[str, Path],
    rng: random.Random | None = None,
    keep_empty_sterility_prob: float = 0.01,
) -> list[dict]:
    """Training conversations for the 3 downstream tasks from GT scene graphs
    + per-take metalabel JSONs (generate_downstream_dataset_format_for_llava.py)."""
    rng = rng or random.Random()
    take_to_log, take_to_full = prepare_take_histories(scene_graphs)
    samples = []
    label_cache: dict[tuple[str, str], dict] = {}

    def labels_for(task: str, take: str) -> dict:
        key = (task, take)
        if key not in label_cache:
            path = metalabel_roots[task] / f"{take}.json"
            label_cache[key] = json.loads(path.read_text()) if path.exists() else {}
        return label_cache[key]

    for sg in scene_graphs:
        take = sg["take_name"].rsplit("_", 1)[0]
        if "4DOR" in sg["take_name"]:
            continue
        timepoint = int(sg["timepoint_idx"])
        log = [e for e in take_to_log[take] if e[0] < timepoint]
        memory = change_log_to_memory_str(log, timepoint, style="longshort")
        current = scene_graph_to_string(
            [[s, o, p] for s, p, o in take_to_full[take][timepoint]]
        )
        for task in TASK_CLASSES:
            label = labels_for(task, take).get(str(timepoint))
            if label is None:
                continue
            if (task == "sterility_breach" and label == "no"
                    and rng.random() >= keep_empty_sterility_prob):
                continue
            prompt = build_downstream_prompt(task, memory, current)
            # the conversation format stores the open prompt + answer turns
            samples.append({
                "id": f"{take}_{timepoint}_{task}",
                "timepoint": timepoint,
                "task": task,
                "conversations": [
                    {"from": "human",
                     "value": f"<memory_start>: {memory}<memory_end>. {current}. "
                              f"{TASK_PROMPTS[task]}"},
                    {"from": "gpt", "value": label},
                ],
            })
    return samples
