"""Raw relationship-labeling exports -> scene-graph annotation JSONs.

Equivalent of the reference
``convert_relationship_labeling_to_scene_graph_format.py``:

- per-frame ``rel_annotations`` normalize names (human roles via
  ``human_name_annotations`` with circulator default, ot/ae/anest aliases,
  lowercase/underscore, ``operating`` -> ``manipulating``);
- rule-based inference adds the implicit structure: patient lyingOn
  operating_table, ``<actor> holding instrument`` for tool predicates, and
  closeTo(operating_table) for anything interacting with the patient
  (`:23-56`);
- humans 7/8 are dropped; take 007_TKA subsamples every 3rd frame.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable

TOOL_PREDICATES = {"cutting", "drilling", "sawing", "suturing", "hammering",
                   "cementing", "cleaning"}

_MMOR_ALIASES = {"ot": "operating_table", "ae": "anesthesia_equipment",
                 "anest": "anaesthetist"}


def filter_rels(rels, sub=None, obj=None, pred=None):
    return [
        (s, o, p) for s, o, p in rels
        if (sub is None or s == sub)
        and (obj is None or o == obj)
        and (pred is None or p == pred)
    ]


def infer_lyingon(objects: set, rels: set) -> None:
    if "patient" in objects or "operating_table" in objects:
        objects.update(("patient", "operating_table"))
        rels.add(("patient", "operating_table", "lyingOn"))


def infer_holding_instrument(objects: set, rels: set) -> None:
    new = set()
    for sub, _obj, pred in rels:
        if pred in TOOL_PREDICATES:
            objects.add("instrument")
            new.add((sub, "instrument", "holding"))
    rels.update(new)


def infer_operating_table_rels(objects: set, rels: set) -> None:
    new = set()
    for s in objects:
        if s == "operating_table":
            continue
        touches_patient = filter_rels(rels, sub=s, obj="patient") or filter_rels(
            rels, sub="patient", obj=s
        )
        if touches_patient and not filter_rels(rels, sub=s, obj="operating_table"):
            new.add((s, "operating_table", "closeTo"))
    rels.update(new)


def _normalize(name: str) -> str:
    return name.lower().replace("-", "_")


def _normalize_pred(pred: str) -> str:
    pred = pred[0].lower() + pred[1:]
    return "manipulating" if pred == "operating" else pred


def convert_4dor_frame(info_json: dict) -> tuple[set, set]:
    """One 4D-OR relation_labels JSON -> (objects, relationships)."""
    humans = {k: v for k, v in info_json["human_name_annotations"].items()
              if v != "none"}
    objects: set = set()
    rels: set = set()
    for entry in info_json["rel_annotations"]:
        sub, pred, obj = entry[0], entry[1], entry[2]
        if sub in ("human_7", "human_8") or obj in ("human_7", "human_8"):
            continue
        if "human_" in sub:
            sub = humans.get(sub, "circulator").replace("circulating-nurse", "circulator")
        if "human_" in obj:
            obj = humans.get(obj, "circulator").replace("circulating-nurse", "circulator")
        sub, obj = _normalize(sub), _normalize(obj)
        pred = _normalize_pred(pred)
        objects.update((sub, obj))
        rels.add((sub, obj, pred))
    infer_lyingon(objects, rels)
    infer_operating_table_rels(objects, rels)
    infer_holding_instrument(objects, rels)
    objects.add("instrument")
    return objects, rels


def convert_mmor_frame(info_json: dict) -> tuple[set, set]:
    """One MM-OR relation_labels JSON -> (objects, relationships)."""
    objects: set = set()
    rels: set = set()
    for sub, pred, obj in info_json["rel_annotations"]:
        sub = _MMOR_ALIASES.get(_normalize(sub), _normalize(sub))
        obj = _MMOR_ALIASES.get(_normalize(obj), _normalize(obj))
        pred = _normalize_pred(pred)
        objects.update((sub, obj))
        rels.add((sub, obj, pred))
    infer_lyingon(objects, rels)
    infer_operating_table_rels(objects, rels)
    return objects, rels


def check_unique_relation(rels: Iterable) -> None:
    seen = set()
    for sub, obj, _pred in rels:
        assert (sub, obj) not in seen, f"multiple relations between {sub} and {obj}"
        seen.add((sub, obj))


def convert_take(
    relations_dir: str | Path,
    take_name: str,
    is_4dor: bool,
    sample_every: int = 1,
) -> list[dict]:
    """All frames of one take -> annotation samples sorted by file name.

    ``sample_every=3`` reproduces the 007_TKA density subsampling."""
    samples = []
    paths = sorted(Path(relations_dir).glob("*.json"))
    for j, path in enumerate(paths):
        if j % sample_every != 0:
            continue
        info = json.loads(path.read_text())
        objects, rels = (convert_4dor_frame(info) if is_4dor
                         else convert_mmor_frame(info))
        check_unique_relation(rels)
        samples.append({
            "take_name": take_name,
            "frame_id": path.stem,
            "relationships": sorted(rels),
        })
    return samples
