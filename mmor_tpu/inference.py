"""MM2SG inference engine: ORDataset items -> prompts -> batched generate -> F1.

Equivalent of the reference ``ModelWrapper``
(`scene_graph_helpers/model/scene_graph_prediction_model.py:25-399`):

- image slot logic: 4D-OR uses azure cams (2,1,3,5); MM-OR prefers 5 azure
  cams (1,4,5,2,3), falls back to simstation (2,0,3), then black frames; plus
  the robot screen (simstation cam 1) and the trackercam (`forward:78-114`);
- robot / tracker / transcript metadata injected as text; optional temporal
  memory from the take's own predictions (temporality == 'PRED');
- prompts are tokenized with the image sentinel, left-padded to a static
  bucket, and decoded greedily with the jitted KV-cache path;
- outputs parse into triplets and accumulate into the SceneGraphEvaluator.

The tokenizer is pluggable (any HF-style tokenizer with encode/decode); a
dependency-free ByteTokenizer serves tests and smoke runs.
"""

from __future__ import annotations

import json
from collections import defaultdict
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.config import MM2SGConfig
from mmor_tpu.data import preprocessing as pp
from mmor_tpu.data.configurations import TRACKER_OBJECT_MAP
from mmor_tpu.eval.sg_eval import SceneGraphEvaluator
from mmor_tpu.models.mm2sg import MM2SG, generate
from mmor_tpu.sg.converters import sg_history_to_change_log, change_log_to_memory_str
from mmor_tpu.sg.prompts import (
    IMAGE_TOKEN_INDEX,
    build_sg_prompt,
    format_robot_metadata,
    format_tracker_metadata,
    left_pad_batch,
    tokenize_with_image_token,
)


class ByteTokenizer:
    """UTF-8 byte fallback tokenizer: ids = byte + 3; 0/1/2 = pad/bos/eos."""

    pad_token_id = 0
    bos_token_id = 1
    eos_token_id = 2
    vocab_size = 259

    def encode(self, text: str) -> list[int]:
        return [self.bos_token_id] + [b + 3 for b in text.encode("utf-8")]

    def decode(self, ids) -> str:
        data = bytes(i - 3 for i in ids if i >= 3)
        return data.decode("utf-8", errors="replace")


@dataclass
class SceneGraphPredictor:
    cfg: MM2SGConfig
    model: MM2SG
    params: dict
    tokenizer: object
    cameras_mmor: tuple[int, ...] = (1, 4, 5, 2, 3)  # configs/mmor.json
    cameras_4dor: tuple[int, ...] = (2, 1, 3, 5)
    temporality: str | None = None  # None | 'PRED'
    prompt_bucket: int = 128
    # ship raw uint8 frames to the device and fuse pad/resize/normalize into
    # the jit'd generate graph (BASELINE fused-preprocessing; False = legacy
    # host-side PIL path)
    fused_preproc: bool = True
    take_to_history: dict = field(default_factory=lambda: defaultdict(list))

    def __post_init__(self):
        # stepwise serving engine: jitted prefill per (batch, cache-bucket)
        # plus one donated-cache decode step; packed cache buffers recycle
        # between generations of the same shape (models/mm2sg.py)
        from mmor_tpu.models.llama import LlamaModel, make_decode_step

        self._prefills: dict = {}
        self._buffers: dict = {}
        if self.cfg.llama.mega_decode:
            from mmor_tpu.ops.mega_decode import MegaServer

            lm_params = {"params": self.params["params"]["language_model"]}
            self._step = MegaServer(self.cfg.llama, lm_params)
        else:
            self._step = make_decode_step(LlamaModel(self.cfg.llama))

    def _cache_len_for(self, prompt_len: int) -> int:
        need = (prompt_len + self.cfg.num_multimodal_tokens - 1
                + self.cfg.max_new_tokens)
        # 16-granular capacity: the attention kernels take full-T blocks so
        # lane tiling doesn't force 128 multiples; the old 128-rounding
        # (1008 -> 1024) alone cost ~110 MB of cache at b24 — the measured
        # b26 near-miss (commit a3bb013 / VERDICT round-2 weak #3).
        # Megakernel attention reshapes (rg, T) int8 (Mosaic: T % 128 only).
        # int4-KV mega: T-halved nibble attention slices at T/2, which must
        # itself be lane-tiled (T % 256) — t_cap=896 (half 448) hits a
        # Mosaic "unsupported shape cast" on the w8 half-slices
        if self.cfg.llama.mega_decode:
            granule = 256 if self.cfg.llama.kv_bits == 4 else 128
        else:
            granule = 16
        return -(-need // granule) * granule

    def _generate(self, params, batch):
        from mmor_tpu.models.mm2sg import generate_stepwise, make_prefill

        b = batch["input_ids"].shape[0]
        pad = (-b) % 8 if self.cfg.llama.mega_decode else 0
        if pad:
            # the megakernel walks 8-aligned sublane batch row-groups, so a
            # ragged final chunk (dataset size % batch_size) must pad up;
            # repeated first rows keep values in-distribution and the
            # outputs slice back to the real batch below
            batch = jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], 0)
                if hasattr(a, "shape") and a.ndim >= 1 and a.shape[0] == b
                else a,
                batch)
        cache_len = self._cache_len_for(batch["input_ids"].shape[1])
        key = (batch["input_ids"].shape[0], cache_len)
        if key not in self._prefills:
            self._prefills[key] = make_prefill(self.model,
                                               max_cache_len=cache_len)
        tokens, bufs = generate_stepwise(
            self.model, params, batch,
            max_cache_len=cache_len,
            max_new_tokens=self.cfg.max_new_tokens,
            eos_token_id=self.tokenizer.eos_token_id,
            prefill_fn=self._prefills[key],
            step_fn=self._step,
            cache_buffers=self._buffers.pop(key, None),
        )
        if bufs is not None:
            self._buffers[key] = bufs
        return tokens[:b] if pad else tokens

    # ---------------------------------------------------------------- #
    # batch assembly
    # ---------------------------------------------------------------- #

    def _images_for(self, item) -> tuple[list[np.ndarray], np.ndarray]:
        """-> (V per-slot arrays, (V,) int32 view mask).

        Fused mode: slots are native-resolution uint8 frames (JPEG decode is
        the only host work; square-pad/resize/normalize run on device inside
        the jit'd generate). Legacy mode: host PIL clip_preprocess floats.
        """
        cfg = self.cfg
        size = cfg.vision.image_size
        md = item["multimodal_data"]
        sample = item["sample"]
        slots: list[np.ndarray] = []
        black = (np.zeros((8, 8, 3), np.uint8) if self.fused_preproc
                 else pp.black_image(size))

        def load(path):
            from PIL import Image

            try:
                img = Image.open(path)
                if self.fused_preproc:
                    return np.asarray(img.convert("RGB"), dtype=np.uint8)
                return pp.clip_preprocess(img, size)
            except OSError:
                return black

        if "4DOR" in sample["take_name"]:
            azure = md.get("azure", [])
            for cam in self.cameras_4dor:
                if cam - 1 < len(azure):
                    slots.append(load(azure[cam - 1]))
                else:
                    slots.append(black)
        else:
            azure = md.get("azure", [])
            simstation = md.get("simstation", [])
            if azure:
                for cam in self.cameras_mmor:
                    slots.append(
                        load(azure[cam - 1]) if cam - 1 < len(azure) else black
                    )
            elif simstation:
                for cam in (2, 0, 3):
                    slots.append(
                        load(simstation[cam]) if cam < len(simstation) else black
                    )
            else:
                slots.extend(black for _ in self.cameras_mmor)
            if len(simstation) > 1:
                slots.append(load(simstation[1]))  # robot screen
            if md.get("trackercam"):
                slots.append(load(md["trackercam"][0]))

        v = cfg.pooler.max_views
        slots = slots[:v]
        mask = np.zeros((v,), np.int32)
        mask[: len(slots)] = 1
        while len(slots) < v:
            slots.append(black if self.fused_preproc
                         else np.zeros((size, size, 3), np.float32))
        return slots, mask

    def _prompt_for(self, item) -> str:
        md = item["multimodal_data"]
        sample = item["sample"]
        robot = tracker = transcript = memory = None
        if md.get("robot_metadata"):
            with open(md["robot_metadata"][0]) as f:
                robot = format_robot_metadata(json.load(f))
        if md.get("tracker"):
            tracker = format_tracker_metadata(
                md["tracker"][0]["unique_id_dicts"], TRACKER_OBJECT_MAP
            )
        if md.get("speech_transcript"):
            with open(md["speech_transcript"][0]) as f:
                transcript = json.load(f)["text"]
        if self.temporality == "PRED":
            timepoint = int(sample["frame_id"])
            history = self.take_to_history[sample["take_name"]]
            log = sg_history_to_change_log(
                history, irrelevant_preds=["closeto", "closeTo"]
            )
            log = [e for e in log if e[0] < timepoint]
            memory = change_log_to_memory_str(log, timepoint, style="longshort")
            # (the 5000-char '...' clamp quirk is applied inside
            # build_sg_prompt — scene_graph_prediction_model.py:192-194)
        return build_sg_prompt(
            robot_metadata_str=robot,
            tracker_metadata_str=tracker,
            speech_transcript=transcript,
            memory_str=memory,
        )

    def build_batch(self, items) -> dict[str, jnp.ndarray]:
        cfg = self.cfg
        images, view_masks, id_lists = [], [], []
        pcs, pc_valids, audios, has_pc = [], [], [], False
        for item in items:
            img, mask = self._images_for(item)
            images.append(img)
            view_masks.append(mask)
            prompt = self._prompt_for(item)
            id_lists.append(
                tokenize_with_image_token(prompt, self.tokenizer, IMAGE_TOKEN_INDEX)
            )
            md = item["multimodal_data"]
            if md.get("pc"):
                pts, valid = pp.pad_pointcloud(
                    pp.load_pcd(md["pc"][0]), cfg.ptv3.max_points
                )
                has_pc = True
            else:
                pts = np.zeros((cfg.ptv3.max_points, 6), np.float32)
                valid = np.zeros((cfg.ptv3.max_points,), bool)
            pcs.append(pts)
            pc_valids.append(valid)
            if md.get("audio"):
                emb = pp.load_audio_embedding(md["audio"][0])
                # fit to the configured width (tiny test configs use narrow dims)
                fitted = np.zeros((cfg.pooler.audio_dim,), np.float32)
                n = min(len(emb), cfg.pooler.audio_dim)
                fitted[:n] = emb[:n]
                audios.append(fitted)
            else:
                audios.append(np.zeros((cfg.pooler.audio_dim,), np.float32))

        bucket = self.prompt_bucket
        longest = max(len(ids) for ids in id_lists)
        while bucket < longest:
            bucket *= 2
        ids, mask = left_pad_batch(id_lists, self.tokenizer.pad_token_id, bucket)

        batch = {
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.asarray(mask),
            "view_mask": jnp.asarray(np.stack(view_masks)),
            "audio_embedding": jnp.asarray(np.stack(audios)),
        }
        if self.fused_preproc:
            batch["raw_views"] = self._stack_raw_views(images)
        else:
            batch["images"] = jnp.asarray(
                np.stack([np.stack(slots) for slots in images]))
        if has_pc:
            batch["pc_points"] = jnp.asarray(np.stack(pcs))
            batch["pc_valid"] = jnp.asarray(np.stack(pc_valids))
        return batch

    def _stack_raw_views(self, images: list[list[np.ndarray]]):
        """Per-slot (B, h_v, w_v, 3) uint8 stacks for the on-device
        preprocessing path. Camera resolutions are consistent per slot within
        a dataset; a stray mismatching frame is host-resized to the slot's
        shape (rare fallback, keeps the batch static)."""
        v = self.cfg.pooler.max_views
        out = []
        for slot in range(v):
            frames = [item_slots[slot] for item_slots in images]
            target = next(
                (f.shape for f in frames if f.shape != (8, 8, 3)),
                frames[0].shape,
            )
            fixed = []
            for f in frames:
                if f.shape != target:
                    if f.max() == 0:  # black placeholder: any size works
                        f = np.zeros(target, np.uint8)
                    else:
                        from PIL import Image

                        f = np.asarray(
                            Image.fromarray(f).resize(
                                (target[1], target[0]), Image.BICUBIC),
                            dtype=np.uint8)
                fixed.append(f)
            out.append(jnp.asarray(np.stack(fixed)))
        return tuple(out)

    # ---------------------------------------------------------------- #
    # prediction / evaluation
    # ---------------------------------------------------------------- #

    def predict(self, items) -> list[str]:
        return self._decode_outputs(self.build_batch(items))

    def validate(
        self, items_iter, batch_size: int = 8, limit_batches: int | None = None
    ):
        """Run generation over the dataset and produce the reference's report
        (per-take / per-datatype / global). Returns (report, raw_predictions).

        Host batch assembly (JPEG decode, CLIP preprocess, PCD parse) for
        batch i+1 overlaps with the device generating batch i (a one-deep
        prefetch pipeline) — except in temporal-PRED mode, where the memory
        prompt depends on the previous output so prep must stay serial.
        """
        evaluator = SceneGraphEvaluator()
        raw_predictions: dict[str, list] = {}
        if self.temporality == "PRED":
            batch_size = 1  # history must be causal (main.py:55-60)

        items = list(items_iter)
        chunks = [items[i:i + batch_size] for i in range(0, len(items), batch_size)]
        if limit_batches is not None:
            chunks = chunks[:limit_batches]

        def consume(batch_items, outputs):
            for item, text in zip(batch_items, outputs):
                sample = item["sample"]
                raw = evaluator.add_sample(
                    sample["take_name"], text, sample["relationships"]
                )
                raw_predictions[sample.get("sample_id", self._sid(sample))] = raw
                if self.temporality == "PRED":
                    self.take_to_history[sample["take_name"]].append(
                        {"timepoint_idx": int(sample["frame_id"]), "scene_graph": raw}
                    )

        if self.temporality == "PRED":
            for chunk in chunks:
                consume(chunk, self.predict(chunk))
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=1) as pool:
                future = None
                for i, chunk in enumerate(chunks):
                    batch = future.result() if future is not None else self.build_batch(chunks[0])
                    future = (pool.submit(self.build_batch, chunks[i + 1])
                              if i + 1 < len(chunks) else None)
                    consume(chunk, self._decode_outputs(batch))
        return evaluator.report(), raw_predictions

    def _decode_outputs(self, batch) -> list[str]:
        tokens = np.asarray(self._generate(self.params, batch))
        eos = self.tokenizer.eos_token_id
        outputs = []
        for row in tokens:
            ids = list(row)
            if eos in ids:
                ids = ids[: ids.index(eos)]
            outputs.append(self.tokenizer.decode(ids).strip())
        return outputs

    @staticmethod
    def _sid(sample) -> str:
        return f'{sample["take_name"]}_{sample["frame_id"]}'
