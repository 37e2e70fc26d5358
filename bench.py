"""Headline benchmark: MM2SG end-to-end inference frames/sec/chip.

Runs the flagship-geometry MM2SG (LLaVA-7B-class decoder + CLIP ViT-L/14-336
+ pooler) end to end — 7 camera views -> CLIP -> pooler (+pc/audio/segmask
tokens) -> projector -> multimodal splice -> prefill -> greedy KV-cached
decode (full 300 tokens, no early stop) — on synthetic inputs, and prints ONE
JSON line.

Default configuration: packed-int8 decoder weights + packed-int8 KV cache
(4 values per int32 element — narrow dtypes stream at half the DMA byte
rate on this chip), fused qkv/gate-up projections, stepwise donated-cache
decode, and raw uint8 native-resolution frames preprocessed on device
inside the jit'd prefill (BASELINE's fused-preprocessing requirement). The
6.7 GB weight + 6 GB cache footprint fits batch 22 on one chip; decode is
per-kernel-overhead bound (~0.15-0.25 ms/pallas-call), not bandwidth-bound
(docs/DESIGN.md).

``vs_baseline`` is the ratio against the reference setup's estimated A100
throughput (batch 8, greedy, max_new_tokens 300, LLaVA-v1.5-7B ~= 35 tok/s
per sequence => ~0.93 frames/s; the repo publishes no numbers — BASELINE.md).

Env overrides: MMOR_TPU_BENCH_PRESET (7b|small|tiny), MMOR_TPU_BENCH_BATCH,
MMOR_TPU_BENCH_NEW_TOKENS, MMOR_TPU_BENCH_PROMPT, MMOR_TPU_BENCH_QUANT (1|0).
"""

import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.models.mm2sg import MM2SG, generate
from __graft_entry__ import _example_batch, _preset

A100_REFERENCE_FPS = 0.93  # estimated reference throughput (see module docstring)
# Mask2Former-R50 video inference ~100 ms/frame at 720p-class resolution on
# A100 (detectron2-lineage measurements; the reference publishes no numbers)
A100_PANOPTIC_FPS = 10.0


def panoptic_metric():
    """Segmenter+tracker (DVIS online serving path) e2e frames/s at 736x1280
    bf16 — the second stack's device hot path (window inference semantics:
    3-frame windows, tracker state carried; VPS map assembly is host-side
    numpy and excluded)."""
    import dataclasses as dc

    from mmor_tpu.models.mask2former_decoder import MaskDecoderConfig
    from mmor_tpu.models.meta_arch import DVISConfig, DVISPlus
    from mmor_tpu.models.refiner import RefinerConfig
    from mmor_tpu.models.segmenter import SegmenterConfig
    from mmor_tpu.models.tracker import TrackerConfig

    bf = jnp.bfloat16
    # Pallas one-hot-matmul sampler (ops/deformable_sampler.py) for the
    # deformable encoder — the gather core was 97% of frame time;
    # MMOR_TPU_BENCH_SAMPLER=gather reverts
    sampler = os.environ.get("MMOR_TPU_BENCH_SAMPLER", "pallas")
    cfg = DVISConfig(
        segmenter=SegmenterConfig(
            decoder=MaskDecoderConfig(dtype=bf), dtype=bf, sampler=sampler),
        tracker=TrackerConfig(dtype=bf, noise_mode="none"),
        refiner=RefinerConfig(dtype=bf),
    )
    model = DVISPlus(cfg)
    t, h, w = cfg.window_size, 736, 1280
    frames = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, 3), bf)

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(1), frames, t,
                           with_refiner=False))
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()

    run = jax.jit(functools.partial(model.apply, num_frames=t,
                                    with_refiner=False))
    out, _ = run(params, frames)
    np.asarray(out["pred_masks"][..., :1, :1])  # compile + warm

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out, _ = run(params, frames)
        np.asarray(out["pred_masks"][..., :1, :1])
    dt = time.perf_counter() - t0
    fps = t * iters / dt
    return {
        "panoptic_segmenter_tracker_fps_736x1280": round(fps, 3),
        "panoptic_ms_per_frame": round(dt / (t * iters) * 1e3, 1),
        "panoptic_vs_a100_est": round(fps / A100_PANOPTIC_FPS, 3),
    }


def main():
    preset = os.environ.get("MMOR_TPU_BENCH_PRESET", "7b")
    quant = os.environ.get("MMOR_TPU_BENCH_QUANT", "1") == "1" and preset == "7b"
    default_batch = "20" if quant else "1"  # raw-input ceiling; 24 fits with MMOR_TPU_BENCH_RAW=0
    batch_size = int(os.environ.get("MMOR_TPU_BENCH_BATCH", default_batch))
    new_tokens = int(os.environ.get("MMOR_TPU_BENCH_NEW_TOKENS", "300"))
    prompt_len = int(os.environ.get("MMOR_TPU_BENCH_PROMPT", "128"))

    cfg = _preset(preset)
    fused = os.environ.get("MMOR_TPU_BENCH_FUSED", "1") == "1"
    # whole-decode-step megakernel (one pallas call for all 32 layers per
    # token — ops/mega_decode.py); MMOR_TPU_BENCH_MEGA=0 reverts to the
    # round-2 per-op stepwise path
    mega = os.environ.get("MMOR_TPU_BENCH_MEGA", "0") == "1" and quant and fused
    # decoder projection weight width: 8 (default) or 4 — int4 halves the
    # weight bytes decode streams AND the duplicated tape copy the mega
    # server builds; quality gated by tests/test_generation_parity.py
    wbits = int(os.environ.get("MMOR_TPU_BENCH_WBITS", "8"))
    kvbits = int(os.environ.get("MMOR_TPU_BENCH_KVBITS", "8"))
    if quant:
        # packed-int8 weights (6.7 GB) + packed-int8 KV cache; fused qkv /
        # gate-up halves the kernel count per layer — decode is per-kernel-
        # overhead bound on this chip (~0.15-0.25 ms/call), not bandwidth
        cfg = dataclasses.replace(
            cfg,
            llama=dataclasses.replace(cfg.llama, weight_quant=True,
                                      kv_quant=True, fused_qkv=fused,
                                      mega_decode=mega, weight_bits=wbits,
                                      kv_bits=kvbits if mega else 8,
                                      ffn_pad=256),  # 11008 -> 11264 tiling
        )
    # raw uint8 frames at native camera resolution, preprocessed on device
    # inside the jit'd generate (BASELINE fused-preprocessing requirement)
    raw = os.environ.get("MMOR_TPU_BENCH_RAW", "1") == "1"
    model = MM2SG(cfg)
    batch = _example_batch(cfg, batch=batch_size, prompt_len=prompt_len,
                           key=jax.random.PRNGKey(0), raw_views=raw)

    size = cfg.vision.image_size
    init_images = jnp.zeros(
        (batch_size, cfg.pooler.max_views, size, size, 3), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(1), batch["input_ids"], batch["attention_mask"],
            init_images, batch["view_mask"], pc_feature=batch["pc_feature"],
            audio_embedding=batch["audio_embedding"], segmasks=batch["segmasks"],
        )
    )
    # zero-filled params: benchmark timing is shape/dtype-bound, not value-bound
    params = jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )()

    cache_len = prompt_len + cfg.num_multimodal_tokens - 1 + new_tokens
    # 16-granular: full-T attention blocks don't need 128-multiple lanes;
    # the 1008->1024 rounding alone wasted ~110 MB of cache at b24.
    # The megakernel's attention phase reshapes (rg, T) int8 and Mosaic
    # only supports that at 128-multiple T; it also walks 8-row batch
    # groups, so mega requires T % 128 == 0 and batch % 8 == 0.
    granule = 128 if mega else 16
    cache_len = -(-cache_len // granule) * granule
    if mega:
        assert batch_size % 8 == 0, "mega decode needs batch % 8 == 0"

    # stepwise = jitted prefill + host-driven donated-cache decode steps;
    # the axon AOT compile copies while_loop cache carries every token, so
    # the fused whileloop path pays ~4 full-cache copies/token (see
    # models/llama.py::make_decode_step)
    mode = os.environ.get("MMOR_TPU_BENCH_MODE", "stepwise")
    if mode == "stepwise":
        from mmor_tpu.models.llama import LlamaModel, make_decode_step
        from mmor_tpu.models.mm2sg import generate_stepwise, make_prefill

        prefill = make_prefill(model, max_cache_len=cache_len)
        if mega:
            from mmor_tpu.ops.mega_decode import MegaServer

            lm_step = MegaServer(
                cfg.llama, {"params": params["params"]["language_model"]})
        else:
            lm_step = make_decode_step(LlamaModel(cfg.llama))
        state = {"bufs": None}  # donated cache buffers recycle across iters

        def run(p, b):
            toks, state["bufs"] = generate_stepwise(
                model, p, b, max_cache_len=cache_len,
                max_new_tokens=new_tokens, eos_token_id=-1,
                prefill_fn=prefill, step_fn=lm_step,
                cache_buffers=state["bufs"],
            )
            return toks
    else:
        run = jax.jit(
            lambda p, b: generate(
                model, p, b, max_cache_len=cache_len,
                max_new_tokens=new_tokens, eos_token_id=-1,
            )
        )
    # force device->host transfers for sync: block_until_ready is unreliable
    # through the experimental axon tunnel
    np.asarray(run(params, batch))  # compile + warmup

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(run(params, batch))
    elapsed = time.perf_counter() - t0

    fps = batch_size * iters / elapsed
    tag = "int8wkv" if quant else "bf16"
    if raw:
        tag += "_rawin"  # uint8 native-res frames, on-device preprocessing

    extra = {}
    if os.environ.get("MMOR_TPU_BENCH_PANOPTIC", "1") == "1" and preset == "7b":
        # free the MM2SG footprint before compiling the second stack
        params = batch = run = state = None
        try:
            extra = panoptic_metric()
        except Exception as e:  # never let the second stack kill the headline
            extra = {"panoptic_error": f"{type(e).__name__}: {e}"[:200]}

    print(json.dumps({
        "metric": f"mm2sg_{preset}_{tag}_b{batch_size}_e2e_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / A100_REFERENCE_FPS, 4),
        **({"extra": extra} if extra else {}),
    }))


if __name__ == "__main__":
    main()
