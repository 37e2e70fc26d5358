"""Headline benchmark: MM2SG end-to-end inference frames/sec/chip.

Runs the flagship-geometry MM2SG (LLaVA-7B-class decoder + CLIP ViT-L/14-336
+ pooler) end to end — 7 camera views -> CLIP -> pooler (+pc/audio/segmask
tokens) -> projector -> multimodal splice -> prefill -> greedy KV-cached
decode (full 300 tokens, no early stop) — on synthetic inputs, and prints ONE
JSON line.

Default configuration is a fastest-first LADDER (each rung falls through on
OOM/compile failure): (1) whole-decode-step megakernel (all 32 layers in one
pallas call per token, ops/mega_decode.py) with int4 weights + int4 KV at
batch 40, (2) the same at batch 32, (3) the round-2 per-op stepwise int8
path at batch 20. All rungs use fused qkv/gate-up projections, stepwise
donated-cache decode, and raw uint8 native-resolution frames preprocessed on
device inside the jit'd prefill (BASELINE's fused-preprocessing
requirement). The megakernel is DMA-bound at ~320 GB/s on this chip
(docs/DESIGN.md §4.1), so in-place int4 weights + T-halved int4 KV set the
bytes/token floor; int4 quality is gated by tests/test_generation_parity.py.

``vs_baseline`` is the ratio against the reference setup's estimated A100
throughput (batch 8, greedy, max_new_tokens 300, LLaVA-v1.5-7B ~= 35 tok/s
per sequence => ~0.93 frames/s; the repo publishes no numbers — BASELINE.md).

Env overrides: MMOR_TPU_BENCH_PRESET (7b|small|tiny), MMOR_TPU_BENCH_BATCH,
MMOR_TPU_BENCH_NEW_TOKENS, MMOR_TPU_BENCH_PROMPT, MMOR_TPU_BENCH_QUANT (1|0),
MMOR_TPU_BENCH_MEGA / _WBITS / _KVBITS (setting any pins a single config —
no ladder), _RAW, _MODE (stepwise|whileloop), _SAMPLER (pallas|gather|tiled),
_PANOPTIC (1|0), _PLATFORM (e.g. cpu — config-level override for smoke
runs), _PREFLIGHT (1|0 tunnel liveness check).
"""

import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# the axon sitecustomize re-pins the platform at interpreter start, so a
# plain JAX_PLATFORMS=cpu env var does NOT take; honor an explicit request
# at the config level (CPU smoke runs: MMOR_TPU_BENCH_PLATFORM=cpu)
if os.environ.get("MMOR_TPU_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MMOR_TPU_BENCH_PLATFORM"])

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
        # name the core that actually produced this number (VERDICT r4 #5:
        # the fallback key alone only identified the failure case)
        "panoptic_sampler": sampler,
    }


V5E_PEAK_BF16_FLOPS = 197e12  # per-chip peak; the tunnel chip is slower


def _exc_reason(e, limit=600):
    """One-line exception reason keeping the TAIL: Mosaic/XLA put the root
    cause in the last lines, and the relay wraps it in an HTTP-500 body that
    can push it past any head-truncation (ADVICE r4)."""
    text = f"{type(e).__name__}: {e}"
    flat = " | ".join(ln.strip() for ln in text.splitlines() if ln.strip())
    if len(flat) <= limit:
        return flat
    return "…" + flat[-(limit - 1):]


def _flops_of_compiled(compiled):
    """Analytical FLOPs of a compiled step (for MFU); None if the backend
    doesn't expose cost analysis through the tunnel."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _mem_analysis(compiled):
    """arg/temp/alias byte breakdown of a compiled step — works through the
    tunnel and makes a RESOURCE_EXHAUSTED rung diagnosable from the bench
    JSON alone (VERDICT r4 #6)."""
    try:
        ma = compiled.memory_analysis()
        return {
            "args_gb": round(ma.argument_size_in_bytes / 1e9, 3),
            "out_gb": round(ma.output_size_in_bytes / 1e9, 3),
            "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
            "alias_gb": round(ma.alias_size_in_bytes / 1e9, 3),
        }
    except Exception:
        return None


def _time_step(run, *args, iters=3):
    """Compile+warm then time; returns (seconds/step, donated-arg carry)."""
    state = run(*args)
    jax.tree.map(lambda a: np.asarray(a), state)  # sync through the tunnel
    t0 = time.perf_counter()
    carry = state
    for _ in range(iters):
        carry = run(carry, *args[1:])
    jax.tree.map(lambda a: np.asarray(a), carry)
    return (time.perf_counter() - t0) / iters, carry


def train_metrics():
    """Training-step throughput (VERDICT r3 #5): the LoRA step at the
    largest decoder that fits one chip, and the CTVIS (panoptic) step at
    R50/736x1280 — step time, tokens|imgs per second, and MFU from the
    compiled cost analysis against the v5e bf16 peak.

    The reference's budgets are 1-epoch QLoRA (batch 4 x accum 4, seq 2048,
    README) and 100k CTVIS iters at IMS_PER_BATCH 1, frames 10
    (CTVIS_r50.yaml:11-27); a 16 GB chip cannot hold bf16-7B base + LoRA
    effective-weight copies, so the LoRA ladder steps down until a rung
    fits and the rung is named in the output."""
    import dataclasses as dc
    import gc

    from mmor_tpu.train import trainer as tr
    from mmor_tpu.train.lora import LoraConfig

    out = {}

    # ---- MM2SG LoRA step ladder ------------------------------------------
    def lora_rung(cfg, tag, batch_size, seq):
        model = MM2SG(cfg)
        batch = _example_batch(cfg, batch=batch_size, prompt_len=seq,
                               key=jax.random.PRNGKey(0))
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(1), batch["input_ids"],
                batch["attention_mask"], batch["images"], batch["view_mask"],
                pc_feature=batch["pc_feature"],
                audio_embedding=batch["audio_embedding"],
                segmasks=batch["segmasks"]))
        params = jax.jit(lambda: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
        from mmor_tpu.sg.prompts import IGNORE_INDEX

        ids = batch["input_ids"]
        batch["labels"] = jnp.where(jnp.arange(seq)[None] < seq // 4,
                                    IGNORE_INDEX, ids)
        tx = tr.make_optimizer(tr.TrainConfig(total_steps=100))
        step_fn, state = tr.make_lora_train_step(
            model, tx, LoraConfig(), params)
        compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(
            state, batch).compile()
        # record the byte breakdown BEFORE running: if the step itself
        # OOMs, the failure is still diagnosable from the JSON
        mem = _mem_analysis(compiled)
        if mem:
            out[f"train_lora_mem_{tag}"] = mem
        flops = _flops_of_compiled(compiled)
        run = lambda st, b: compiled(st, b)[0]
        dt, _ = _time_step(run, state, batch)
        toks = batch_size * (seq + cfg.num_multimodal_tokens)
        r = {
            "train_lora_rung": tag,
            "train_lora_step_ms": round(dt * 1e3, 1),
            "train_lora_tokens_per_sec": round(toks / dt, 1),
        }
        if flops:
            r["train_lora_mfu_vs_v5e_peak"] = round(
                flops / dt / V5E_PEAK_BF16_FLOPS, 4)
        return r

    smoke = os.environ.get("MMOR_TPU_BENCH_TRAIN_SMOKE") == "1"
    if smoke:  # CPU smoke of the measurement harness itself
        rungs = [("tiny_b2_s64", _preset("tiny"), 2, 64)]
    else:
        rungs = [
            ("7b_b1_s512", _preset("7b"), 1, 512),
            ("7b16L_b2_s1024", dc.replace(
                _preset("7b"),
                llama=dc.replace(_preset("7b").llama, n_layers=16)), 2, 1024),
            ("small_b8_s512", _preset("small"), 8, 512),
        ]
    for tag, cfg, b, s in rungs:
        failed = False
        try:
            out.update(lora_rung(cfg, tag, b, s))
            break
        except Exception as e:
            out["train_lora_rung_" + tag] = "failed: " + _exc_reason(e, 300)
            failed = True
        if failed:
            # outside the except block: e.__traceback__ pins the rung's
            # frames (params, optimizer state) until the handler exits
            gc.collect()
            jax.clear_caches()

    # ---- CTVIS (panoptic) step ladder ------------------------------------
    # resolution env-tunable for CPU smoke runs (default: reference test res)
    res_h = int(os.environ.get("MMOR_TPU_BENCH_TRAIN_H", "736"))
    res_w = int(os.environ.get("MMOR_TPU_BENCH_TRAIN_W", "1280"))

    def ctvis_rung(t_frames):
        from mmor_tpu.models.mask2former_decoder import MaskDecoderConfig
        from mmor_tpu.models.meta_arch import DVISConfig, DVISPlus
        from mmor_tpu.models.refiner import RefinerConfig
        from mmor_tpu.models.segmenter import SegmenterConfig
        from mmor_tpu.models.tracker import TrackerConfig
        from mmor_tpu.train.criterion import CriterionConfig
        from mmor_tpu.train.panoptic_trainer import (
            PanopticTrainConfig,
            make_panoptic_train_step,
        )

        bf = jnp.bfloat16
        sampler = os.environ.get("MMOR_TPU_BENCH_SAMPLER", "gather")
        cfg = DVISConfig(
            segmenter=SegmenterConfig(decoder=MaskDecoderConfig(dtype=bf),
                                      dtype=bf, sampler=sampler),
            tracker=TrackerConfig(dtype=bf),
            refiner=RefinerConfig(dtype=bf),
        )
        model = DVISPlus(cfg)
        h, w, n = res_h, res_w, 5
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, h, w, 3)), num_frames=1,
                               with_refiner=False))
        params = jax.jit(lambda: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
        rng = np.random.default_rng(0)
        masks = np.zeros((1, n, t_frames, h // 4, w // 4), np.float32)
        masks[:, 0, :, :40] = 1.0
        labels = np.zeros((1, n), np.int32)
        labels[:, 0] = 1
        valid = np.zeros((1, n), bool)
        valid[:, 0] = True
        batch = {
            "images": jnp.asarray(
                rng.standard_normal((t_frames, h, w, 3)), jnp.float32),
            "targets": {"labels": jnp.asarray(labels),
                        "masks": jnp.asarray(masks),
                        "valid": jnp.asarray(valid)},
        }
        tcfg = PanopticTrainConfig(stage="ctvis", criterion=CriterionConfig())
        step_fn, state, _ = make_panoptic_train_step(model, tcfg, params)
        key = jax.random.PRNGKey(3)
        compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(
            state, batch, key).compile()
        mem = _mem_analysis(compiled)
        if mem:
            out[f"train_ctvis_mem_t{t_frames}"] = mem
        flops = _flops_of_compiled(compiled)
        run = lambda st, b, k: compiled(st, b, k)[0]
        dt, _ = _time_step(run, state, batch, key)
        r = {
            "train_ctvis_rung": f"r50_{h}x{w}_t{t_frames}",
            "train_ctvis_step_ms": round(dt * 1e3, 1),
            "train_ctvis_imgs_per_sec": round(t_frames / dt, 2),
        }
        if flops:
            r["train_ctvis_mfu_vs_v5e_peak"] = round(
                flops / dt / V5E_PEAK_BF16_FLOPS, 4)
        return r

    for t_frames in ((2,) if smoke else (5, 3, 2)):
        failed = False
        try:
            out.update(ctvis_rung(t_frames))
            break
        except Exception as e:
            out[f"train_ctvis_rung_t{t_frames}"] = (
                "failed: " + _exc_reason(e, 300))
            failed = True
        if failed:
            gc.collect()
            jax.clear_caches()
    return out


def _train_metrics_isolated():
    """Run train_metrics() in a fresh interpreter and merge its JSON.

    Called FIRST in main(), before the serving ladder: buffer frees through
    the axon tunnel are not reliably synchronous AND a parent process
    holding a live TPU client keeps its HBM arena — round 4 measured every
    training rung RESOURCE_EXHAUSTED when this ran after the ladder, even
    though the rungs fit a clean chip. A subprocess on an untouched chip
    gets the full arena."""
    import subprocess

    env = dict(os.environ)
    env["MMOR_TPU_BENCH_TRAIN_ONLY"] = "1"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
            timeout=float(os.environ.get("MMOR_TPU_BENCH_TRAIN_TIMEOUT",
                                         "1800")),
        )
    except subprocess.TimeoutExpired:
        return {"train_error": "train-metrics subprocess timed out"}
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
    return {"train_error": ("subprocess rc=%d: %s" % (
        proc.returncode, " | ".join(tail[-3:])))[:300]}


RUN_DETAIL: dict = {}  # side-channel details of the last run_once rung


def run_once(preset, quant, fused, mega, wbits, kvbits, batch_size,
             new_tokens, prompt_len, raw, mode):
    """Build + warm + time one configuration; returns (fps, tag)."""
    cfg = _preset(preset)
    if quant:
        # packed-int8/int4 weights + packed KV cache; fused qkv / gate-up
        # halves the kernel count per layer; mega_decode runs all layers in
        # one pallas call per token (ops/mega_decode.py)
        cfg = dataclasses.replace(
            cfg,
            llama=dataclasses.replace(cfg.llama, weight_quant=True,
                                      kv_quant=True, fused_qkv=fused,
                                      mega_decode=mega, weight_bits=wbits,
                                      kv_bits=kvbits if mega else 8,
                                      ffn_pad=256),  # 11008 -> 11264 tiling
        )
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
    # only supports that at 128-multiple T (and int4 KV slices at T/2,
    # needing T % 256); it also walks 8-row batch groups, so mega requires
    # batch % 8 == 0.
    granule = (256 if mega and kvbits == 4 else 128) if mega else 16
    cache_len = -(-cache_len // granule) * granule
    if mega:
        assert batch_size % 8 == 0, "mega decode needs batch % 8 == 0"

    # overlap = piggybacked serving: only batch 0 pays a dedicated prefill;
    # every later batch's prompt rides the previous batch's DMA-bound decode
    # steps on the idle MXU (ops/mega_overlap.py). Timed as a marginal rate
    # over a 6-batch stream minus a 2-batch stream, which cancels the
    # pipeline fill AND any residual compile — the steady-state number a
    # continuous serving deployment sees. The fill-inclusive e2e rate is
    # recorded alongside in RUN_DETAIL.
    if mode == "overlap":
        from mmor_tpu.models.mm2sg import generate_overlapped

        assert mega and batch_size % 8 == 0
        ec = {}

        def run_k(k):
            return generate_overlapped(
                model, params, [batch] * k, max_cache_len=cache_len,
                max_new_tokens=new_tokens, eos_token_id=-1,
                engine_cache=ec)

        run_k(2)  # compile + warm every program in the pipeline
        t0 = time.perf_counter()
        run_k(2)
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run_k(6)
        t6 = time.perf_counter() - t0
        assert len(out) == 6 and out[0].shape == (batch_size, new_tokens)
        fps = batch_size * (6 - 2) / (t6 - t2)
        RUN_DETAIL.clear()
        RUN_DETAIL.update({
            "overlap_steady_fps": round(fps, 3),
            "overlap_e2e6_fps": round(batch_size * 6 / t6, 3),
            "overlap_fill_s": round(t2 - (t6 - t2) / 2, 2),
        })
        tag = f"int{wbits}w_int{kvbits}kv_mega_overlap"
        if raw:
            tag += "_rawin"
        return fps, tag

    # stepwise = jitted prefill + host-driven donated-cache decode steps;
    # the axon AOT compile copies while_loop cache carries every token, so
    # the fused whileloop path pays ~4 full-cache copies/token (see
    # models/llama.py::make_decode_step)
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
    if quant:
        tag = f"int{wbits}w_int{kvbits if mega else 8}kv"
        if mega:
            tag += "_mega"
    else:
        tag = "bf16"
    if raw:
        tag += "_rawin"  # uint8 native-res frames, on-device preprocessing
    return fps, tag


def _emit_infra_abort(reason: str) -> None:
    """Even an aborted run must print the ONE JSON line the driver parses
    (round 3 exited 2 with no JSON and the round recorded no perf number —
    VERDICT r3 weak #2)."""
    print(json.dumps({
        "metric": "mm2sg_7b_e2e_frames_per_sec_per_chip",
        "value": None,
        "unit": "frames/s/chip",
        "vs_baseline": None,
        "infra": reason,
    }))


def _preflight_tunnel():
    """Wait (with backoff) for the axon relay instead of hanging at backend
    init: jax init blocks forever with zero output when the relay is down
    (the relay is a host-spawned process this container cannot restart —
    CLAUDE.md gotchas). Polls the relay ports for
    MMOR_TPU_BENCH_PREFLIGHT_DEADLINE seconds (default 900); on final
    failure prints the infra-marker JSON line and exits 0 so the driver
    always gets a parseable result."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    if os.environ.get("MMOR_TPU_BENCH_PREFLIGHT", "1") != "1":
        return
    override = os.environ.get("MMOR_TPU_BENCH_PLATFORM")
    if override and "axon" not in override:
        return  # explicit non-axon platform: the tunnel is irrelevant
    import socket

    def up() -> bool:
        for port in (8082, 8083, 8087, 8092, 8093, 8097):
            try:
                socket.create_connection(("127.0.0.1", port), timeout=2).close()
                return True
            except OSError:
                continue
        return False

    deadline = float(os.environ.get("MMOR_TPU_BENCH_PREFLIGHT_DEADLINE", "900"))
    t0 = time.monotonic()
    delay = 2.0
    while True:
        if up():
            waited = time.monotonic() - t0
            if waited > 5:
                print(f"[bench] axon relay came up after {waited:.0f}s",
                      file=sys.stderr)
            return
        waited = time.monotonic() - t0
        if waited >= deadline:
            print(f"[bench] axon relay ports still closed after {waited:.0f}s "
                  "— TPU tunnel is down; emitting infra marker "
                  "(MMOR_TPU_BENCH_PREFLIGHT=0 skips this check, "
                  "MMOR_TPU_BENCH_PREFLIGHT_DEADLINE tunes the wait)",
                  file=sys.stderr)
            _emit_infra_abort(
                f"axon relay down (preflight waited {waited:.0f}s)")
            raise SystemExit(0)
        print(f"[bench] axon relay down {waited:.0f}s/{deadline:.0f}s — "
              f"retrying in {delay:.0f}s", file=sys.stderr)
        time.sleep(min(delay, deadline - waited))
        delay = min(delay * 1.6, 30.0)


def main():
    _preflight_tunnel()
    env = os.environ.get
    if env("MMOR_TPU_BENCH_TRAIN_ONLY") == "1":
        # subprocess mode (see _train_metrics_isolated): print ONLY the
        # train-metrics JSON and exit
        print(json.dumps(train_metrics()))
        return
    preset = env("MMOR_TPU_BENCH_PRESET", "7b")
    quant = env("MMOR_TPU_BENCH_QUANT", "1") == "1" and preset == "7b"

    # Train-throughput extras run FIRST (VERDICT r4 #1): the subprocess
    # needs a clean HBM arena, and running it after the serving ladder —
    # while this parent still holds its TPU client — left all six rungs
    # RESOURCE_EXHAUSTED in round 4. At this point the parent has not
    # touched the backend yet (preflight only polls sockets).
    train_extra = {}
    if env("MMOR_TPU_BENCH_TRAIN", "1") == "1" and preset == "7b":
        try:
            train_extra.update(_train_metrics_isolated())
        except Exception as e:  # throughput extras never kill the headline
            train_extra["train_error"] = _exc_reason(e, 200)

    new_tokens = int(env("MMOR_TPU_BENCH_NEW_TOKENS", "300"))
    prompt_len = int(env("MMOR_TPU_BENCH_PROMPT", "128"))
    fused = env("MMOR_TPU_BENCH_FUSED", "1") == "1"
    # raw uint8 frames at native camera resolution, preprocessed on device
    # inside the jit'd generate (BASELINE fused-preprocessing requirement)
    raw = env("MMOR_TPU_BENCH_RAW", "1") == "1"
    mode = env("MMOR_TPU_BENCH_MODE", "stepwise")

    # Any explicit knob pins a single configuration (no ladder): the env is
    # how the sweep scripts and CLAUDE.md recipes address one exact setup.
    pinned = any(env(k) is not None for k in (
        "MMOR_TPU_BENCH_BATCH", "MMOR_TPU_BENCH_MEGA", "MMOR_TPU_BENCH_WBITS",
        "MMOR_TPU_BENCH_KVBITS"))
    if pinned or not quant or mode != "stepwise" or not fused:
        mega = env("MMOR_TPU_BENCH_MEGA", "0") == "1" and quant and fused
        # mega needs batch % 8 == 0 (kernel row-groups)
        default_batch = "24" if mega else ("20" if quant else "1")
        attempts = [dict(
            mega=mega,
            wbits=int(env("MMOR_TPU_BENCH_WBITS", "8")),
            kvbits=int(env("MMOR_TPU_BENCH_KVBITS", "8")),
            batch_size=int(env("MMOR_TPU_BENCH_BATCH", default_batch)),
        )]
    else:
        # Fastest-first ladder (fall through on OOM/compile failure):
        #   1. megakernel decode, int4 weights + int4 KV, batch 40 —
        #      measured 2.89 f/s on-chip (round 4); the proven top rung
        #   2. same at batch 32 (rg=32: single attention row-group/head)
        #   3. round-2 proven per-op stepwise int8 path, batch 20
        # The megakernel is one pallas call per token for all 32 layers
        # (ops/mega_decode.py) and is DMA-bound, so fewer bytes (int4
        # weights walked in place — ONE copy shared with prefill — and
        # T-halved int4 KV) set the floor. b48 was DROPPED from the ladder:
        # round 4 measured it failing twice in fresh processes (AOT
        # compile-helper crash, then RESOURCE_EXHAUSTED on the b48 prefill
        # — 6.45 GB int4 KV + weights + raw frames + prefill transients
        # exceed the 16 GB chip), and a permanently-failing first rung
        # costs the driver minutes of compile before falling through.
        # Probe b48/b64 with MMOR_TPU_BENCH_BATCH if a bigger chip
        # appears. Quality is gated by tests/test_generation_parity.py
        # (int4 W >=0.97, int4 KV >=0.95 greedy-token agreement vs bf16
        # at 128 steps on a trained model).
        # Rungs 1-2 (round 5): OVERLAPPED serving — piggyback the next
        # batch's prefill inside the current batch's DMA-bound decode
        # (mega_overlap.py); steady state pays encode + decode only.
        # The b40 pf buffers add ~4.2 GB; if that tips 16 GB the ladder
        # falls through to b32 overlap and then the serial rungs.
        attempts = [
            dict(mega=True, wbits=4, kvbits=4, batch_size=40,
                 mode="overlap"),
            dict(mega=True, wbits=4, kvbits=4, batch_size=32,
                 mode="overlap"),
            dict(mega=True, wbits=4, kvbits=4, batch_size=40),
            dict(mega=True, wbits=4, kvbits=4, batch_size=32),
            dict(mega=False, wbits=8, kvbits=8, batch_size=20),
        ]

    fps = tag = batch_size = None
    ladder = []  # per-rung record so a fallen-through rung is driver-visible
    for i, att in enumerate(attempts):
        failed = False
        try:
            batch_size = att["batch_size"]
            fps, tag = run_once(preset, quant, fused, att["mega"],
                                att["wbits"], att["kvbits"], batch_size,
                                new_tokens, prompt_len, raw,
                                att.get("mode", mode))
            ladder.append({**att, "result": f"ok {fps:.3f} f/s"})
            break
        except Exception as e:
            # keep the TAIL of the message: Mosaic/XLA put the root cause in
            # the last lines and the relay wraps it in an HTTP 500 body
            ladder.append({**att, "result": "failed: " + _exc_reason(e)})
            print(f"[bench] attempt {i} {att} failed: "
                  f"{type(e).__name__}: {e}"[:2000], file=sys.stderr)
            failed = True
        if failed:
            # cleanup OUTSIDE the except block: e.__traceback__ pins the
            # failed rung's frames (and its ~10+ GB of device buffers)
            # until the handler exits
            import gc
            gc.collect()          # drop device buffers and
            jax.clear_caches()    # compiled programs before the next rung
    if fps is None:
        # all rungs failed: still emit a parseable JSON line for the driver
        print(json.dumps({
            "metric": f"mm2sg_{preset}_e2e_frames_per_sec_per_chip",
            "value": None,
            "unit": "frames/s/chip",
            "vs_baseline": None,
            "error": "all ladder rungs failed",
            "extra": {"ladder": ladder},
        }))
        raise SystemExit(1)

    # ladder mode: always record attempted rungs (config + result/failure)
    extra = {"ladder": ladder} if len(attempts) > 1 else {}
    extra.update(RUN_DETAIL)  # per-mode details (overlap fill/steady split)
    extra.update(train_extra)  # measured before the ladder on a clean chip
    if env("MMOR_TPU_BENCH_PANOPTIC", "1") == "1" and preset == "7b":
        import gc
        gc.collect()  # free the MM2SG footprint before the second stack
        try:
            extra.update(panoptic_metric())
        except Exception as e:  # never let the second stack kill the headline
            if os.environ.get("MMOR_TPU_BENCH_SAMPLER") is None:
                # pallas sampler failed — retry on the XLA gather core
                os.environ["MMOR_TPU_BENCH_SAMPLER"] = "gather"
                try:
                    extra.update(panoptic_metric())
                    extra["panoptic_sampler_fallback"] = _exc_reason(e, 300)
                except Exception as e2:
                    extra["panoptic_error"] = _exc_reason(e2, 200)
            else:
                extra["panoptic_error"] = _exc_reason(e, 200)

    print(json.dumps({
        "metric": f"mm2sg_{preset}_{tag}_b{batch_size}_e2e_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / A100_REFERENCE_FPS, 4),
        **({"extra": extra} if extra else {}),
    }))


if __name__ == "__main__":
    main()
