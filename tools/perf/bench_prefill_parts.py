"""Prefill decomposition at serving shapes: where do the ~6 s at b40 go?

Round-4 measurement: the b40 e2e bench spends ~6.0 s/batch in prefill
(prefill-only bench: 6.68 f/s) vs the roofline's ~3.3 s estimate, and at the
int4-KV decode floor prefill is ~43% of e2e — the binding constraint on the
ladder. This probe times the prefill pipeline stage by stage so the recovery
lever is chosen from data:

  1. raw-frame preprocessing (pad-to-square + bicubic resize + normalize,
     7 native-res views)
  2. CLIP ViT-L/14-336 tower over B*V images
  3. pooler + projector (BERT fuse over 7*576 tokens)
  4. LLaMA-7B forward over the spliced (B, ~1150) sequence (logits only)
  5. the full jitted prefill (make_prefill) as the e2e anchor — the gap vs
     1+2+3+4 is splice/cache-pack/dispatch overhead

Run: PYTHONPATH=.:$PYTHONPATH python tools/perf/bench_prefill_parts.py
Env: BM_BATCH (default 40), BM_PROMPT (128), BM_PRESET (7b; small+
BM_PLATFORM=cpu for a smoke run), BM_PLATFORM (config-level platform pin —
the axon sitecustomize ignores a plain JAX_PLATFORMS env var).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax

if os.environ.get("BM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BM_PLATFORM"])

import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BM_BATCH", "40"))
PROMPT = int(os.environ.get("BM_PROMPT", "128"))
PRESET = os.environ.get("BM_PRESET", "7b")


def timeit(name, fn, *args, iters=2, scalar=True):
    try:
        jitted = jax.jit(
            (lambda *a: jnp.sum(fn(*a).astype(jnp.float32))) if scalar else fn)
        np.asarray(jax.tree.leaves(jitted(*args))[0])  # compile+warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:9.1f} ms")
        return dt
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}"[:300].replace("\n", " "))
        return None


def main():
    import dataclasses

    from __graft_entry__ import _example_batch, _preset
    from mmor_tpu.models.mm2sg import MM2SG, alloc_cache_buffers, make_prefill
    from mmor_tpu.ops.image_preproc import preprocess_views

    cfg = _preset(PRESET)
    if PRESET == "7b":
        cfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(
                cfg.llama, weight_quant=True, kv_quant=True, fused_qkv=True,
                mega_decode=True, weight_bits=4, kv_bits=4, ffn_pad=256))
    model = MM2SG(cfg)
    print(f"devices: {jax.devices()}  B={BATCH} prompt={PROMPT} "
          f"mm_tokens={cfg.num_multimodal_tokens}")

    batch = _example_batch(cfg, batch=BATCH, prompt_len=PROMPT,
                           key=jax.random.PRNGKey(0), raw_views=True)
    size = cfg.vision.image_size

    # 1. raw preprocessing (7 views at native camera res)
    def preproc(raw_views):
        views = [preprocess_views(rv, size).astype(cfg.vision.dtype)
                 for rv in raw_views]
        return jnp.stack(views, axis=1)
    t_pre = timeit("1. preprocess 7 raw views  ", preproc, batch["raw_views"])

    images = jax.jit(preproc)(batch["raw_views"])  # (B, V, S, S, 3)

    # params (zero-filled: timing is shape/dtype-bound)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(1), batch["input_ids"], batch["attention_mask"],
            jnp.zeros((BATCH, cfg.pooler.max_views, size, size, 3),
                      jnp.bfloat16),
            batch["view_mask"], pc_feature=batch["pc_feature"],
            audio_embedding=batch["audio_embedding"],
            segmasks=batch["segmasks"]))
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()

    # 2. CLIP tower alone over B*V images
    flat = images.reshape((-1,) + images.shape[2:])
    t_clip = timeit(
        "2. CLIP ViT-L/14 (B*V imgs)",
        lambda p, x: model.apply(p, x, method=lambda m, x: m.vision_tower(x)),
        params, flat)

    # 3. full vision side (preproc + CLIP + pooler + projector)
    def vision_side(p, raw_views, vm, pc, au, sg):
        return model.apply(
            p, preproc(raw_views), vm, pc, au, sg,
            method=lambda m, *a: m.encode_multimodal(*a))
    t_vis = timeit(
        "3. vision side total       ",
        vision_side, params, batch["raw_views"], batch["view_mask"],
        batch["pc_feature"], batch["audio_embedding"], batch["segmasks"])

    # 4. LLaMA forward over the spliced-length sequence, logits only
    t_total = PROMPT + cfg.num_multimodal_tokens - 1
    embeds = jnp.zeros((BATCH, t_total, cfg.llama.dim), cfg.llama.dtype)
    mask = jnp.ones((BATCH, t_total), jnp.int32)
    t_lm = timeit(
        "4. LLaMA-7B fwd (no cache) ",
        lambda p, e, am: model.apply(
            p, e, am,
            method=lambda m, e, am: m.language_model(
                input_embeds=e, attention_mask=am, last_logit_only=True)[0]),
        params, embeds, mask)

    # 5. full prefill (the serving anchor, donated cache buffers)
    cache_len = -(-(t_total + 300) // 128) * 128
    prefill = make_prefill(model, max_cache_len=cache_len)
    bufs = alloc_cache_buffers(cfg, BATCH, cache_len)

    def recycle(cache):
        if "k_s" not in cache:
            return None  # unquantized cache allocates in-program
        return (cache["k"], cache["k_s"], cache["v"], cache["v_s"])
    try:
        logits, cache = prefill(params, batch, bufs)  # compile+warm
        np.asarray(logits.ravel()[:1])
        t0 = time.perf_counter()
        logits, cache = prefill(params, batch, recycle(cache))
        np.asarray(logits.ravel()[:1])
        t_full = time.perf_counter() - t0
        print(f"5. full jitted prefill     : {t_full * 1e3:9.1f} ms")
    except Exception as e:
        print(f"5. full jitted prefill     : FAILED {type(e).__name__}: {e}"[:300]
              .replace("\n", " "))
        t_full = None

    if all(v is not None for v in (t_pre, t_vis, t_lm, t_full)):
        glue = t_full - t_vis - t_lm
        print(f"   -> glue (splice+cache+emb): {glue * 1e3:9.1f} ms; "
              f"per-frame prefill {t_full / BATCH * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
