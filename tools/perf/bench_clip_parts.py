"""CLIP tower decomposition: why does ViT-L/14-336 run at ~39 TFLOP/s when
the bf16 matmul rate on this chip is ~90?

bench_prefill_parts measured the tower at 2.50 s for ~98 TFLOP at b40
(280 images) — 2.3x the matmul-rate estimate, making CLIP ~42% of prefill.
This probe times the tower's pieces at EXACT tower shapes (B*V=280 images,
577 tokens, dim 1024, heads 16, mlp 4096, 24 layers):

  a. Dense 1024->1024  (x4 per layer: QKVO)
  b. Dense 1024->4096 + gelu + 4096->1024 (MLP)
  c. flash_attention at (280, 16, 577, 64)
  d. LayerNorm at (280*577, 1024) (x2 per layer)
  e. one full encoder block (flax, as the tower runs it)

Run: PYTHONPATH=.:$PYTHONPATH python tools/perf/bench_clip_parts.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax

if os.environ.get("BM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BM_PLATFORM"])

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BM_B", "280"))      # images (b40 x 7 views)
T = int(os.environ.get("BM_T", "577"))      # cls + 576 patches
D = int(os.environ.get("BM_D", "1024"))
H = int(os.environ.get("BM_H", "16"))
MLP = int(os.environ.get("BM_MLP", "4096"))
LAYERS = 24
bf = jnp.bfloat16


def timeit(name, fn, *args, flops=None, iters=4):
    try:
        jitted = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        np.asarray(jitted(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(*args)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        rate = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
        tower = f"  -> x{LAYERS}L: {dt * LAYERS * 1e3:7.1f} ms" if flops else ""
        print(f"{name}: {dt * 1e3:8.2f} ms{rate}{tower}")
        return dt
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}"[:300].replace("\n", " "))
        return None


def main():
    from mmor_tpu.ops.attention import flash_attention

    print(f"devices: {jax.devices()}  B={B} T={T} D={D} H={H} MLP={MLP}")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, D), bf)
    wqkvo = jax.random.normal(jax.random.fold_in(key, 1), (D, D), bf) * 0.02
    w1 = jax.random.normal(jax.random.fold_in(key, 2), (D, MLP), bf) * 0.02
    w2 = jax.random.normal(jax.random.fold_in(key, 3), (MLP, D), bf) * 0.02

    m = B * T
    timeit("a. dense DxD (QKVO each)   ",
           lambda a, w: jnp.einsum("btd,de->bte", a, w,
                                   preferred_element_type=jnp.float32
                                   ).astype(bf),
           x, wqkvo, flops=2.0 * m * D * D * 4)  # x4: per-layer QKVO total

    timeit("b. MLP fc1+gelu+fc2        ",
           lambda a, u, v: jnp.einsum(
               "btm,md->btd",
               jax.nn.gelu(jnp.einsum("btd,dm->btm", a, u,
                                      preferred_element_type=jnp.float32
                                      ).astype(bf), approximate=True),
               v, preferred_element_type=jnp.float32).astype(bf),
           x, w1, w2, flops=2.0 * m * D * MLP * 2)

    hd = D // H
    q = jax.random.normal(jax.random.fold_in(key, 4), (B, H, T, hd), bf)
    for bq, bkv in ((128, 128), (640, 640), (320, 640), (640, 128)):
        timeit(f"c. flash attn bq={bq:3d} bkv={bkv:3d}",
               lambda q, bq=bq, bkv=bkv: flash_attention(
                   q, q, q, causal=False, block_q=bq, block_kv=bkv),
               q, flops=4.0 * B * H * T * T * hd)

    timeit("d. 2x LayerNorm            ",
           lambda a: nn.LayerNorm(epsilon=1e-5, dtype=bf).apply(
               {"params": {"scale": jnp.ones((D,), bf),
                           "bias": jnp.zeros((D,), bf)}},
               nn.LayerNorm(epsilon=1e-5, dtype=bf).apply(
                   {"params": {"scale": jnp.ones((D,), bf),
                               "bias": jnp.zeros((D,), bf)}}, a)),
           x, flops=1)

    # e. one full encoder block exactly as the tower runs it
    from mmor_tpu.config import ClipVitConfig
    from mmor_tpu.models.clip_vit import ClipEncoderLayer

    cfg = ClipVitConfig()
    blk = ClipEncoderLayer(cfg)
    params = blk.init(jax.random.PRNGKey(1), x)
    blk_flops = 2.0 * m * D * D * 4 + 2.0 * m * D * MLP * 2 \
        + 4.0 * B * H * T * T * hd
    timeit("e. full encoder block      ",
           lambda p, a: blk.apply(p, a)[0], params, x, flops=blk_flops)


if __name__ == "__main__":
    main()
