"""Compile + time + (optionally) verify the whole-decode-step megakernel.

BM_L / BM_B / BM_T / BM_FFN select geometry (default: 7B shapes, reduced
layer count for a fast first compile). BM_CHECK=1 compares the on-chip
kernel against the XLA reference on CPU (slow at 7B width — use small L).

  PYTHONPATH=.:$PYTHONPATH BM_L=4 BM_B=8 BM_T=512 python tools/perf/bench_mega.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.config import LlamaConfig
from mmor_tpu.ops import mega_decode as md
from mmor_tpu.ops.quantized_matmul import pack_int8_rows

L = int(os.environ.get("BM_L", "4"))
B = int(os.environ.get("BM_B", "8"))
T = int(os.environ.get("BM_T", "512"))
FFN = int(os.environ.get("BM_FFN", "11264"))
REPEATS = int(os.environ.get("BM_REPEATS", "8"))
CHECK = os.environ.get("BM_CHECK", "0") == "1"
WBITS = int(os.environ.get("BM_WBITS", "8"))
KVBITS = int(os.environ.get("BM_KVBITS", "8"))
# extra dead matmul rows (32-aligned): measures whether piggyback-prefill
# MXU work hides under the DMA-bound decode walk
BP_EXTRA = int(os.environ.get("BM_BP_EXTRA", "0"))

cfg = LlamaConfig(dim=4096, n_layers=L, n_heads=32, n_kv_heads=32,
                  ffn_dim=FFN, weight_quant=True, kv_quant=True,
                  fused_qkv=True, weight_bits=WBITS, kv_bits=KVBITS,
                  mega_decode=True)
geo = md.MegaGeometry.from_config(cfg, batch=B, t_cap=T, bp_extra=BP_EXTRA)


def rand_blocks(key):
    ks = jax.random.split(key, 6)
    d, f, qw = cfg.dim, FFN, cfg.n_heads * cfg.head_dim

    def q(key, k_in, n):
        if WBITS == 4:
            from mmor_tpu.ops.quantized_matmul import (pack_int4_rows,
                                                       quantize_weights_int4)
            w = jax.random.normal(key, (L, k_in, n)) * 0.02
            wq, sc = jax.jit(jax.vmap(
                lambda x: quantize_weights_int4(x, group=geo.ck)))(w)
            return {"w_p": jax.jit(jax.vmap(
                        lambda x: pack_int4_rows(x, block=geo.ck)))(wq),
                    "scale": sc}
        wq = jax.random.randint(key, (L, k_in, n), -127, 128, jnp.int8)
        sc = jnp.full((L, n), 0.01, jnp.float32)
        return {"w_p": jax.jit(jax.vmap(pack_int8_rows))(wq), "scale": sc}

    return {
        "qkv_proj": q(ks[0], d, 3 * qw),
        "o_proj": q(ks[1], qw, d),
        "gate_up_proj": q(ks[2], d, 2 * f),
        "down_proj": q(ks[3], f, d),
        "attn_norm": {"scale": jnp.ones((L, d))},
        "mlp_norm": {"scale": jnp.ones((L, d))},
    }


def rand_cache(key, prefix):
    ks = jax.random.split(key, 4)
    h, dh = cfg.n_heads, cfg.head_dim
    big = 2 ** 30
    if KVBITS == 4:
        kf = jax.random.normal(ks[2], (L, B, h, T, dh)) * 0.5
        vf = jax.random.normal(ks[3], (L, B, h, T, dh)) * 0.5
        kq, k_s = jax.jit(md.quantize_k_int4)(kf)
        vq, v_s = jax.jit(md.quantize_v_int4)(vf)
        del kf, vf
        k, v = kq, vq
        k_s = k_s.transpose(0, 2, 1, 3)
        v_s = v_s.transpose(0, 2, 1, 3)
    else:
        k = jax.random.randint(ks[0], (L, B, h, dh // 4, T), -big, big,
                               jnp.int32)
        v = jax.random.randint(ks[1], (L, B, h, T // 4, dh), -big, big,
                               jnp.int32)
        k_s = jnp.full((L, h, B, T), 0.02, jnp.bfloat16)
        v_s = jnp.full((L, h, B, T), 0.02, jnp.bfloat16)
    cache = dict(
        k=k,
        # mega cache scales live (L, H, B, T) — see mega_decode_layers
        k_s=k_s,
        v=v,
        v_s=v_s,
        kv_mask=jnp.broadcast_to(
            (jnp.arange(T)[None] < prefix).astype(jnp.int32), (B, T)),
        write_pos=jnp.asarray(prefix, jnp.int32),
        tok_pos=jnp.full((B,), prefix, jnp.int32),
    )
    return cache


def main():
    print(f"L={L} B={B} T={T} ffn={FFN} w{WBITS} kv{KVBITS} bp={geo.bp} "
          f"steps/layer={geo.steps_per_layer} "
          f"grid={L}x{geo.steps_per_layer}", flush=True)
    qw = cfg.n_heads * cfg.head_dim
    wbytes = ((geo.wqkv * cfg.dim + qw * cfg.dim          # qkv + o
               + 2 * FFN * cfg.dim + FFN * cfg.dim)       # gate_up + down
              * L * WBITS // 8)
    kvbytes = 2 * L * B * cfg.n_heads * cfg.head_dim * T * KVBITS // 8
    print(f"weights {wbytes/1e9:.2f} GB  kv {kvbytes/1e9:.2f} GB", flush=True)

    blocks = rand_blocks(jax.random.PRNGKey(0))
    tapes = md.build_tapes(blocks, geo)  # eager: jit would copy the
    # pass-through weight arrays (they alias the per-layer params now)
    del blocks
    cache = rand_cache(jax.random.PRNGKey(1), prefix=T - 8)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.dim),
                          jnp.bfloat16) * 0.3
    cos, sin = md.rope_tables(cache["tok_pos"], cfg.head_dim, cfg.rope_theta)

    # tapes/cache are ARGUMENTS, not closure constants: jit constants get
    # serialized INTO the axon remote-compile request body (HTTP 413 at
    # 0.8 GB; device buffers passed as args go by handle)
    def once(x, tapes, cache):
        out = md.mega_decode_layers(x, tapes, cache, cos, sin, geo)
        return out[0]

    jfn = jax.jit(lambda x, t, c: once(x, t, c).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    print("compiling...", flush=True)
    v0 = np.asarray(jfn(x, tapes, cache))
    print(f"compiled+ran in {time.perf_counter()-t0:.1f}s  out={v0:.4f}",
          flush=True)

    def chained(x, tapes, cache):
        def body(i, acc):
            xp = x + (acc * 1e-38).astype(x.dtype)
            return once(xp, tapes, cache).astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((), jnp.float32))

    cfn = jax.jit(chained)
    np.asarray(cfn(x, tapes, cache))
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        np.asarray(cfn(x, tapes, cache))
    dt = (time.perf_counter() - t0) / iters / REPEATS
    bw = (wbytes + kvbytes) / dt / 1e9
    per32 = dt * 32 / L
    print(f"mega step ({L} layers): {dt*1e3:.3f} ms  eff {bw:.0f} GB/s  "
          f"-> {per32*1e3:.1f} ms/token at 32 layers", flush=True)

    if CHECK:
        ref = md.mega_decode_layers_reference(x, tapes, cache, cos, sin, geo)
        got = md.mega_decode_layers(x, tapes, cache, cos, sin, geo)
        for name, a, b_ in zip(["x", "knew", "knew_s", "vnew", "vnew_s"],
                               ref, got):
            a = np.asarray(a, np.float32)
            b_ = np.asarray(b_, np.float32)
            if name in ("knew", "vnew"):
                frac = (np.abs(a - b_) <= 1).mean()
                print(f"  {name}: off-by<=1 {frac:.4f}", flush=True)
            else:
                err = (np.abs(a - b_) / (np.abs(a) + 1e-3)).max()
                print(f"  {name}: max rel err {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
