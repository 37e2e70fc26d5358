"""Decompose the 65-70 ms/token decode step at b14: weights vs attention vs rest.

Chained timing (x perturbed by the carry) so XLA can't CSE-hoist.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.config import LlamaConfig
from mmor_tpu.ops.attention import decode_attention_packed
from mmor_tpu.ops.quantized_matmul import (
    int8_matmul_packed, pack_int8_rows, quantize_weights,
)

B = int(os.environ.get("BM_B", "14"))
T = int(os.environ.get("BM_T", "1024"))
REPEATS = int(os.environ.get("BM_REPEATS", "20"))
cfg = LlamaConfig(weight_quant=True, kv_quant=True)


def timeit(name, jfn, args, iters=3, per=1):
    np.asarray(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jfn(*args))
    dt = (time.perf_counter() - t0) / iters / REPEATS / per
    print(f"{name:30s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    part = os.environ.get("BM_PART", "weights")
    key = jax.random.PRNGKey(0)
    L, D, H, Dh, F, V = (cfg.n_layers, cfg.dim, cfg.n_heads, cfg.head_dim,
                         cfg.ffn_dim, cfg.vocab_size)
    print(f"B={B} T={T} L={L} part={part}", flush=True)
    if part == "attn":
        attn_part(key, L, H, Dh)
        return

    # --- 2. weight streams alone (7 matmuls x L layers, packed) ---
    shapes = [(D, H * Dh), (D, cfg.n_kv_heads * Dh), (D, cfg.n_kv_heads * Dh),
              (H * Dh, D), (D, F), (D, F), (F, D)]
    ws = []
    for (kin, n) in shapes:
        wq = jax.random.randint(key, (L, kin, n), -127, 128, jnp.int8)
        sc = jnp.full((L, n), 0.01, jnp.float32)
        ws.append((jax.jit(jax.vmap(pack_int8_rows))(wq), sc))
        del wq
    hq = jax.random.randint(key, (D, V), -127, 128, jnp.int8)
    hs = jnp.full((V,), 0.01, jnp.float32)
    hp = jax.jit(pack_int8_rows)(hq)
    del hq

    def weights_once(x, ws, hp, hs):
        h = x
        def layer(h, packed):
            outs = []
            for (wp, sc) in packed:
                o = int8_matmul_packed(h[:, :wp.shape[0] * 4], wp, sc)
                outs.append(o.astype(jnp.float32).sum())
            return (h * (1 + 1e-38 * sum(outs))).astype(h.dtype), None
        h, _ = jax.lax.scan(lambda hh, idx: layer(hh, [(w[0][idx], w[1][idx]) for w in ws]),
                            h, jnp.arange(L))
        o = int8_matmul_packed(h[:, :D], hp, hs)
        return o.astype(jnp.float32).sum()

    xbig = jax.random.normal(key, (B, F), jnp.bfloat16)

    def chained_weights(x, *a):
        def body(i, acc):
            xp = x * (1.0 + acc * 1e-38).astype(x.dtype)
            return weights_once(xp, ws, hp, hs).astype(jnp.float32)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((), jnp.float32))

    timeit("weights only (packed)", jax.jit(chained_weights), (xbig,))


def attn_part(key, L, H, Dh):
    # --- packed decode attention alone, one layer x L repeats ---
    kq = jax.random.randint(key, (B, H, Dh // 4, T), -2**30, 2**30, jnp.int32)
    vq = jax.random.randint(key, (B, H, Dh // 4, T), -2**30, 2**30, jnp.int32)
    ks = jnp.ones((B, H, T), jnp.float32) * 0.01
    vs = jnp.ones((B, H, T), jnp.float32) * 0.01
    kvm = jnp.ones((B, T), jnp.int32)
    q = jax.random.normal(key, (B, H, 1, Dh), jnp.bfloat16)

    def attn_once(q):
        def body(acc, _):
            o = decode_attention_packed(q * (1 + acc * 1e-38), kq, vq, ks, vs, kvm)
            return o.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=L)
        return acc

    def chained_attn(q):
        def body(i, acc):
            return attn_once(q * (1 + acc * 1e-38).astype(q.dtype)).astype(jnp.float32)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((), jnp.float32))

    timeit(f"attention only ({L} layers)", jax.jit(chained_attn), (q,))


if __name__ == "__main__":
    main()
