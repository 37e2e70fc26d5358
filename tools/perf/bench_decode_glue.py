"""Decompose the decode step's non-kernel glue: apply_kv_update, lm_head,
rope/embed — each timed as its own chained jit at b40/T1024 int4 shapes.
The gap this hunts: megakernel floor 18.5 ms/step vs ~26.1 ms e2e step
(runs/onchip/pf_timing_r5.log) = ~7.6 ms of per-step glue."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import jax, jax.numpy as jnp, numpy as np
from mmor_tpu.config import LlamaConfig
from mmor_tpu.ops import mega_decode as md
from mmor_tpu.ops.quantized_matmul import pack_int8_rows, quantize_weights

L, B, T, H, DH, D, VOCAB = 32, 40, 1024, 32, 128, 4096, 32000
big = 2 ** 30
key = jax.random.PRNGKey(0); ks = jax.random.split(key, 8)
cache = dict(
    k=jax.random.randint(ks[0], (L, B, H, DH // 4, T // 2), -big, big, jnp.int32),
    v=jax.random.randint(ks[1], (L, B, H, T // 8, DH), -big, big, jnp.int32),
    k_s=jnp.full((L, H, B, T), 0.02, jnp.bfloat16),
    v_s=jnp.full((L, H, B, T), 0.02, jnp.bfloat16),
    kv_mask=jnp.zeros((B, T), jnp.int32),
    write_pos=jnp.asarray(900, jnp.int32),
    tok_pos=jnp.full((B,), 900, jnp.int32),
)
knew = jax.random.randint(ks[2], (L, B, H, DH), -127, 128, jnp.int8)
vnew = jax.random.randint(ks[3], (L, B, H, DH), -127, 128, jnp.int8)
sn = jnp.full((L, B, H), 0.01, jnp.float32)

def timeit(name, fn, *args, donate=(), reps=20):
    jfn = jax.jit(fn, donate_argnums=donate)
    out = jfn(*args)
    jax.tree.map(lambda a: np.asarray(a) if hasattr(a, 'shape') else a,
                 out)
    # donated args: refresh copies per call outside timing when donating --
    # here we time WITHOUT donation-safe reuse by re-passing outputs
    t0 = time.perf_counter()
    cur = args
    for _ in range(reps):
        out = jfn(*cur)
        if donate:
            cur = (out,) + args[1:]
    jax.tree.map(lambda a: np.asarray(a) if hasattr(a, 'shape') else a, out)
    dt = (time.perf_counter() - t0) / reps
    print(f'{name}: {dt*1e3:.2f} ms', flush=True)
    return dt

# 1. full apply_kv_update (donated cache)
timeit('apply_kv_update (int4 col RMW)',
       lambda c: md.apply_kv_update(c, knew, sn, vnew, sn), cache,
       donate=(0,))

# 2. lm_head: int8 packed matmul (40, 4096) x (4096, 32000)
hq, hs = quantize_weights(jax.random.normal(ks[4], (D, VOCAB)) * 0.02)
wp, sc = pack_int8_rows(hq), hs
x = jax.random.normal(ks[5], (B, D), jnp.bfloat16)
from mmor_tpu.ops.quantized_matmul import int8_matmul_packed
def lm(x):
    lg = int8_matmul_packed(x, wp, sc, int8_mxu=True)
    return jnp.argmax(lg, axis=-1)
timeit('lm_head+argmax', lm, x)

# 3. rope + embed + xt assembly cost
emb = (jax.random.normal(ks[6], (VOCAB, D)) * 0.02).astype(jnp.bfloat16)
tok = jnp.zeros((B,), jnp.int32)
def prep(tok, tp):
    x = jnp.take(emb, tok, axis=0)
    cos, sin = md.rope_tables(tp, DH, 10000.0)
    return x.sum() + cos.sum() + sin.sum()
timeit('embed+rope', prep, tok, cache['tok_pos'])
