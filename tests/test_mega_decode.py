"""Whole-decode-step megakernel: tapes, reference numerics, kernel parity.

Layers of insurance (ops/mega_decode.py):

1. tape build/untile roundtrip is lossless (pure relayout of packed int8);
2. the XLA reference emulation agrees with the EXISTING serving path
   (fused+quantized LlamaModel decode step) to quantization tolerance —
   pins RoPE convention, cache semantics, scale plumbing against an
   independent implementation;
3. the pallas kernel (interpret mode on CPU) matches the XLA reference —
   pins the grid/phase/index-map machinery bit-for-bit-ish (f32 order).
   On the chip the same comparison runs in tests/tpu/run_tpu_checks.py.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.config import LlamaConfig
from mmor_tpu.ops import mega_decode as md
from mmor_tpu.ops.quantized_matmul import pack_int8_rows, quantize_weights

CFG = LlamaConfig(
    vocab_size=128, dim=256, n_layers=2, n_heads=4, n_kv_heads=4,
    ffn_dim=256, max_seq_len=128, dtype=jnp.bfloat16,
    param_dtype=jnp.bfloat16, weight_quant=True, kv_quant=True,
    fused_qkv=True,
)
GEO = md.MegaGeometry.from_config(CFG, batch=3, t_cap=64, ck=128, bna=256,
                                  bnb=128, g=2)


def _random_blocks(key, cfg: LlamaConfig):
    """Random quantized fused blocks tree (stacked (L, K/4, N) w_p)."""
    ks = jax.random.split(key, 6)
    l, d, f = cfg.n_layers, cfg.dim, cfg.ffn_dim
    qw = cfg.n_heads * cfg.head_dim

    def q(key, k_in, n):
        w = jax.random.normal(key, (l, k_in, n)) * 0.05
        wq, sc = jax.vmap(quantize_weights)(w)
        return {"w_p": jax.vmap(pack_int8_rows)(wq), "scale": sc}

    return {
        "qkv_proj": q(ks[0], d, 3 * qw),
        "o_proj": q(ks[1], qw, d),
        "gate_up_proj": q(ks[2], d, 2 * f),
        "down_proj": q(ks[3], f, d),
        "attn_norm": {"scale": 1.0 + 0.1 * jax.random.normal(ks[4], (l, d))},
        "mlp_norm": {"scale": 1.0 + 0.1 * jax.random.normal(ks[5], (l, d))},
    }


def _random_cache(key, geo: md.MegaGeometry, prefix: int):
    """Cache stacks with `prefix` valid positions of quantized random KV."""
    from mmor_tpu.models.llama import quantize_kv

    ks = jax.random.split(key, 2)
    l, b, h, dh, t = (geo.n_layers, geo.batch, geo.n_heads, geo.head_dim,
                      geo.t_cap)
    kf = jax.random.normal(ks[0], (l, b, h, t, dh)) * 0.3
    vf = jax.random.normal(ks[1], (l, b, h, t, dh)) * 0.3
    k_p, k_s = quantize_kv(kf)                      # D-packed
    v_p, v_s = md.quantize_kv_tmajor(vf)            # T-packed
    # mega cache scales live (L, H, B, T)
    k_s = k_s.transpose(0, 2, 1, 3)
    v_s = v_s.transpose(0, 2, 1, 3)
    mask = (jnp.arange(t)[None, :] < prefix).astype(jnp.int32)
    return dict(
        k=k_p, k_s=k_s, v=v_p, v_s=v_s,
        kv_mask=jnp.broadcast_to(mask, (b, t)),
        write_pos=jnp.asarray(prefix, jnp.int32),
        tok_pos=jnp.full((b,), prefix, jnp.int32),
    )


def _random_int4_blocks(key, cfg: LlamaConfig, geo: md.MegaGeometry):
    """Random int4-quantized fused blocks (per-(geo.ck, channel) scales)."""
    from mmor_tpu.ops.quantized_matmul import (pack_int4_rows,
                                               quantize_weights_int4)

    ks = jax.random.split(key, 6)
    l, d, f = cfg.n_layers, cfg.dim, cfg.ffn_dim
    qw = cfg.n_heads * cfg.head_dim

    def q4(key, k_in, n):
        w = jax.random.normal(key, (l, k_in, n)) * 0.02
        wq, sc = jax.vmap(
            lambda x: quantize_weights_int4(x, group=geo.ck))(w)
        return {"w_p": jax.vmap(
                    lambda x: pack_int4_rows(x, block=geo.ck))(wq),
                "scale": sc}

    return {
        "qkv_proj": q4(ks[0], d, 3 * qw),
        "o_proj": q4(ks[1], qw, d),
        "gate_up_proj": q4(ks[2], d, 2 * f),
        "down_proj": q4(ks[3], f, d),
        "attn_norm": {"scale": 1.0 + 0.1 * jax.random.normal(ks[4], (l, d))},
        "mlp_norm": {"scale": 1.0 + 0.1 * jax.random.normal(ks[5], (l, d))},
    }


def _random_int4_cache(key, geo: md.MegaGeometry, prefix: int):
    """T-halved nibble cache stacks with `prefix` valid positions."""
    ks = jax.random.split(key, 2)
    l, b, h, dh, t = (geo.n_layers, geo.batch, geo.n_heads, geo.head_dim,
                      geo.t_cap)
    kf = jax.random.normal(ks[0], (l, b, h, t, dh)) * 0.5
    vf = jax.random.normal(ks[1], (l, b, h, t, dh)) * 0.5
    kq, k_s = md.quantize_k_int4(kf)
    vq, v_s = md.quantize_v_int4(vf)
    return dict(
        k=kq, k_s=k_s.transpose(0, 2, 1, 3),
        v=vq, v_s=v_s.transpose(0, 2, 1, 3),
        kv_mask=jnp.broadcast_to(
            (jnp.arange(t)[None] < prefix).astype(jnp.int32), (b, t)),
        write_pos=jnp.asarray(prefix, jnp.int32),
        tok_pos=jnp.full((b,), prefix, jnp.int32),
    )


@pytest.fixture(scope="module")
def setup():
    blocks = _random_blocks(jax.random.PRNGKey(0), CFG)
    tapes = md.build_tapes(blocks, GEO)
    cache = _random_cache(jax.random.PRNGKey(1), GEO, prefix=10)
    x = jax.random.normal(jax.random.PRNGKey(2), (GEO.batch, GEO.dim),
                          jnp.bfloat16) * 0.5
    cos, sin = md.rope_tables(cache["tok_pos"], GEO.head_dim, CFG.rope_theta)
    return blocks, tapes, cache, x, cos, sin


def test_tape_roundtrip(setup):
    blocks, tapes, *_ = setup
    un = md.untile_tapes(tapes, GEO)
    np.testing.assert_array_equal(np.asarray(un["qkv_proj"][0]),
                                  np.asarray(blocks["qkv_proj"]["w_p"]))
    np.testing.assert_array_equal(np.asarray(un["o_proj"][0]),
                                  np.asarray(blocks["o_proj"]["w_p"]))
    np.testing.assert_array_equal(np.asarray(un["down_proj"][0]),
                                  np.asarray(blocks["down_proj"]["w_p"]))
    # gate_up roundtrips through the interleaved layout
    gw, gs = md.interleave_gate_up(
        blocks["gate_up_proj"]["w_p"][0], blocks["gate_up_proj"]["scale"][0],
        ffn=GEO.ffn, half=GEO.bna // 2)
    np.testing.assert_array_equal(
        np.asarray(un["gate_up_interleaved"][0][0]), np.asarray(gw))
    np.testing.assert_allclose(
        np.asarray(un["gate_up_interleaved"][1][0]), np.asarray(gs))
    np.testing.assert_allclose(np.asarray(un["qkv_proj"][1]),
                               np.asarray(blocks["qkv_proj"]["scale"]))


def test_v_tmajor_roundtrip():
    v = jax.random.randint(jax.random.PRNGKey(0), (2, 3, 16, 8), -127, 128,
                           jnp.int8)
    packed = md.pack_v_tmajor(v)
    assert packed.shape == (2, 3, 4, 8)
    np.testing.assert_array_equal(np.asarray(md.unpack_v_tmajor(packed)),
                                  np.asarray(v))


def test_reference_matches_existing_serving_path(setup):
    """The mega arithmetic chain vs the current unfused serving step
    (QuantDense + packed KV decode attention) — same weights, same cache
    content, tolerance = activation-quantization noise."""
    from mmor_tpu.models.llama import LlamaModel

    blocks, tapes, cache, x, cos, sin = setup
    x_ref, knew, knew_s, vnew, vnew_s = md.mega_decode_layers_reference(
        x, tapes, cache, cos, sin, GEO, eps=CFG.norm_eps)

    # existing path: build a LlamaModel decode step over the same state
    model = LlamaModel(CFG)
    from mmor_tpu.ops.attention import unpack_kv_heads

    # convert the mega cache (v T-packed) to the old layout (v D-packed)
    from mmor_tpu.ops.attention import pack_kv_heads

    v8 = md.unpack_v_tmajor(cache["v"])  # (L,B,H,T,dh) int8
    old_cache = dict(
        k=cache["k"], k_s=cache["k_s"].transpose(0, 2, 1, 3),
        v=pack_kv_heads(v8), v_s=cache["v_s"].transpose(0, 2, 1, 3),
        kv_mask=cache["kv_mask"], write_pos=cache["write_pos"],
        tok_pos=cache["tok_pos"],
    )
    params = {"params": {
        "blocks": {
            "qkv_proj": {"w_p": blocks["qkv_proj"]["w_p"],
                         "scale": blocks["qkv_proj"]["scale"]},
            "o_proj": {"w_p": blocks["o_proj"]["w_p"],
                       "scale": blocks["o_proj"]["scale"]},
            "gate_up_proj": {"w_p": blocks["gate_up_proj"]["w_p"],
                             "scale": blocks["gate_up_proj"]["scale"]},
            "down_proj": {"w_p": blocks["down_proj"]["w_p"],
                          "scale": blocks["down_proj"]["scale"]},
            "attn_norm": {"scale": blocks["attn_norm"]["scale"]},
            "mlp_norm": {"scale": blocks["mlp_norm"]["scale"]},
        },
        "embed_tokens": {"embedding": jnp.zeros((CFG.vocab_size, CFG.dim))},
        "final_norm": {"scale": jnp.ones((CFG.dim,))},
        "lm_head": {"w_p": jnp.zeros((CFG.dim // 4, CFG.vocab_size),
                                     jnp.int32),
                    "scale": jnp.ones((CFG.vocab_size,))},
    }}
    # run the blocks only: feed embeds directly, read back pre-norm hidden
    # via logits of an identity-ish head is awkward — instead compare the
    # new-KV columns (pure per-layer function of the SAME x) and the final
    # hidden through the full scan.
    logits, new_cache = model.apply(
        params, input_embeds=x[:, None, :].astype(jnp.bfloat16),
        attention_mask=jnp.ones((GEO.batch, 1), jnp.int32),
        positions=cache["tok_pos"][:, None], cache=old_cache)

    # the cache column written by the old path at write_pos vs mega's knew
    wp = int(cache["write_pos"])
    k_col = unpack_kv_heads(new_cache["k"])[..., wp, :]  # (L,B,H,dh) int8
    got = np.asarray(knew, np.int32)
    want = np.asarray(k_col, np.int32)
    # int8 quantization of near-identical floats: allow off-by-one counts
    close = np.abs(got - want) <= 1
    assert close.mean() > 0.97, f"k column mismatch {1 - close.mean():.4f}"
    ks_col = np.asarray(new_cache["k_s"][..., wp], np.float32)
    np.testing.assert_allclose(np.asarray(knew_s), ks_col, rtol=0.05,
                               atol=1e-5)


def test_kernel_interpret_matches_reference(setup):
    blocks, tapes, cache, x, cos, sin = setup
    ref = md.mega_decode_layers_reference(x, tapes, cache, cos, sin, GEO,
                                          eps=CFG.norm_eps)
    got = md.mega_decode_layers(x, tapes, cache, cos, sin, GEO,
                                eps=CFG.norm_eps, interpret=True)
    names = ["x", "knew", "knew_s", "vnew", "vnew_s"]
    for name, a, b_ in zip(names, ref, got):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        if name in ("knew", "vnew"):  # int8 rounding: off-by-one tolerated
            assert (np.abs(a - b_) <= 1).mean() > 0.97, name
        else:
            np.testing.assert_allclose(b_, a, rtol=0.03, atol=0.03,
                                       err_msg=name)


def test_apply_kv_update_roundtrip(setup):
    blocks, tapes, cache, x, cos, sin = setup
    ref = md.mega_decode_layers_reference(x, tapes, cache, cos, sin, GEO,
                                          eps=CFG.norm_eps)
    _, knew, knew_s, vnew, vnew_s = ref
    new_cache = md.apply_kv_update(cache, knew, knew_s, vnew, vnew_s)
    wp = int(cache["write_pos"])
    from mmor_tpu.ops.attention import unpack_kv_heads

    k_col = unpack_kv_heads(new_cache["k"])[..., wp, :]
    np.testing.assert_array_equal(np.asarray(k_col), np.asarray(knew))
    v_col = md.unpack_v_tmajor(new_cache["v"])[..., wp, :]
    np.testing.assert_array_equal(np.asarray(v_col), np.asarray(vnew))
    # neighbours in the packed V word untouched
    v_prev = md.unpack_v_tmajor(new_cache["v"])[..., wp - 1, :]
    v_prev_old = md.unpack_v_tmajor(cache["v"])[..., wp - 1, :]
    np.testing.assert_array_equal(np.asarray(v_prev), np.asarray(v_prev_old))
    assert int(new_cache["write_pos"]) == wp + 1
    assert bool(jnp.all(new_cache["kv_mask"][:, wp] == 1))


def test_mega_generate_stepwise_matches_plain(tmp_path):
    """End-to-end: tiny MM2SG with mega_decode=True through
    generate_stepwise (reference fallback on CPU) produces the same greedy
    tokens as the plain bf16 path — the engine-level insurance that the
    megakernel serving wiring (prefill T-packed V cache, MegaServer loop,
    cache updates) is sound."""
    import dataclasses

    from mmor_tpu.config import MM2SGConfig
    from mmor_tpu.models.mm2sg import MM2SG, generate_stepwise
    from mmor_tpu.models.llama import fuse_llama_params, quantize_llama_params

    cfg0 = MM2SGConfig.tiny()
    # mega needs MHA + fused + quantized; tiny() already is MHA
    b, t = 2, 16
    size = cfg0.vision.image_size
    key = jax.random.PRNGKey(0)
    batch = {
        "input_ids": jax.random.randint(key, (b, t), 3,
                                        cfg0.llama.vocab_size),
        "attention_mask": jnp.ones((b, t), jnp.int32),
        "images": jax.random.normal(key, (b, cfg0.pooler.max_views, size,
                                          size, 3)),
        "view_mask": jnp.ones((b, cfg0.pooler.max_views), jnp.int32),
        "audio_embedding": jnp.zeros((b, cfg0.pooler.audio_dim)),
    }
    batch["input_ids"] = batch["input_ids"].at[:, 2].set(-200)
    model0 = MM2SG(cfg0)
    params0 = model0.init(
        jax.random.PRNGKey(1), batch["input_ids"], batch["attention_mask"],
        batch["images"], batch["view_mask"],
        audio_embedding=batch["audio_embedding"],
    )

    n_new = 12
    cache_len = 64
    ref_tokens, _ = generate_stepwise(
        model0, params0, batch, max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1)

    qcfg = dataclasses.replace(
        cfg0, llama=dataclasses.replace(
            cfg0.llama, weight_quant=True, kv_quant=True, fused_qkv=True,
            mega_decode=True))
    lm = params0["params"]["language_model"]
    lm_q = quantize_llama_params(
        fuse_llama_params({"params": lm}))["params"]
    qparams = {"params": dict(params0["params"], language_model=lm_q)}
    qmodel = MM2SG(qcfg)
    mega_tokens, bufs = generate_stepwise(
        qmodel, qparams, batch, max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1)
    assert bufs is not None  # recycled mega-layout cache buffers
    assert bufs[2].shape[-2:] == (cache_len // 4, qcfg.llama.head_dim), \
        "recycled V buffers must be T-packed"
    assert mega_tokens.shape == ref_tokens.shape
    # untrained-net argmaxes are tie-fragile under quantization; require the
    # FIRST token (prefill argmax, identical math) to agree and the stream
    # to be deterministic. Token-level agreement at depth is pinned on a
    # TRAINED model in test_generation_parity.py::test_mega_*.
    np.testing.assert_array_equal(np.asarray(mega_tokens[:, 0]),
                                  np.asarray(ref_tokens[:, 0]))
    again, _ = generate_stepwise(
        qmodel, qparams, batch, max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1, cache_buffers=bufs)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(mega_tokens))


def test_mega_int4_kernel_matches_reference():
    """wbits=4 megakernel (biased-nibble tapes, per-(ck, channel) scales)
    vs its reference at a ck=256 interpret geometry — the int4 analogue of
    test_mega_kernel_matches_reference; quality itself is gated by
    tests/test_generation_parity.py::test_int4_*."""
    cfg = LlamaConfig(
        vocab_size=128, dim=512, n_layers=1, n_heads=4, n_kv_heads=4,
        ffn_dim=1024, max_seq_len=64, dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16, weight_quant=True, kv_quant=True,
        fused_qkv=True, weight_bits=4, weight_group=256,
    )
    geo = md.MegaGeometry.from_config(cfg, batch=8, t_cap=32)
    assert geo.wbits == 4 and geo.ck == 256
    blocks = _random_int4_blocks(jax.random.PRNGKey(7), cfg, geo)
    tapes = md.build_tapes(blocks, geo)
    cache = _random_cache(jax.random.PRNGKey(8), geo, prefix=24)
    x = jax.random.normal(jax.random.PRNGKey(9), (geo.batch, cfg.dim),
                          jnp.bfloat16) * 0.3
    cos, sin = md.rope_tables(cache["tok_pos"], cfg.head_dim, cfg.rope_theta)

    got = md.mega_decode_layers(x, tapes, cache, cos, sin, geo,
                                interpret=True)
    ref = md.mega_decode_layers_reference(x, tapes, cache, cos, sin, geo)
    for name, a, b in zip(["x", "knew", "knew_s", "vnew", "vnew_s"],
                          ref, got):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if name in ("knew", "vnew"):
            assert (np.abs(a - b) <= 1).mean() == 1.0, name
        else:
            l2 = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
            assert l2 < 0.02, (name, l2)


def test_mega_int4kv_kernel_matches_reference():
    """kv_bits=4 (T-halved nibble cache) through the KERNEL's attention
    phase (interpret mode) vs the reference — the e2e int4-KV test runs
    the reference fallback, so without this the kernel's nibble-unpack
    attention path would only ever execute on real hardware."""
    cfg = LlamaConfig(
        vocab_size=128, dim=512, n_layers=2, n_heads=4, n_kv_heads=4,
        ffn_dim=1024, max_seq_len=64, dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16, weight_quant=True, kv_quant=True,
        fused_qkv=True, weight_bits=4, kv_bits=4, weight_group=256,
    )
    geo = md.MegaGeometry.from_config(cfg, batch=8, t_cap=64)
    assert geo.wbits == 4 and geo.kvbits == 4
    blocks = _random_int4_blocks(jax.random.PRNGKey(9), cfg, geo)
    tapes = md.build_tapes(blocks, geo)
    cache = _random_int4_cache(jax.random.PRNGKey(10), geo,
                               prefix=geo.t_cap - 8)
    x = jax.random.normal(jax.random.PRNGKey(11), (geo.batch, cfg.dim),
                          jnp.bfloat16) * 0.3
    cos, sin = md.rope_tables(cache["tok_pos"], cfg.head_dim, cfg.rope_theta)

    got = md.mega_decode_layers(x, tapes, cache, cos, sin, geo,
                                interpret=True)
    ref = md.mega_decode_layers_reference(x, tapes, cache, cos, sin, geo)
    for name, a, b2 in zip(["x", "knew", "knew_s", "vnew", "vnew_s"],
                           ref, got):
        a = np.asarray(a, np.float32)
        b2 = np.asarray(b2, np.float32)
        if name in ("knew", "vnew"):
            assert (np.abs(a - b2) <= 1).mean() == 1.0, name
        else:
            l2 = np.linalg.norm(a - b2) / (np.linalg.norm(a) + 1e-9)
            assert l2 < 0.02, (name, l2)


def test_mega_nkc4_nkb2_geometry_matches_reference():
    """nkc=4, qb=2, nkb=2 — the 7B tile-count walk (4 K-chunks per dim,
    TWO k/v output blocks in the qkv phase). No other interpret test hits
    nkb>1; the kv_new/kv_new_v output maps and the multi-block q|k|v
    finish only diverge from nkb=1 here."""
    cfg = LlamaConfig(
        vocab_size=128, dim=1024, n_layers=2, n_heads=8, n_kv_heads=8,
        ffn_dim=1024, max_seq_len=64, dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16, weight_quant=True, kv_quant=True,
        fused_qkv=True,
    )
    geo = md.MegaGeometry.from_config(cfg, batch=8, t_cap=64, ck=256,
                                      bna=512, bnb=256, g=2)
    assert geo.nkc == 4 and geo.q_width // geo.bna == 2
    blocks = _random_blocks(jax.random.PRNGKey(21), cfg)
    tapes = md.build_tapes(blocks, geo)
    cache = _random_cache(jax.random.PRNGKey(22), geo, prefix=40)
    x = jax.random.normal(jax.random.PRNGKey(23), (geo.batch, geo.dim),
                          jnp.bfloat16) * 0.5
    cos, sin = md.rope_tables(cache["tok_pos"], cfg.head_dim, cfg.rope_theta)

    got = md.mega_decode_layers(x, tapes, cache, cos, sin, geo,
                                interpret=True)
    ref = md.mega_decode_layers_reference(x, tapes, cache, cos, sin, geo)
    for name, a, b2 in zip(["x", "knew", "knew_s", "vnew", "vnew_s"],
                           ref, got):
        a = np.asarray(a, np.float32)
        b2 = np.asarray(b2, np.float32)
        if name in ("knew", "vnew"):
            # layer-2 quantized KV inherits layer-1 x's legitimate
            # quantization-order noise: a few bins land 2 apart
            assert (np.abs(a - b2) <= 1).mean() > 0.99, name
        else:
            l2 = np.linalg.norm(a - b2) / (np.linalg.norm(a) + 1e-9)
            assert l2 < 0.02, (name, l2)


def test_mega_b40_bp64_geometry_matches_reference():
    """batch=40 — the bench ladder's first rung geometry: bp pads 40->64
    (the >32-sublane padding path) and attention walks rg=8 row-groups,
    nb8=5 per head. int4 W + int4 KV, interpret mode vs the reference."""
    cfg = LlamaConfig(
        vocab_size=128, dim=512, n_layers=1, n_heads=4, n_kv_heads=4,
        ffn_dim=1024, max_seq_len=64, dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16, weight_quant=True, kv_quant=True,
        fused_qkv=True, weight_bits=4, kv_bits=4, weight_group=256,
    )
    geo = md.MegaGeometry.from_config(cfg, batch=40, t_cap=64)
    assert geo.bp == 64 and geo.rg == 8 and geo.nb8 == 5
    blocks = _random_int4_blocks(jax.random.PRNGKey(13), cfg, geo)
    tapes = md.build_tapes(blocks, geo)
    cache = _random_int4_cache(jax.random.PRNGKey(14), geo,
                               prefix=geo.t_cap - 8)
    x = jax.random.normal(jax.random.PRNGKey(15), (geo.batch, cfg.dim),
                          jnp.bfloat16) * 0.3
    cos, sin = md.rope_tables(cache["tok_pos"], cfg.head_dim, cfg.rope_theta)

    got = md.mega_decode_layers(x, tapes, cache, cos, sin, geo,
                                interpret=True)
    ref = md.mega_decode_layers_reference(x, tapes, cache, cos, sin, geo)
    for name, a, b2 in zip(["x", "knew", "knew_s", "vnew", "vnew_s"],
                           ref, got):
        a = np.asarray(a, np.float32)
        b2 = np.asarray(b2, np.float32)
        if name in ("knew", "vnew"):
            assert (np.abs(a - b2) <= 1).mean() == 1.0, name
        else:
            l2 = np.linalg.norm(a - b2) / (np.linalg.norm(a) + 1e-9)
            assert l2 < 0.02, (name, l2)


def test_int4_kv_pack_unpack_and_update():
    """int4 KV packers roundtrip and apply_kv_update merges a decode
    column into the T-halved nibble cache exactly."""
    key = jax.random.PRNGKey(3)
    l, b, h, t, dh = 2, 3, 4, 16, 8
    kf = jax.random.normal(key, (l, b, h, t, dh)) * 0.5
    vf = jax.random.normal(jax.random.PRNGKey(4), (l, b, h, t, dh)) * 0.5
    kq, ks = md.quantize_k_int4(kf)
    vq, vs = md.quantize_v_int4(vf)
    ku = md.unpack_k_int4(kq, t)
    vu = md.unpack_v_int4(vq, t)
    # exact pack/unpack roundtrip against the quantizer's own int values
    # (an independent numpy re-quantization differs on f32 rounding ties)
    uk, _ = md._quantize_int4_pos(kf)
    uv, _ = md._quantize_int4_pos(vf)
    np.testing.assert_array_equal(np.asarray(ku),
                                  np.asarray(uk, np.int32) - 8)
    np.testing.assert_array_equal(np.asarray(vu),
                                  np.asarray(uv, np.int32) - 8)

    # column update at both a lo-half and a hi-half position
    for wp in (3, t // 2 + 5):
        cache = dict(
            k=kq, k_s=ks.transpose(0, 2, 1, 3), v=vq,
            v_s=vs.transpose(0, 2, 1, 3),
            kv_mask=jnp.zeros((b, t), jnp.int32),
            write_pos=jnp.asarray(wp, jnp.int32),
            tok_pos=jnp.full((b,), wp, jnp.int32),
        )
        knew = jax.random.randint(jax.random.PRNGKey(wp), (l, b, h, dh),
                                  -127, 128, jnp.int8)
        vnew = jax.random.randint(jax.random.PRNGKey(wp + 9), (l, b, h, dh),
                                  -127, 128, jnp.int8)
        ksn = jnp.full((l, b, h), 0.01, jnp.float32)
        new = md.apply_kv_update(cache, knew, ksn, vnew, ksn)
        ku2 = np.asarray(md.unpack_k_int4(new["k"], t))
        vu2 = np.asarray(md.unpack_v_int4(new["v"], t))
        want_k = np.clip(np.round(np.asarray(knew, np.int32) * 7 / 127),
                         -7, 7)
        want_v = np.clip(np.round(np.asarray(vnew, np.int32) * 7 / 127),
                         -7, 7)
        np.testing.assert_array_equal(ku2[:, :, :, wp, :], want_k)
        np.testing.assert_array_equal(vu2[:, :, :, wp, :], want_v)
        # every other position untouched
        mask = np.ones(t, bool); mask[wp] = False
        np.testing.assert_array_equal(ku2[:, :, :, mask, :],
                                      np.asarray(ku)[:, :, :, mask, :])
        np.testing.assert_array_equal(vu2[:, :, :, mask, :],
                                      np.asarray(vu)[:, :, :, mask, :])
        assert float(new["k_s"][0, 0, 0, wp]) == pytest.approx(
            0.01 * 127 / 7, rel=1e-2)  # cache scales are bf16


def test_mega_generate_stepwise_int4kv(tmp_path):
    """kv_bits=4 end to end through generate_stepwise (reference fallback):
    the int4-capacity prefill, nibble cache updates, and MegaServer loop
    produce a deterministic stream whose first (prefill-argmax) token
    matches bf16."""
    import dataclasses

    from mmor_tpu.config import MM2SGConfig
    from mmor_tpu.models.mm2sg import MM2SG, generate_stepwise
    from mmor_tpu.models.llama import fuse_llama_params, quantize_llama_params

    cfg0 = MM2SGConfig.tiny()
    b, t = 2, 16
    size = cfg0.vision.image_size
    key = jax.random.PRNGKey(0)
    batch = {
        "input_ids": jax.random.randint(key, (b, t), 3,
                                        cfg0.llama.vocab_size),
        "attention_mask": jnp.ones((b, t), jnp.int32),
        "images": jax.random.normal(key, (b, cfg0.pooler.max_views, size,
                                          size, 3)),
        "view_mask": jnp.ones((b, cfg0.pooler.max_views), jnp.int32),
        "audio_embedding": jnp.zeros((b, cfg0.pooler.audio_dim)),
    }
    batch["input_ids"] = batch["input_ids"].at[:, 2].set(-200)
    model0 = MM2SG(cfg0)
    params0 = model0.init(
        jax.random.PRNGKey(1), batch["input_ids"], batch["attention_mask"],
        batch["images"], batch["view_mask"],
        audio_embedding=batch["audio_embedding"],
    )
    n_new = 10
    cache_len = 64
    ref_tokens, _ = generate_stepwise(
        model0, params0, batch, max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1)

    qcfg = dataclasses.replace(
        cfg0, llama=dataclasses.replace(
            cfg0.llama, weight_quant=True, kv_quant=True, fused_qkv=True,
            mega_decode=True, kv_bits=4))
    lm = params0["params"]["language_model"]
    lm_q = quantize_llama_params(
        fuse_llama_params({"params": lm}))["params"]
    qparams = {"params": dict(params0["params"], language_model=lm_q)}
    qmodel = MM2SG(qcfg)
    toks, bufs = generate_stepwise(
        qmodel, qparams, batch, max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1)
    assert bufs is not None
    assert bufs[0].shape[-1] == cache_len // 2, "K must be T-halved int4"
    assert bufs[2].shape[-2] == cache_len // 8, "V must be T-halved int4"
    np.testing.assert_array_equal(np.asarray(toks[:, 0]),
                                  np.asarray(ref_tokens[:, 0]))
    again, _ = generate_stepwise(
        qmodel, qparams, batch, max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1, cache_buffers=bufs)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(toks))


@pytest.mark.parametrize("kv_bits", [8, 4])
def test_mega_generate_stepwise_kernel_interpret(kv_bits):
    """The bench ladder's serving flow with the KERNEL in the loop:
    generate_stepwise -> prefill writes the packed mega cache -> a
    MegaServer whose steps run mega_decode_layers in INTERPRET mode (on
    CPU the default server takes the XLA reference fallback, so without
    this the kernel never decodes e2e off-chip). The kernel stream must
    match the reference-fallback stream token for token — identical
    quantized arithmetic, so only f32 summation order differs."""
    import dataclasses

    from mmor_tpu.config import MM2SGConfig
    from mmor_tpu.models.mm2sg import MM2SG, generate_stepwise
    from mmor_tpu.models.llama import fuse_llama_params, quantize_llama_params

    cfg0 = MM2SGConfig.tiny()
    b, t = 2, 16
    size = cfg0.vision.image_size
    key = jax.random.PRNGKey(0)
    batch = {
        "input_ids": jax.random.randint(key, (b, t), 3,
                                        cfg0.llama.vocab_size),
        "attention_mask": jnp.ones((b, t), jnp.int32),
        "images": jax.random.normal(key, (b, cfg0.pooler.max_views, size,
                                          size, 3)),
        "view_mask": jnp.ones((b, cfg0.pooler.max_views), jnp.int32),
        "audio_embedding": jnp.zeros((b, cfg0.pooler.audio_dim)),
    }
    batch["input_ids"] = batch["input_ids"].at[:, 2].set(-200)
    model0 = MM2SG(cfg0)
    params0 = model0.init(
        jax.random.PRNGKey(1), batch["input_ids"], batch["attention_mask"],
        batch["images"], batch["view_mask"],
        audio_embedding=batch["audio_embedding"],
    )
    qcfg = dataclasses.replace(
        cfg0, llama=dataclasses.replace(
            cfg0.llama, weight_quant=True, kv_quant=True, fused_qkv=True,
            mega_decode=True, kv_bits=kv_bits))
    lm = params0["params"]["language_model"]
    lm_q = quantize_llama_params(
        fuse_llama_params({"params": lm}))["params"]
    qparams = {"params": dict(params0["params"], language_model=lm_q)}
    qmodel = MM2SG(qcfg)
    n_new, cache_len = 10, 64

    ref_toks, _ = generate_stepwise(
        qmodel, qparams, batch, max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1)

    class InterpServer(md.MegaServer):
        def step_for(self, batch_, t_cap):
            key_ = (batch_, t_cap)
            if key_ not in self._steps:
                geo = md.MegaGeometry.from_config(self.cfg, batch=batch_,
                                                  t_cap=t_cap)
                self._steps[key_] = md.make_mega_decode_step(
                    self.cfg, geo, interpret=True)
            return self._steps[key_]

    server = InterpServer(qcfg.llama,
                          {"params": qparams["params"]["language_model"]})
    kern_toks, _ = generate_stepwise(
        qmodel, qparams, batch, max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1, step_fn=server)
    np.testing.assert_array_equal(np.asarray(kern_toks),
                                  np.asarray(ref_toks))


@pytest.mark.parametrize("batch,rg,nb8", [(48, 24, 2), (64, 32, 2)])
def test_mega_b48_b64_geometry_matches_reference(batch, rg, nb8):
    """Ladder-extension geometries for the 4.65 f/s push: b48 (rg=24,
    nb8=2) and b64 (rg=32) walk FATTER attention row-groups than b40's
    rg=8 x 5 — fewer fixed-cost grid steps per token. int4 W + int4 KV,
    interpret vs the reference."""
    cfg = LlamaConfig(
        vocab_size=128, dim=512, n_layers=1, n_heads=4, n_kv_heads=4,
        ffn_dim=1024, max_seq_len=64, dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16, weight_quant=True, kv_quant=True,
        fused_qkv=True, weight_bits=4, kv_bits=4, weight_group=256,
    )
    geo = md.MegaGeometry.from_config(cfg, batch=batch, t_cap=64)
    assert geo.rg == rg and geo.nb8 == nb8 and geo.bp == 64
    blocks = _random_int4_blocks(jax.random.PRNGKey(31), cfg, geo)
    tapes = md.build_tapes(blocks, geo)
    cache = _random_int4_cache(jax.random.PRNGKey(32), geo,
                               prefix=geo.t_cap - 8)
    x = jax.random.normal(jax.random.PRNGKey(33), (geo.batch, cfg.dim),
                          jnp.bfloat16) * 0.3
    cos, sin = md.rope_tables(cache["tok_pos"], cfg.head_dim, cfg.rope_theta)

    got = md.mega_decode_layers(x, tapes, cache, cos, sin, geo,
                                interpret=True)
    ref = md.mega_decode_layers_reference(x, tapes, cache, cos, sin, geo)
    for name, a, b2 in zip(["x", "knew", "knew_s", "vnew", "vnew_s"],
                           ref, got):
        a = np.asarray(a, np.float32)
        b2 = np.asarray(b2, np.float32)
        if name in ("knew", "vnew"):
            assert (np.abs(a - b2) <= 1).mean() == 1.0, name
        else:
            l2 = np.linalg.norm(a - b2) / (np.linalg.norm(a) + 1e-9)
            assert l2 < 0.02, (name, l2)


def test_mega_eos_compaction_matches_lockstep():
    """Per-sequence EOS early-exit (batch compaction): finished rows drop
    out of the decode walk and the survivors' tokens stay IDENTICAL to the
    uncompacted lockstep walk (the kernel is row-independent). The
    reference can only stop when the whole batch finishes."""
    import dataclasses

    from mmor_tpu.config import MM2SGConfig
    from mmor_tpu.models.llama import fuse_llama_params, quantize_llama_params
    from mmor_tpu.models.mm2sg import (
        MM2SG,
        alloc_cache_buffers,
        make_prefill,
    )

    cfg0 = MM2SGConfig.tiny()
    qcfg = dataclasses.replace(
        cfg0, llama=dataclasses.replace(
            cfg0.llama, weight_quant=True, kv_quant=True, fused_qkv=True,
            mega_decode=True))
    b, t, n_new, cache_len = 16, 16, 12, 64
    size = cfg0.vision.image_size
    key = jax.random.PRNGKey(0)
    # two distinct rows tiled x8: identical rows emit identical streams, so
    # row 0's EOS retires a whole 8-row bucket and compaction must fire
    batch = {
        "input_ids": jnp.repeat(
            jax.random.randint(key, (2, t), 3, cfg0.llama.vocab_size),
            8, axis=0),
        "attention_mask": jnp.ones((b, t), jnp.int32),
        "images": jnp.repeat(
            jax.random.normal(key, (2, cfg0.pooler.max_views, size,
                                    size, 3)), 8, axis=0),
        "view_mask": jnp.ones((b, cfg0.pooler.max_views), jnp.int32),
    }
    batch["input_ids"] = batch["input_ids"].at[:, 2].set(-200)
    model0 = MM2SG(cfg0)
    params0 = model0.init(
        jax.random.PRNGKey(1), batch["input_ids"], batch["attention_mask"],
        batch["images"], batch["view_mask"])
    lm_q = quantize_llama_params(
        fuse_llama_params({"params": params0["params"]["language_model"]})
    )["params"]
    qparams = {"params": dict(params0["params"], language_model=lm_q)}
    qmodel = MM2SG(qcfg)

    prefill = make_prefill(qmodel, max_cache_len=cache_len)
    server = md.MegaServer(qcfg.llama,
                           {"params": qparams["params"]["language_model"]})

    def decode(eos, **kw):
        bufs = alloc_cache_buffers(qcfg, b, cache_len)
        logits, cache = prefill(qparams, batch, bufs)
        toks, _ = md.greedy_decode_hostloop_mega(
            server, logits, cache, n_new, eos_token_id=eos, **kw)
        return np.asarray(toks)

    full = decode(-1)
    # pick an EOS some rows emit early: row 0's token at column 3
    eos = int(full[0, 3])
    hit_rows = (full[:, :6] == eos).any(axis=1).sum()
    assert hit_rows >= 1

    # expected = lockstep streams with the tail-fill semantics
    want = full.copy()
    for r in range(b):
        hits = np.nonzero(want[r] == eos)[0]
        if hits.size:
            want[r, hits[0]:] = eos

    got = decode(eos, compact=True, compact_every=4)
    np.testing.assert_array_equal(got, want)
    # compaction really fired: a smaller bucket's step was compiled
    assert any(bk < b for bk, _ in server._steps), server._steps.keys()

    # and with compaction off, the every-compact_every EOS sync still works
    got2 = decode(eos, compact=False, compact_every=4)
    np.testing.assert_array_equal(got2, want)
