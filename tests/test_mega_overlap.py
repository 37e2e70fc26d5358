"""Piggyback-prefill (overlap) megakernel tests.

The decode megakernel can carry ``pf_chunk`` consecutive prompt tokens of
ONE stream of the NEXT batch as extra activation rows: they ride the
decode weight walk on the idle MXU (decode is DMA-bound) and take one
extra attention step per head against the stream's working prefill cache.
This is the TPU-native replacement for the reference's strictly serial
prefill -> lockstep-decode serving loop
(`scene_graph_helpers/model/scene_graph_prediction_model.py:219-231`):
instead of dedicating device time to prefill, the next batch's prompt
rides inside the current batch's decode steps.

Kernel-vs-reference parity runs in interpret mode on CPU; the on-chip
analogue lives in tests/tpu/run_tpu_checks.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.config import LlamaConfig
from mmor_tpu.ops import mega_decode as md
from mmor_tpu.ops.quantized_matmul import pack_int8_rows


def _cfg(wbits, kvbits):
    dim = 512 if wbits == 4 else 256
    return LlamaConfig(
        dim=dim, n_layers=2, n_heads=4, n_kv_heads=4, ffn_dim=2 * dim,
        weight_quant=True, kv_quant=True, fused_qkv=True,
        weight_bits=wbits, kv_bits=kvbits, mega_decode=True,
        weight_group=md.MegaGeometry.pick_ck(
            LlamaConfig(dim=dim, n_layers=2, n_heads=4, n_kv_heads=4,
                        ffn_dim=2 * dim)),
    )


def _blocks(key, cfg, geo):
    ks = jax.random.split(key, 4)
    l, d = cfg.n_layers, cfg.dim
    f, qw = cfg.ffn_dim + cfg.ffn_pad, cfg.n_heads * cfg.head_dim

    def q(k, kin, n):
        if cfg.weight_bits == 4:
            from mmor_tpu.ops.quantized_matmul import (pack_int4_rows,
                                                       quantize_weights_int4)

            w = jax.random.normal(k, (l, kin, n)) * 0.05
            wq, sc = jax.vmap(
                lambda x: quantize_weights_int4(x, group=geo.ck))(w)
            return {"w_p": jax.vmap(
                lambda x: pack_int4_rows(x, block=geo.ck))(wq), "scale": sc}
        wq = jax.random.randint(k, (l, kin, n), -50, 50, jnp.int8)
        return {"w_p": jax.vmap(pack_int8_rows)(wq),
                "scale": jnp.full((l, n), 0.01)}

    return {
        "qkv_proj": q(ks[0], d, 3 * qw), "o_proj": q(ks[1], qw, d),
        "gate_up_proj": q(ks[2], d, 2 * f), "down_proj": q(ks[3], f, d),
        "attn_norm": {"scale": jnp.ones((l, d))},
        "mlp_norm": {"scale": jnp.ones((l, d))},
    }


def _decode_cache(key, cfg, b, t):
    ks = jax.random.split(key, 2)
    l, h, dh = cfg.n_layers, cfg.n_heads, cfg.head_dim
    if cfg.kv_bits == 4:
        kq, k_s = md.quantize_k_int4(
            jax.random.normal(ks[0], (l, b, h, t, dh)) * 0.5)
        vq, v_s = md.quantize_v_int4(
            jax.random.normal(ks[1], (l, b, h, t, dh)) * 0.5)
        sdt = jnp.float32
    else:
        from mmor_tpu.models.llama import quantize_kv

        kq, k_s = quantize_kv(jax.random.normal(ks[0], (l, b, h, t, dh)) * 0.5)
        vq, v_s = md.quantize_kv_tmajor(
            jax.random.normal(ks[1], (l, b, h, t, dh)) * 0.5)
        sdt = jnp.bfloat16
    return dict(
        k=kq, k_s=k_s.transpose(0, 2, 1, 3).astype(sdt),
        v=vq, v_s=v_s.transpose(0, 2, 1, 3).astype(sdt),
        kv_mask=jnp.broadcast_to(
            (jnp.arange(t)[None] < t - 8).astype(jnp.int32), (b, t)),
        write_pos=jnp.asarray(t - 8, jnp.int32),
        tok_pos=jnp.full((b,), t - 8, jnp.int32),
    )


def _pf_inputs(key, cfg, c, t2, wp):
    ks = jax.random.split(key, 3)
    l, h, dh = cfg.n_layers, cfg.n_heads, cfg.head_dim
    if cfg.kv_bits == 4:
        k2, k2s = md.quantize_k_int4(
            jax.random.normal(ks[0], (l, h, t2, dh)) * 0.5)
        v2, v2s = md.quantize_v_int4(
            jax.random.normal(ks[1], (l, h, t2, dh)) * 0.5)
    else:
        from mmor_tpu.models.llama import quantize_kv

        k2, k2s = quantize_kv(jax.random.normal(ks[0], (l, h, t2, dh)) * 0.5)
        v2, v2s = md.quantize_kv_tmajor(
            jax.random.normal(ks[1], (l, h, t2, dh)) * 0.5)
    cos, sin = md.rope_tables(jnp.arange(wp, wp + c), dh, cfg.rope_theta)
    return dict(
        x=jax.random.normal(ks[2], (c, cfg.dim), jnp.bfloat16) * 0.3,
        cos=cos, sin=sin,
        amask=jnp.ones((c,), jnp.int32).at[:3].set(0),
        mask=(jnp.arange(t2) < wp).astype(jnp.int32),
        k=k2, k_s=k2s, v=v2, v_s=v2s,
    )


@pytest.mark.parametrize("wbits,kvbits", [(8, 8), (4, 4)])
def test_pf_kernel_matches_reference(wbits, kvbits):
    cfg = _cfg(wbits, kvbits)
    b, t = 8, 64
    c, t2 = 32, 256 if kvbits == 4 else 128
    geo = md.MegaGeometry.from_config(cfg, batch=b, t_cap=t,
                                      pf_chunk=c, pf_t=t2)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    tapes = md.build_tapes(_blocks(ks[0], cfg, geo), geo)
    cache = _decode_cache(ks[1], cfg, b, t)
    pf = _pf_inputs(ks[2], cfg, c, t2, wp=t2 // 4)
    x = jax.random.normal(ks[3], (b, cfg.dim), jnp.bfloat16) * 0.3
    cos, sin = md.rope_tables(cache["tok_pos"], cfg.head_dim, cfg.rope_theta)
    ref = md.mega_decode_layers_reference(x, tapes, cache, cos, sin, geo,
                                          pf=pf)
    got = md.mega_decode_layers(x, tapes, cache, cos, sin, geo, pf=pf,
                                interpret=True)
    names = ["x", "knew", "knew_s", "vnew", "vnew_s"]
    for name, a, bb in zip(names, ref[:5], got[:5]):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        rl2 = np.linalg.norm(a - bb) / (np.linalg.norm(a) + 1e-9)
        assert rl2 < 2e-2, ("decode rows diverged", name, rl2)
    for name in names:
        a = np.asarray(ref[5][name], np.float32)
        bb = np.asarray(got[5][name], np.float32)
        assert a.shape == bb.shape
        rl2 = np.linalg.norm(a - bb) / (np.linalg.norm(a) + 1e-9)
        assert rl2 < 3e-2, ("chunk rows diverged", name, rl2)


def test_pf_decode_rows_unaffected():
    """With pf attached, the DECODE rows' outputs must equal the plain
    (pf-free) kernel's bit for bit in interpret mode: the chunk rows only
    append work, they never touch decode state."""
    cfg = _cfg(4, 4)
    b, t = 8, 64
    geo0 = md.MegaGeometry.from_config(cfg, batch=b, t_cap=t)
    geo1 = md.MegaGeometry.from_config(cfg, batch=b, t_cap=t,
                                       pf_chunk=32, pf_t=256)
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 5)
    tapes = md.build_tapes(_blocks(ks[0], cfg, geo0), geo0)
    cache = _decode_cache(ks[1], cfg, b, t)
    pf = _pf_inputs(ks[2], cfg, 32, 256, wp=64)
    x = jax.random.normal(ks[3], (b, cfg.dim), jnp.bfloat16) * 0.3
    cos, sin = md.rope_tables(cache["tok_pos"], cfg.head_dim, cfg.rope_theta)
    plain = md.mega_decode_layers(x, tapes, cache, cos, sin, geo0,
                                  interpret=True)
    withpf = md.mega_decode_layers(x, tapes, cache, cos, sin, geo1, pf=pf,
                                   interpret=True)
    for name, a, bb in zip(["x", "knew", "knew_s", "vnew", "vnew_s"],
                           plain, withpf[:5]):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(bb, np.float32),
                                      err_msg=name)


def test_bp_extra_rows_are_inert():
    """bp_extra dead rows (the MXU-hiding probe knob) must not change any
    output."""
    cfg = _cfg(8, 8)
    b, t = 8, 64
    geo0 = md.MegaGeometry.from_config(cfg, batch=b, t_cap=t)
    geo1 = md.MegaGeometry.from_config(cfg, batch=b, t_cap=t, bp_extra=64)
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 4)
    tapes = md.build_tapes(_blocks(ks[0], cfg, geo0), geo0)
    cache = _decode_cache(ks[1], cfg, b, t)
    x = jax.random.normal(ks[2], (b, cfg.dim), jnp.bfloat16) * 0.3
    cos, sin = md.rope_tables(cache["tok_pos"], cfg.head_dim, cfg.rope_theta)
    a = md.mega_decode_layers(x, tapes, cache, cos, sin, geo0, interpret=True)
    bb = md.mega_decode_layers(x, tapes, cache, cos, sin, geo1,
                               interpret=True)
    for name, u, v in zip(["x", "knew", "knew_s", "vnew", "vnew_s"], a, bb):
        np.testing.assert_array_equal(np.asarray(u, np.float32),
                                      np.asarray(v, np.float32),
                                      err_msg=name)


def test_pf_prefill_matches_tokenwise_decode_oracle():
    """Semantic anchor for the piggyback prefill: chunked prefill through
    the pf path (work updates -> wave flush -> handoff repack) must build
    the SAME cache (up to requant rounding) as feeding the prompt token by
    token through the plain mega decode path over a growing cache — the
    two walks see identical attention sets and identical quantized
    arithmetic; only the intra-chunk term uses exact (un-requantized) k/v,
    so stored nibbles may ripple by one bin."""
    from mmor_tpu.ops import mega_overlap as mo

    cfg = _cfg(8, 8)
    b, t_cap = 8, 256
    c, t2 = 32, 128
    nc, t_real = t2 // c, t2
    geo_pf = md.MegaGeometry.from_config(cfg, batch=b, t_cap=t_cap,
                                         pf_chunk=c, pf_t=t2)
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 6)
    tapes = md.build_tapes(_blocks(ks[0], cfg, geo_pf), geo_pf)
    dec_cache = _decode_cache(ks[1], cfg, b, t_cap)
    embeds = jax.random.normal(ks[2], (t_real, cfg.dim), jnp.bfloat16) * 0.3
    xdec = jax.random.normal(ks[3], (b, cfg.dim), jnp.bfloat16) * 0.3
    cos, sin = md.rope_tables(dec_cache["tok_pos"], cfg.head_dim,
                              cfg.rope_theta)

    # piggyback side: 4 chunks through the pf path (reference arithmetic)
    work = mo.alloc_pf_work(cfg.llama if hasattr(cfg, "llama") else cfg, t2)
    full = mo.alloc_pf_full(cfg, 1, t2)
    hidden_last = None
    for j in range(nc):
        wp = j * c
        pf = dict(
            x=embeds[wp:wp + c],
            cos=md.rope_tables(jnp.arange(wp, wp + c), cfg.head_dim,
                               cfg.rope_theta)[0],
            sin=md.rope_tables(jnp.arange(wp, wp + c), cfg.head_dim,
                               cfg.rope_theta)[1],
            amask=jnp.ones((c,), jnp.int32),
            mask=(jnp.arange(t2) < wp).astype(jnp.int32),
            k=work["k"], k_s=work["k_s"], v=work["v"], v_s=work["v_s"],
        )
        out = md.mega_decode_layers_reference(xdec, tapes, dec_cache,
                                              cos, sin, geo_pf, pf=pf)
        work = mo.apply_pf_work_update(work, out[5],
                                       jnp.asarray(wp, jnp.int32))
        if j == nc - 1:
            hidden_last = out[5]["x"][-1]
    full, work = mo.flush_pf_work(full, work, jnp.asarray(0, jnp.int32))
    handed = mo.pf_full_to_decode_cache(
        full, jnp.ones((1, t_real), jnp.int32), t_cap, t2)

    # oracle: the same prompt token-by-token through the PLAIN decode path
    geo1 = md.MegaGeometry.from_config(cfg, batch=1, t_cap=t_cap)
    l, h, dh = cfg.n_layers, cfg.n_heads, cfg.head_dim
    ocache = dict(
        k=jnp.zeros((l, 1, h, dh // 4, t_cap), jnp.int32),
        k_s=jnp.ones((l, h, 1, t_cap), jnp.bfloat16),
        v=jnp.zeros((l, 1, h, t_cap // 4, dh), jnp.int32),
        v_s=jnp.ones((l, h, 1, t_cap), jnp.bfloat16),
        kv_mask=jnp.zeros((1, t_cap), jnp.int32),
        write_pos=jnp.asarray(0, jnp.int32),
        tok_pos=jnp.zeros((1,), jnp.int32),
    )
    xh = None
    for col in range(t_real):
        ocos, osin = md.rope_tables(ocache["tok_pos"], cfg.head_dim,
                                    cfg.rope_theta)
        xh, kn, kns, vn, vns = md.mega_decode_layers_reference(
            embeds[col][None], tapes, ocache, ocos, osin, geo1)
        ocache = md.apply_kv_update(ocache, kn, kns, vn, vns)

    # layer 0's stored K/V must be BIT-exact (no hidden-state drift can
    # reach it: same embeds, same quantized matmul, same requant); later
    # layers accumulate the intra-chunk exact-vs-requantized difference
    # through x (amplified here by ill-conditioned random int8 weights),
    # so they gate within one quantization bin on most elements
    from mmor_tpu.ops.attention import unpack_kv_heads

    for name, unpack in (("k", unpack_kv_heads),
                         ("v", md.unpack_v_tmajor)):
        got = np.asarray(unpack(handed[name][:, :1]), np.int32)
        want = np.asarray(unpack(ocache[name]), np.int32)
        if name == "k":
            got, want = got[..., :t_real], want[..., :t_real]
        else:
            got, want = got[..., :t_real, :], want[..., :t_real, :]
        assert (got[0] == want[0]).mean() == 1.0, (name, "layer0 not exact")
        frac = (np.abs(got - want) <= 1).mean()
        assert frac > 0.9, (name, frac)
    for name in ("k_s", "v_s"):
        got = np.asarray(handed[name][:, :, :1, :t_real], np.float32)
        want = np.asarray(ocache[name][..., :t_real], np.float32)
        rl2 = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-9)
        assert rl2 < 0.05, (name, rl2)
    # the final prompt token's hidden state drives the first decode token
    hg = np.asarray(hidden_last, np.float32)
    hw = np.asarray(xh[0], np.float32)
    rl2 = np.linalg.norm(hg - hw) / (np.linalg.norm(hw) + 1e-9)
    assert rl2 < 0.05, rl2
    assert int(handed["write_pos"]) == t_real
    assert int(handed["tok_pos"][0]) == t_real


def test_generate_overlapped_smoke():
    """End-to-end overlapped serving on the tiny MM2SG (int8 mega, CPU
    reference arithmetic): three same-shape batches through
    generate_overlapped. Batch 0 takes the identical plain path
    (prefill + mega steps), so its tokens must EXACTLY match
    generate_stepwise; later batches flow through the piggybacked prefill
    (semantics anchored by test_pf_prefill_matches_tokenwise_decode_oracle)
    and must be deterministic across runs."""
    import dataclasses

    from mmor_tpu.config import MM2SGConfig
    from mmor_tpu.models.mm2sg import (
        MM2SG,
        generate_overlapped,
        generate_stepwise,
    )
    from mmor_tpu.models.llama import fuse_llama_params, quantize_llama_params

    cfg0 = MM2SGConfig.tiny()
    b, t = 2, 16
    size = cfg0.vision.image_size
    key = jax.random.PRNGKey(0)

    def mk_batch(seed):
        k = jax.random.PRNGKey(seed)
        bt = {
            "input_ids": jax.random.randint(k, (b, t), 3,
                                            cfg0.llama.vocab_size),
            "attention_mask": jnp.ones((b, t), jnp.int32),
            "images": jax.random.normal(k, (b, cfg0.pooler.max_views, size,
                                            size, 3)),
            "view_mask": jnp.ones((b, cfg0.pooler.max_views), jnp.int32),
            "audio_embedding": jnp.zeros((b, cfg0.pooler.audio_dim)),
        }
        bt["input_ids"] = bt["input_ids"].at[:, 2].set(-200)
        return bt

    batches = [mk_batch(s) for s in range(3)]
    model0 = MM2SG(cfg0)
    params0 = model0.init(
        jax.random.PRNGKey(1), batches[0]["input_ids"],
        batches[0]["attention_mask"], batches[0]["images"],
        batches[0]["view_mask"],
        audio_embedding=batches[0]["audio_embedding"],
    )
    qcfg = dataclasses.replace(
        cfg0, llama=dataclasses.replace(
            cfg0.llama, weight_quant=True, kv_quant=True, fused_qkv=True,
            mega_decode=True))
    lm_q = quantize_llama_params(
        fuse_llama_params({"params": params0["params"]["language_model"]})
    )["params"]
    qparams = {"params": dict(params0["params"], language_model=lm_q)}
    qmodel = MM2SG(qcfg)

    n_new, cache_len = 12, 256  # chunked prefill needs t2 <= cache_len
    plain0, _ = generate_stepwise(
        qmodel, qparams, batches[0], max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1)
    outs = generate_overlapped(
        qmodel, qparams, batches, max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1, chunk=32)
    assert len(outs) == 3
    for o in outs:
        assert o.shape == (b, n_new)
    np.testing.assert_array_equal(outs[0], np.asarray(plain0))
    again = generate_overlapped(
        qmodel, qparams, batches, max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1, chunk=32)
    for o1, o2 in zip(outs, again):
        np.testing.assert_array_equal(o1, o2)

    # engine_cache: back-to-back serving calls reuse the jitted programs
    # AND the cache/prefill buffers (bench.py's steady-state path) — the
    # recycled buffers must not leak state into the next call's tokens
    ec = {}
    cached1 = generate_overlapped(
        qmodel, qparams, batches, max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1, chunk=32, engine_cache=ec)
    server1 = ec["server"]
    assert "bufs" in ec and "work" in ec and "full" in ec
    cached2 = generate_overlapped(
        qmodel, qparams, batches, max_cache_len=cache_len,
        max_new_tokens=n_new, eos_token_id=-1, chunk=32, engine_cache=ec)
    assert ec["server"] is server1  # no rebuild on the second call
    for o1, o2, o3 in zip(outs, cached1, cached2):
        np.testing.assert_array_equal(o1, np.asarray(o2))
        np.testing.assert_array_equal(o1, np.asarray(o3))
