"""Generation-level quantization parity: packed-int8 W+KV serving vs bf16.

Per-op error bounds (test_llama.py, tests/tpu) do not catch a single
divergent argmax early in a long greedy rollout — the failure mode that
silently breaks serving parity (the reference decodes greedily with
``max_new_tokens=300``, `scene_graph_prediction_model.py:221-231`, so token
exactness is the metric that matters).  This test trains a small-but-deep
model to produce *confident* logits (an untrained net's near-uniform logits
make argmax a coin flip and the comparison meaningless), then rolls both the
bf16 path and the full serving configuration (fused qkv + packed-int8
weights + packed-int8 KV cache + ffn padding) for 128+ greedy steps and
asserts token agreement above a threshold.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmor_tpu.config import LlamaConfig
from mmor_tpu.models.llama import (
    LlamaModel,
    build_cache,
    fuse_llama_params,
    greedy_decode,
    quantize_llama_params,
)

N_LAYERS = 8
N_NEW = 128


@pytest.fixture(scope="module")
def trained_model():
    """A depth-8 model overfitted to a periodic token pattern.

    The pattern makes greedy decode deterministic-by-a-margin: after a few
    hundred Adam steps the correct next token wins by a wide logit gap, so
    bf16-vs-int8 disagreement measures quantization error, not tie-breaking
    noise on an untrained net.
    """
    cfg = LlamaConfig(
        vocab_size=64, dim=128, n_layers=N_LAYERS, n_heads=4, n_kv_heads=4,
        ffn_dim=344, max_seq_len=512, dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    model = LlamaModel(cfg)
    rng = np.random.RandomState(0)
    period = 7
    base = rng.randint(3, cfg.vocab_size, size=(4, period))
    seqs = np.concatenate([base] * 40, axis=1)[:, :256]  # (4, 256)
    ids = jnp.asarray(seqs)
    mask = jnp.ones_like(ids)

    params = model.init(jax.random.PRNGKey(0), input_ids=ids[:, :8],
                        attention_mask=mask[:, :8])
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits, _ = model.apply(p, input_ids=ids[:, :-1],
                                    attention_mask=mask[:, :-1])
            tgt = ids[:, 1:]
            lp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    loss = None
    for _ in range(120):
        params, opt, loss = step(params, opt)
    assert float(loss) < 0.5, f"overfit failed, loss={float(loss)}"
    return cfg, model, params, ids


def _rollout(cfg, model, params, prompt_ids, n_new):
    mask = jnp.ones_like(prompt_ids)
    logits, kv = model.apply(params, input_ids=prompt_ids,
                             attention_mask=mask,
                             prefill_pad_to=(prompt_ids.shape[1] + n_new
                                             if cfg.kv_quant else None))
    cache = build_cache(cfg, kv, mask, max_len=prompt_ids.shape[1] + n_new)
    return greedy_decode(model, params, logits, cache, n_new, eos_token_id=-1)


def test_serving_quant_generation_matches_bf16(trained_model):
    cfg, model, params, ids = trained_model
    prompt = ids[:, :32]

    ref_tokens = _rollout(cfg, model, params, prompt, N_NEW)

    ffn_pad = 8  # 344 -> 352: exercises the zero-channel padding too
    qcfg = dataclasses.replace(cfg, weight_quant=True, kv_quant=True,
                               fused_qkv=True, ffn_pad=ffn_pad)
    qparams = quantize_llama_params(fuse_llama_params(params),
                                    ffn_pad=ffn_pad)
    q_tokens = _rollout(qcfg, LlamaModel(qcfg), qparams, prompt, N_NEW)

    ref = np.asarray(ref_tokens)
    got = np.asarray(q_tokens)
    agree = float((ref == got).mean())
    # Full-pipeline int8 (weights + KV, 8 layers deep, 128 greedy steps):
    # a confident model should agree near-exactly. The threshold leaves room
    # for a rare tie flip but fails on systematic drift.
    assert agree >= 0.99, f"token agreement {agree:.3f}\nref={ref[0]}\ngot={got[0]}"


def test_serving_quant_logit_drift_stays_bounded(trained_model):
    """Logit-gap check at rollout depth: after 64 forced-teacher steps the
    quantized model's top-1 margin should still match bf16's sign — drift
    compounding over depth/time is what per-op tests miss."""
    cfg, model, params, ids = trained_model
    qcfg = dataclasses.replace(cfg, weight_quant=True, kv_quant=True,
                               fused_qkv=True, ffn_pad=8)
    qmodel = LlamaModel(qcfg)
    qparams = quantize_llama_params(fuse_llama_params(params), ffn_pad=8)

    seq = ids[:, :96]  # teacher-forced: same inputs for both models
    mask = jnp.ones_like(seq)
    ref_logits, _ = model.apply(params, input_ids=seq, attention_mask=mask)
    q_logits, _ = qmodel.apply(qparams, input_ids=seq, attention_mask=mask)
    ref_top = np.asarray(jnp.argmax(ref_logits[:, 32:], -1))
    q_top = np.asarray(jnp.argmax(q_logits[:, 32:], -1))
    agree = float((ref_top == q_top).mean())
    assert agree >= 0.99, f"teacher-forced top-1 agreement {agree:.3f}"


def test_mega_decode_generation_matches_bf16(trained_model):
    """The megakernel serving path (ops/mega_decode.py — here its XLA
    reference emulation on CPU; the pallas kernel is pinned to that
    reference in test_mega_decode.py and on-chip in tests/tpu) rolled 128
    greedy steps on the trained model: tokens must track bf16."""
    cfg, model, params, ids = trained_model
    prompt = ids[:, :32]
    ref_tokens = np.asarray(_rollout(cfg, model, params, prompt, N_NEW))

    ffn_pad = 8
    qcfg = dataclasses.replace(cfg, weight_quant=True, kv_quant=True,
                               fused_qkv=True, ffn_pad=ffn_pad,
                               mega_decode=True)
    qmodel = LlamaModel(qcfg)
    qparams = quantize_llama_params(fuse_llama_params(params),
                                    ffn_pad=ffn_pad)

    from mmor_tpu.ops.mega_decode import (
        MegaServer,
        greedy_decode_hostloop_mega,
    )

    mask = jnp.ones_like(prompt)
    max_len = prompt.shape[1] + N_NEW
    logits, kv = qmodel.apply(qparams, input_ids=prompt,
                              attention_mask=mask, prefill_pad_to=max_len)
    cache = build_cache(qcfg, kv, mask, max_len=max_len)
    server = MegaServer(qcfg, qparams)
    mega_tokens, _ = greedy_decode_hostloop_mega(
        server, logits, cache, N_NEW, eos_token_id=-1)

    agree = float((ref_tokens == np.asarray(mega_tokens)).mean())
    assert agree >= 0.98, (f"mega token agreement {agree:.3f}\n"
                           f"ref={ref_tokens[0]}\nmega={np.asarray(mega_tokens)[0]}")


def test_int4_generation_matches_bf16(trained_model):
    """int4 weights (per-(K-group, channel) scales, biased-nibble packing —
    ops/quantized_matmul.quantize_weights_int4) rolled 128 greedy steps:
    the quality gate for serving with weight_bits=4 (VERDICT round-2 #2).

    int4 is coarser than int8, so the bar is slightly lower but still
    catches systematic drift; the teacher-forced variant below pins the
    per-step logit agreement."""
    cfg, model, params, ids = trained_model
    prompt = ids[:, :32]
    ref_tokens = np.asarray(_rollout(cfg, model, params, prompt, N_NEW))

    ffn_pad = 8
    group = 32  # divides every projection K (128, 352) at this tiny size
    qcfg = dataclasses.replace(cfg, weight_quant=True, kv_quant=True,
                               fused_qkv=True, ffn_pad=ffn_pad,
                               weight_bits=4, weight_group=group)
    qparams = quantize_llama_params(fuse_llama_params(params),
                                    ffn_pad=ffn_pad, bits=4, group=group)
    q_tokens = np.asarray(
        _rollout(qcfg, LlamaModel(qcfg), qparams, prompt, N_NEW))
    agree = float((ref_tokens == q_tokens).mean())
    assert agree >= 0.97, (
        f"int4 token agreement {agree:.3f}\nref={ref_tokens[0]}"
        f"\ngot={q_tokens[0]}")


def test_int4_teacher_forced_top1(trained_model):
    cfg, model, params, ids = trained_model
    group = 32
    qcfg = dataclasses.replace(cfg, weight_quant=True, kv_quant=True,
                               fused_qkv=True, ffn_pad=8,
                               weight_bits=4, weight_group=group)
    qmodel = LlamaModel(qcfg)
    qparams = quantize_llama_params(fuse_llama_params(params), ffn_pad=8,
                                    bits=4, group=group)
    seq = ids[:, :96]
    mask = jnp.ones_like(seq)
    ref_logits, _ = model.apply(params, input_ids=seq, attention_mask=mask)
    q_logits, _ = qmodel.apply(qparams, input_ids=seq, attention_mask=mask)
    ref_top = np.asarray(jnp.argmax(ref_logits[:, 32:], -1))
    q_top = np.asarray(jnp.argmax(q_logits[:, 32:], -1))
    agree = float((ref_top == q_top).mean())
    assert agree >= 0.97, f"int4 teacher-forced top-1 agreement {agree:.3f}"


def test_mega_int4kv_generation_matches_bf16(trained_model):
    """kv_bits=4 (T-halved nibble cache) + int8 weights through the mega
    decode loop for 128 greedy steps on the trained model — the quality
    gate for serving with an int4 KV cache."""
    cfg, model, params, ids = trained_model
    prompt = ids[:, :32]
    ref_tokens = np.asarray(_rollout(cfg, model, params, prompt, N_NEW))

    ffn_pad = 8
    qcfg = dataclasses.replace(cfg, weight_quant=True, kv_quant=True,
                               fused_qkv=True, ffn_pad=ffn_pad,
                               mega_decode=True, kv_bits=4)
    qparams = quantize_llama_params(fuse_llama_params(params),
                                    ffn_pad=ffn_pad)

    from mmor_tpu.ops.mega_decode import (
        MegaServer,
        greedy_decode_hostloop_mega,
        quantize_k_int4,
        quantize_v_int4,
    )

    # prefill emits FLOAT per-layer KV (kv_quant=False variant of the same
    # weights); the test quantizes into the int4 capacity layout directly —
    # the engine path is covered by test_mega_decode's stepwise test
    pcfg = dataclasses.replace(qcfg, kv_quant=False, mega_decode=False)
    mask = jnp.ones_like(prompt)
    max_len = prompt.shape[1] + N_NEW
    logits, kv = LlamaModel(pcfg).apply(qparams, input_ids=prompt,
                                        attention_mask=mask)
    k_f, v_f = kv  # (L, B, H, Tp, dh) float
    k_q, k_s = quantize_k_int4(k_f, max_len)
    v_q, v_s = quantize_v_int4(v_f, max_len)
    tp = prompt.shape[1]
    pad_t = ((0, 0), (0, 0), (0, 0), (0, max_len - tp))
    cache = dict(
        k=k_q, v=v_q,
        k_s=jnp.pad(k_s, pad_t).transpose(0, 2, 1, 3),
        v_s=jnp.pad(v_s, pad_t).transpose(0, 2, 1, 3),
        kv_mask=jnp.pad(mask, ((0, 0), (0, max_len - tp))).astype(jnp.int32),
        write_pos=jnp.asarray(tp, jnp.int32),
        tok_pos=jnp.full((prompt.shape[0],), tp, jnp.int32),
    )
    server = MegaServer(qcfg, qparams)
    mega_tokens, _ = greedy_decode_hostloop_mega(
        server, logits, cache, N_NEW, eos_token_id=-1)
    agree = float((ref_tokens == np.asarray(mega_tokens)).mean())
    assert agree >= 0.95, (
        f"int4-KV token agreement {agree:.3f}\nref={ref_tokens[0]}\n"
        f"mega={np.asarray(mega_tokens)[0]}")
