"""Attention op semantics (CPU: XLA reference path; the Pallas kernel is
verified against the same oracle on TPU by tests/tpu/run_tpu_checks.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.ops.attention import (
    decode_attention,
    flash_attention,
    mha_reference,
)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


def test_reference_matches_naive_softmax():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = _rand(k1, (2, 4, 16, 32)), _rand(k2, (2, 4, 16, 32)), _rand(k3, (2, 4, 16, 32))
    out = mha_reference(q, k, v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(32)
    expected = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_causal_masking():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = _rand(k1, (1, 2, 8, 16)), _rand(k2, (1, 2, 8, 16)), _rand(k3, (1, 2, 8, 16))
    out = mha_reference(q, k, v, causal=True)
    # Row 0 attends only to key 0.
    np.testing.assert_allclose(out[:, :, 0], v[:, :, 0], atol=1e-5)


def test_segment_ids_block_cross_attention():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = _rand(k1, (1, 1, 8, 16)), _rand(k2, (1, 1, 8, 16)), _rand(k3, (1, 1, 8, 16))
    seg = jnp.array([[0, 0, 0, 0, 1, 1, 1, 1]], dtype=jnp.int32)
    out = mha_reference(q, k, v, segment_ids=seg)
    # Equivalent to two independent attentions.
    first = mha_reference(q[:, :, :4], k[:, :, :4], v[:, :, :4])
    second = mha_reference(q[:, :, 4:], k[:, :, 4:], v[:, :, 4:])
    np.testing.assert_allclose(out[:, :, :4], first, atol=1e-5)
    np.testing.assert_allclose(out[:, :, 4:], second, atol=1e-5)


def test_flash_attention_cpu_fallback_matches_reference():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = _rand(k1, (2, 2, 64, 32)), _rand(k2, (2, 2, 64, 32)), _rand(k3, (2, 2, 64, 32))
    out = flash_attention(q, k, v, causal=True)
    expected = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_decode_attention_matches_prefix_attention():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    t_max, valid = 16, 9
    q = _rand(k1, (2, 4, 1, 32))
    k_cache, v_cache = _rand(k2, (2, 4, t_max, 32)), _rand(k3, (2, 4, t_max, 32))
    kv_mask = (jnp.arange(t_max)[None, :] < valid).astype(jnp.int32).repeat(2, 0)
    out = decode_attention(q, k_cache, v_cache, kv_mask)
    expected = mha_reference(q, k_cache[:, :, :valid], v_cache[:, :, :valid])
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_flash_attention_grads_flow():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    q, k, v = _rand(k1, (1, 2, 32, 16)), _rand(k2, (1, 2, 32, 16)), _rand(k3, (1, 2, 32, 16))

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    ref_grads = jax.grad(
        lambda q, k, v: jnp.sum(mha_reference(q, k, v, causal=True) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for g, rg in zip(grads, ref_grads):
        np.testing.assert_allclose(g, rg, atol=1e-4)
        assert bool(jnp.all(jnp.isfinite(g)))


def test_pack_kv_heads_roundtrip():
    from mmor_tpu.ops.attention import pack_kv_heads, unpack_kv_heads

    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, size=(2, 3, 16, 8), dtype=np.int8)
    packed = pack_kv_heads(jnp.asarray(x))
    assert packed.shape == (2, 3, 2, 16) and packed.dtype == jnp.int32
    back = np.asarray(unpack_kv_heads(packed))
    np.testing.assert_array_equal(back, x)


def test_pack_int8_rows_roundtrip():
    from mmor_tpu.ops.quantized_matmul import pack_int8_rows, unpack_int8_rows

    rng = np.random.default_rng(1)
    w = rng.integers(-127, 128, size=(16, 8), dtype=np.int8)
    packed = pack_int8_rows(jnp.asarray(w))
    assert packed.shape == (4, 8) and packed.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(unpack_int8_rows(packed)), w)


def test_decode_attention_packed_matches_oracle():
    from mmor_tpu.models.llama import quantize_kv
    from mmor_tpu.ops.attention import decode_attention_packed, mha_reference

    rng = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(rng, 3)
    b, h, t, d = 2, 3, 24, 16
    q = jax.random.normal(kq, (b, h, 1, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, t, d), jnp.float32)
    k_p, k_s = quantize_kv(k)
    v_p, v_s = quantize_kv(v)
    mask = jnp.ones((b, t), jnp.int32).at[:, :4].set(0)  # left padding

    got = decode_attention_packed(q, k_p, v_p, k_s, v_s, mask)
    seg_q = jnp.ones((b, 1), jnp.int32)
    ref = mha_reference(q, k, v, segment_ids=seg_q, kv_segment_ids=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.02)
