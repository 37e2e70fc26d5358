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
