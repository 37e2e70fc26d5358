"""Pipeline parallelism over the scanned layer axis (virtual CPU mesh).

Forward parity vs the dense single-device scan, gradient flow through the
ppermute pipeline, and the DP x PP composition the 7B decoder wants on a
real slice (SURVEY §2.4 TPU mapping).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mmor_tpu.parallel.pp import pipeline_apply, shard_stacked_params


def _mesh(shape, names):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _layer_fn(layer_params, x):
    # mlp layer with residual: x + gelu(x @ w1) @ w2
    h = jax.nn.gelu(x @ layer_params["w1"])
    return x + h @ layer_params["w2"]


@pytest.fixture(scope="module")
def stacked():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    L, D, F = 8, 16, 32
    return {
        "w1": jax.random.normal(k1, (L, D, F)) * 0.3,
        "w2": jax.random.normal(k2, (L, F, D)) * 0.3,
    }


def _dense(params, x):
    def body(h, lp):
        return _layer_fn(lp, h), None
    out, _ = jax.lax.scan(body, x, params)
    return out


def test_pipeline_matches_dense_forward(stacked):
    mesh = _mesh((4,), ("pipe",))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 6, 16))
    ref = _dense(stacked, x)
    sharded = shard_stacked_params(mesh, stacked)
    got = pipeline_apply(_layer_fn, sharded, x, mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_single_microbatch(stacked):
    mesh = _mesh((4,), ("pipe",))
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 16))
    ref = _dense(stacked, x)
    got = pipeline_apply(_layer_fn, shard_stacked_params(mesh, stacked),
                         x, mesh, n_micro=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_grads_match_dense(stacked):
    mesh = _mesh((2,), ("pipe",))
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 16))

    def loss_dense(p):
        return jnp.sum(_dense(p, x) ** 2)

    def loss_pp(p):
        return jnp.sum(pipeline_apply(_layer_fn, p, x, mesh, n_micro=2) ** 2)

    g_ref = jax.grad(loss_dense)(stacked)
    g_pp = jax.grad(loss_pp)(shard_stacked_params(mesh, stacked))
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_pp[k]), np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-4)


def test_dp_x_pp_composition(stacked):
    """Data parallelism and pipeline on one 2x2 mesh: the batch shards over
    'data' while layers pipeline over 'pipe' (TP composes via the
    parallel/tp.py PartitionSpecs on the same params)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh((2, 2), ("data", "pipe"))
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 4, 16))
    ref = _dense(stacked, x)

    params = jax.tree.map(
        lambda v: jax.device_put(
            v, NamedSharding(mesh, P("pipe", *([None] * (v.ndim - 1))))),
        stacked)
    got = pipeline_apply(_layer_fn, params, x, mesh, n_micro=2,
                         data_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_real_llama_blocks():
    """Pipeline the actual scanned LlamaBlock stack (prefill path) over a
    4-stage virtual mesh and match the dense scan."""
    from mmor_tpu.config import LlamaConfig
    from mmor_tpu.models.llama import LlamaBlock, LlamaModel

    cfg = LlamaConfig(vocab_size=128, dim=32, n_layers=4, n_heads=4,
                      n_kv_heads=4, ffn_dim=64, max_seq_len=64)
    model = LlamaModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (4, 12), 0, 128)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(1), input_ids=ids,
                        attention_mask=mask)
    blocks = params["params"]["blocks"]

    block = LlamaBlock(cfg)

    def layer_fn(lp, x):
        # recompute positions/segments from the (micro)batch itself so the
        # layer works at any pipeline microbatch size
        b, t = x.shape[:2]
        pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
        seg = jnp.ones((b, t), jnp.int32)
        (x2, _, _), _ = block.apply(
            {"params": lp}, (x, None, jnp.asarray(0, jnp.int32)),
            pos, seg, None, None)
        return x2

    embeds = model.apply(params, ids, method=LlamaModel.embed_tokens)

    def dense(h):
        def body(h, lp):
            return layer_fn(lp, h), None
        out, _ = jax.lax.scan(body, h, blocks)
        return out

    ref = dense(embeds.astype(jnp.float32))
    mesh = _mesh((4,), ("pipe",))
    got = pipeline_apply(layer_fn, shard_stacked_params(mesh, blocks),
                         embeds.astype(jnp.float32), mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
