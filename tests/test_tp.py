"""Tensor parallelism: sharded forward matches the replicated model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mmor_tpu.config import LlamaConfig
from mmor_tpu.models.llama import LlamaModel
from mmor_tpu.parallel.mesh import make_mesh
from mmor_tpu.parallel.tp import shard_params, tp_param_shardings


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny(n_heads=4, n_kv_heads=4, dim=64, ffn_dim=128)
    model = LlamaModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (4, 12), 3, cfg.vocab_size)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(1), input_ids=ids, attention_mask=mask)
    return cfg, model, params, ids, mask


def test_tp_specs_cover_decoder(setup):
    cfg, model, params, ids, mask = setup
    mesh = make_mesh(n_data=4, n_model=2)
    specs = tp_param_shardings(mesh, params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_path = {"/".join(str(getattr(k, "key", k)) for k in p): s for p, s in flat}
    assert by_path["params/blocks/q_proj/kernel"].spec == P(None, None, "model")
    assert by_path["params/blocks/o_proj/kernel"].spec == P(None, "model", None)
    assert by_path["params/lm_head/kernel"].spec == P(None, "model")
    assert by_path["params/embed_tokens/embedding"].spec == P()


def test_tp_forward_matches_replicated(setup):
    cfg, model, params, ids, mask = setup
    ref_logits, _ = model.apply(params, input_ids=ids, attention_mask=mask)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_params(mesh, params)
    batch_sharding = NamedSharding(mesh, P("data"))
    ids_s = jax.device_put(ids, batch_sharding)
    mask_s = jax.device_put(mask, batch_sharding)

    @jax.jit
    def fwd(p, ids, mask):
        logits, _ = model.apply(p, input_ids=ids, attention_mask=mask)
        return logits

    with mesh:
        tp_logits = fwd(sharded, ids_s, mask_s)
    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(ref_logits), atol=2e-4
    )


def test_tp_grad_matches_replicated(setup):
    cfg, model, params, ids, mask = setup

    def loss(p, ids, mask):
        logits, _ = model.apply(p, input_ids=ids, attention_mask=mask)
        return jnp.mean(logits ** 2)

    ref_grad = jax.grad(loss)(params, ids, mask)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_params(mesh, params)
    with mesh:
        tp_grad = jax.jit(jax.grad(loss))(sharded, ids, mask)
    a = jax.tree.leaves(ref_grad)[3]
    b = jax.tree.leaves(tp_grad)[3]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
