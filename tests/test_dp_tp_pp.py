"""DP x TP x PP composed in one step on a 2x2x2 virtual mesh.

Validates the three-axis composition (parallel/dp_tp_pp.py) against the
plain single-device ``LlamaModel``: same parameter tree, same math
(RMSNorm/RoPE/causal attention/SwiGLU), so logits must agree to float
tolerance — and one AdamW train step must run with finite loss and grads
that match the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmor_tpu.config import LlamaConfig
from mmor_tpu.models.llama import LlamaModel
from mmor_tpu.parallel.dp_tp_pp import (
    decoder_forward,
    make_3d_mesh,
    make_dp_tp_pp_train_step,
    shard_decoder_state,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny(n_layers=4, n_heads=4, n_kv_heads=4, dim=64,
                           ffn_dim=128)
    model = LlamaModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (4, 16), 3,
                             cfg.vocab_size)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(1), input_ids=ids,
                        attention_mask=mask)
    return cfg, model, params, ids, mask


def test_3d_forward_matches_llama(setup):
    cfg, model, params, ids, mask = setup
    ref, _ = model.apply(params, input_ids=ids, attention_mask=mask)
    mesh = make_3d_mesh(2, 2, 2)
    with mesh:
        got = jax.jit(
            lambda p, i: decoder_forward(cfg, p, i, mesh, n_micro=2)
        )(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_3d_train_step_all_axes_active(setup):
    cfg, model, params, ids, mask = setup
    mesh = make_3d_mesh(2, 2, 2)
    assert dict(mesh.shape) == {"data": 2, "pipe": 2, "model": 2}
    tx = optax.adamw(1e-3)
    own = jax.tree.map(jnp.copy, params)  # donated below; keep fixture intact
    state = {"params": own, "opt_state": tx.init(own),
             "step": jnp.zeros((), jnp.int32)}
    state = shard_decoder_state(mesh, state)
    step = make_dp_tp_pp_train_step(cfg, mesh, tx, n_micro=2)
    with mesh:
        jstep = jax.jit(step, donate_argnums=(0,))
        state, metrics = jstep(state, ids, ids)
        loss0 = float(metrics["loss"])
        state, metrics = jstep(state, ids, ids)
        loss1 = float(metrics["loss"])
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert loss1 < loss0  # the composed step actually optimizes
    assert int(state["step"]) == 2


def test_3d_grads_match_single_device(setup):
    cfg, model, params, ids, mask = setup

    def ref_loss(p):
        logits, _ = model.apply(p, input_ids=ids, attention_mask=mask)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(lp[:, :-1], ids[:, 1:, None], -1).mean()

    ref_grads = jax.grad(ref_loss)(params)

    mesh = make_3d_mesh(2, 2, 2)

    def pp_loss(p):
        logits = decoder_forward(cfg, p, ids, mesh, n_micro=2)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(lp[:, :-1], ids[:, 1:, None], -1).mean()

    with mesh:
        got_grads = jax.jit(jax.grad(pp_loss))(params)
    ga = np.asarray(
        jax.tree.leaves(ref_grads["params"]["blocks"]["q_proj"])[0])
    gb = np.asarray(
        jax.tree.leaves(got_grads["params"]["blocks"]["q_proj"])[0])
    np.testing.assert_allclose(gb, ga, atol=3e-4, rtol=1e-3)
