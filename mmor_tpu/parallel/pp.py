"""Pipeline parallelism over the scanned layer axis.

The decoder's blocks are stacked on a leading layer axis (``nn.scan`` —
models/llama.py), which is the natural pipeline dimension: shard it over a
``pipe`` mesh axis, run each stage's layers locally, and rotate microbatch
activations between stages with ``jax.lax.ppermute`` (XLA lowers this to ICI
neighbor exchanges — the scaling-book pipeline recipe). GPipe schedule:
``n_micro + n_stages - 1`` steps, bubble fraction (P-1)/(M+P-1).

The reference has no pipeline parallelism (SURVEY §2.4: single-GPU DP); this
is the TPU-native extension that, with `parallel/tp.py` and the DP mesh axis,
completes the DP x TP x PP matrix for multi-chip serving/training of the 7B
decoder. Verified against the single-device forward on a virtual CPU mesh
(tests/test_pp.py).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_stacked_params(mesh: Mesh, params, axis: str = "pipe"):
    """Place (L, ...) stacked layer params with L split over the pipe axis."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, params)


def pipeline_apply(
    layer_fn: Callable,  # (layer_params, x) -> x, one layer
    stacked_params,  # pytree with leading layer axis L (sharded over `axis`)
    x: jax.Array,  # (B, ...) full batch, replicated
    mesh: Mesh,
    *,
    n_micro: int,
    axis: str = "pipe",
    data_axis: str | None = None,
    param_specs=None,
) -> jax.Array:
    """Run x through all L layers as a P-stage pipeline of L/P layers each.

    Returns the full-batch output, replicated over the pipe axis (the last
    stage's results psum back around the ring). Differentiable — ppermute has
    a transpose rule, so ``jax.grad`` through this gives pipeline-parallel
    training. Pass ``data_axis`` to compose with data parallelism: the
    microbatch batch dim shards over that axis while layers pipeline over
    ``axis``. For DP x TP x PP, pass ``param_specs`` (a pytree of
    PartitionSpecs additionally splitting projection dims on a ``model``
    axis) and a ``layer_fn`` that psums over that axis — see
    parallel/dp_tp_pp.py.
    """
    n_stages = mesh.shape[axis]
    batch = x.shape[0]
    assert batch % n_micro == 0, (batch, n_micro)
    mb = batch // n_micro
    micro = x.reshape((n_micro, mb) + x.shape[1:])

    def stage_apply(param_shard, xs):
        def body(h, layer_params):
            return layer_fn(layer_params, h), None
        out, _ = jax.lax.scan(body, xs, param_shard)
        return out

    def device_fn(param_shard, micro_all):
        p = jax.lax.axis_index(axis)
        state = jnp.zeros_like(micro_all[0])
        outs = jnp.zeros_like(micro_all)
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        for s in range(n_micro + n_stages - 1):
            # stage 0 injects microbatch s; everyone else consumes the ring
            inject = jnp.logical_and(p == 0, s < n_micro)
            x_in = jnp.where(inject, micro_all[min(s, n_micro - 1)], state)
            y = stage_apply(param_shard, x_in)
            # last stage banks microbatch (s - (P-1)) when it emerges
            m = s - (n_stages - 1)
            if m >= 0:
                outs = outs.at[m].set(jnp.where(p == n_stages - 1, y, outs[m]))
            state = jax.lax.ppermute(y, axis, fwd)

        # only the last stage banked non-zeros; psum replicates its outputs
        return jax.lax.psum(outs, axis)

    spec_params = param_specs if param_specs is not None else jax.tree.map(
        lambda v: P(axis, *([None] * (v.ndim - 1))), stacked_params)
    micro_spec = P(None, data_axis) if data_axis else P()
    try:  # jax >= 0.8
        fn = jax.shard_map(
            device_fn, mesh=mesh,
            in_specs=(spec_params, micro_spec), out_specs=micro_spec,
            check_vma=False,
        )
    except (AttributeError, TypeError):  # older jax
        from jax.experimental.shard_map import shard_map

        fn = shard_map(
            device_fn, mesh=mesh,
            in_specs=(spec_params, micro_spec), out_specs=micro_spec,
            check_rep=False,
        )
    out = fn(stacked_params, micro)
    return out.reshape((batch,) + x.shape[1:])
