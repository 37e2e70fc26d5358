"""Bipartite (Hungarian) assignment for set-prediction losses.

The reference calls scipy's ``linear_sum_assignment`` on host per batch
element (`mask2former_video/modeling/matcher.py:155-160`). The cost matrix is
tiny (Q x N_max), so two interchangeable backends sit behind one API:

- ``callback``: exact scipy solve through ``jax.pure_callback`` (host round
  trip, default where the runtime supports host callbacks);
- ``auction``: Bertsekas auction algorithm fully on device (jit/vmap-safe,
  eps-optimal — within ``N * eps`` of the optimum, which ties with the exact
  solution for our matching purposes at eps=1e-4 of the cost scale). Used
  automatically on runtimes without host-callback support (the axon TPU
  tunnel rejects send/recv callbacks) and available everywhere via
  ``MMOR_TPU_MATCHER=auction``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e9
_NEG = -1e30


def _solve_batch(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    b, q, n = cost.shape
    out = np.full((b, n), -1, dtype=np.int32)
    for i in range(b):
        cols = np.nonzero(valid[i])[0]
        if len(cols) == 0:
            continue
        c = np.nan_to_num(cost[i][:, cols], nan=_BIG, posinf=_BIG, neginf=-_BIG)
        rows, assigned = linear_sum_assignment(c)
        out[i, cols[assigned]] = rows.astype(np.int32)
    return out


@functools.partial(jax.jit, static_argnames=("max_iters",))
def auction_match(cost: jax.Array, valid: jax.Array, *,
                  eps: float | None = None, max_iters: int = 512) -> jax.Array:
    """Jacobi auction assignment, on device. Same contract as
    ``hungarian_match``: cost (B, Q, N), valid (B, N) -> (B, N) query index
    per target (-1 for invalid targets).

    Each round, every unassigned target bids its best query up by
    (best - second_best + eps); highest bidder takes the query, displacing the
    previous owner. Terminates when all valid targets hold a query (the
    standard auction-termination argument) or at ``max_iters``.
    """
    b, q, n = cost.shape
    cost = jnp.nan_to_num(cost.astype(jnp.float32), nan=_BIG,
                          posinf=_BIG, neginf=-_BIG)
    value = -jnp.swapaxes(cost, 1, 2)  # (B, N, Q) target-major
    if eps is None:
        scale = jnp.maximum(jnp.max(jnp.abs(value)), 1.0)
        eps_v = 1e-4 * scale
    else:
        eps_v = jnp.asarray(eps, jnp.float32)
    valid = valid.astype(bool)

    def cond(state):
        i, price, assigned_q, owner = state
        unhappy = jnp.any((assigned_q < 0) & valid)
        return jnp.logical_and(i < max_iters, unhappy)

    def body(state):
        i, price, assigned_q, owner = state
        net = value - price[:, None, :]  # (B, N, Q)
        bidding = (assigned_q < 0) & valid  # (B, N)

        best = jnp.max(net, axis=-1)  # (B, N)
        best_q = jnp.argmax(net, axis=-1)  # (B, N)
        net2 = jnp.where(
            jax.nn.one_hot(best_q, q, dtype=bool), _NEG, net)
        second = jnp.max(net2, axis=-1)
        second = jnp.where(jnp.isfinite(second) & (second > _NEG / 2),
                           second, best)  # q == 1 edge case
        incr = best - second + eps_v  # (B, N)

        # each query collects the highest bid among targets bidding on it
        bid = jnp.where(bidding, incr, _NEG)[:, :, None]  # (B, N, 1)
        onehot = jax.nn.one_hot(best_q, q, dtype=jnp.float32)  # (B, N, Q)
        bid_mat = jnp.where(onehot > 0, bid, _NEG)  # (B, N, Q)
        win_bid = jnp.max(bid_mat, axis=1)  # (B, Q)
        winner = jnp.argmax(bid_mat, axis=1).astype(jnp.int32)  # (B, Q)
        won = win_bid > _NEG / 2  # queries that received a bid

        price = jnp.where(won, price + win_bid, price)
        # displace previous owners of won queries
        new_owner = jnp.where(won, winner, owner)
        # a target keeps its query only if it still owns it
        keep = (assigned_q >= 0) & (
            jnp.take_along_axis(
                new_owner, jnp.maximum(assigned_q, 0), axis=1
            ) == jnp.arange(n)[None, :]
        )
        assigned_q = jnp.where(keep, assigned_q, -1)
        # target t wins its bid query iff it is the recorded winner there
        won_q = jnp.take_along_axis(won, best_q, axis=1)  # (B, N)
        winner_there = jnp.take_along_axis(winner, best_q, axis=1)  # (B, N)
        i_won = bidding & won_q & (winner_there == jnp.arange(n)[None, :])
        assigned_q = jnp.where(i_won, best_q, assigned_q)
        owner = new_owner
        return i + 1, price, assigned_q, owner

    price0 = jnp.zeros((b, q), jnp.float32)
    assigned0 = jnp.full((b, n), -1, jnp.int32)
    owner0 = jnp.full((b, q), -1, jnp.int32)
    _, _, assigned_q, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), price0, assigned0, owner0)
    )
    return jnp.where(valid, assigned_q, -1).astype(jnp.int32)


@functools.lru_cache(maxsize=1)
def _default_impl() -> str:
    forced = os.environ.get("MMOR_TPU_MATCHER")
    if forced in ("callback", "auction"):
        return forced
    # the axon TPU plugin rejects host send/recv callbacks; it registers the
    # plain 'tpu' platform, so sniff the PJRT platform_version string
    version = getattr(jax.devices()[0].client, "platform_version", "")
    if "axon" in version:
        return "auction"
    return "callback"


def hungarian_match(cost: jax.Array, valid: jax.Array,
                    impl: str | None = None) -> jax.Array:
    """cost: (B, Q, N) match costs; valid: (B, N) real-target flags.

    Returns (B, N) int32: for each target, the assigned query index (-1 for
    padded targets). Each query is assigned to at most one target.
    """
    impl = impl or _default_impl()
    if impl == "auction":
        return auction_match(cost, valid)
    b, _q, n = cost.shape
    return jax.pure_callback(
        _solve_batch,
        jax.ShapeDtypeStruct((b, n), jnp.int32),
        cost.astype(jnp.float32),
        valid.astype(bool),
        vmap_method="sequential",
    )
