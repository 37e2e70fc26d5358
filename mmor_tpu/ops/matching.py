"""Bipartite (Hungarian) assignment for set-prediction losses.

The reference calls scipy's ``linear_sum_assignment`` on host per batch
element (`mask2former_video/modeling/matcher.py:155-160`). On TPU the cost
matrix is tiny (Q x N_max), so we keep the exact algorithm and route it
through ``jax.pure_callback`` with static shapes — the device pipeline stays
jitted, the O(Q·N²) solve runs on the host. (A device-side auction solver can
replace the callback behind the same API if host round trips ever matter.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e9


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


def hungarian_match(cost: jax.Array, valid: jax.Array) -> jax.Array:
    """cost: (B, Q, N) match costs; valid: (B, N) real-target flags.

    Returns (B, N) int32: for each target, the assigned query index (-1 for
    padded targets). Each query is assigned to at most one target.
    """
    b, _q, n = cost.shape
    return jax.pure_callback(
        _solve_batch,
        jax.ShapeDtypeStruct((b, n), jnp.int32),
        cost.astype(jnp.float32),
        valid.astype(bool),
        vmap_method="sequential",
    )
