"""Serialization codes: Morton correctness, Hilbert bijectivity + locality."""

import itertools

import jax.numpy as jnp
import numpy as np

from mmor_tpu.ops.serialization import (
    ORDERS,
    encode,
    hilbert_encode,
    serialize,
    z_order_encode,
)


def _morton_ref(x, y, z):
    code = 0
    for b in range(10):
        code |= ((x >> b) & 1) << (3 * b)
        code |= ((y >> b) & 1) << (3 * b + 1)
        code |= ((z >> b) & 1) << (3 * b + 2)
    return code


def test_z_order_matches_reference_bit_interleave():
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 1024, (64, 3))
    got = np.asarray(z_order_encode(jnp.asarray(coords)))
    want = np.array([_morton_ref(x, y, z) for x, y, z in coords])
    np.testing.assert_array_equal(got, want)


def test_hilbert_bijective_on_small_grid():
    side = 8  # 512 cells; bits beyond 3 are zero
    coords = np.array(list(itertools.product(range(side), repeat=3)))
    codes = np.asarray(hilbert_encode(jnp.asarray(coords)))
    assert len(np.unique(codes)) == len(coords)


def test_hilbert_locality_neighbors_adjacent():
    """Walking the full curve of an 8^3 grid: consecutive codes must be
    spatial neighbors (the defining Hilbert property)."""
    side = 8
    coords = np.array(list(itertools.product(range(side), repeat=3)))
    codes = np.asarray(hilbert_encode(jnp.asarray(coords)))
    order = np.argsort(codes)
    walk = coords[order]
    steps = np.abs(np.diff(walk, axis=0)).sum(axis=1)
    assert (steps == 1).all(), f"max step {steps.max()} — curve not contiguous"


def test_all_orders_are_permutations():
    rng = np.random.default_rng(1)
    coords = rng.integers(0, 1024, (100, 3))
    for order in ORDERS:
        codes = np.asarray(encode(jnp.asarray(coords), order))
        assert codes.shape == (100,)
    perm = np.asarray(
        serialize(jnp.asarray(coords), jnp.ones(100, bool), "hilbert")
    )
    assert sorted(perm.tolist()) == list(range(100))


def test_serialize_pads_last():
    coords = np.array([[5, 5, 5], [0, 0, 0], [1023, 1023, 1023], [1, 1, 1]])
    valid = jnp.array([True, True, False, True])
    perm = np.asarray(serialize(jnp.asarray(coords), valid, "z"))
    assert perm[-1] == 2  # invalid point sorts last
    assert perm[0] == 1  # origin sorts first
