"""Space-filling-curve serialization codes for point clouds (PTv3).

TPU-native equivalent of the reference's serialization package
(`LLaVA/llava/model/multimodal_projector/serialization/{z_order,hilbert}.py`):
points are ordered along a space-filling curve so that windows of consecutive
points are spatially local ("patch attention"). Codes are plain int32 bit
math: 10 bits per axis (grid coords clamped to [0, 1023]) -> 30-bit codes,
which avoids int64 (jax_enable_x64 stays off). The reference uses 16-bit
depth; at grid_size 0.01 m an OR-room cloud spans well under 10.24 m, so 10
bits loses nothing.

Orders: ``z`` (Morton), ``z-trans`` (axes cycled), ``hilbert``,
``hilbert-trans`` — the 4-order set PTv3 shuffles over
(`pointtransformerv3.py:791,84-139`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BITS = 10
MAX_COORD = (1 << BITS) - 1

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def _part_bits(x: jax.Array) -> jax.Array:
    """Spread the low 10 bits of x so there are 2 zero bits between each
    (Morton encoding helper), int32-safe."""
    x = x & MAX_COORD
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def z_order_encode(grid_coords: jax.Array) -> jax.Array:
    """(N, 3) int grid coords -> (N,) int32 Morton codes (x lowest bits)."""
    c = jnp.clip(grid_coords, 0, MAX_COORD).astype(jnp.int32)
    return (
        _part_bits(c[:, 0])
        | (_part_bits(c[:, 1]) << 1)
        | (_part_bits(c[:, 2]) << 2)
    )


def hilbert_encode(grid_coords: jax.Array) -> jax.Array:
    """(N, 3) int grid coords -> (N,) int32 Hilbert-curve indices.

    Skilling's algorithm: transpose-form Hilbert conversion then bit
    interleave. Static loops over BITS keep it jit-friendly.
    """
    x = jnp.clip(grid_coords, 0, MAX_COORD).astype(jnp.int32)
    x = [x[:, 0], x[:, 1], x[:, 2]]
    n = 3

    # Inverse undo excess work (Skilling: AxestoTranspose)
    m = 1 << (BITS - 1)
    q = m
    while q > 1:
        p = q - 1
        for i in range(n):
            cond = (x[i] & q) != 0
            # invert low bits of x[0] or exchange with x[i]
            x0_inv = x[0] ^ p
            t = (x[0] ^ x[i]) & p
            x0_exch = x[0] ^ t
            xi_exch = x[i] ^ t
            x[0] = jnp.where(cond, x0_inv, x0_exch)
            if i != 0:
                x[i] = jnp.where(cond, x[i], xi_exch)
        q >>= 1

    # Gray encode
    for i in range(1, n):
        x[i] = x[i] ^ x[i - 1]
    t = jnp.zeros_like(x[0])
    q = m
    while q > 1:
        t = jnp.where((x[n - 1] & q) != 0, t ^ (q - 1), t)
        q >>= 1
    for i in range(n):
        x[i] = x[i] ^ t

    # interleave transposed bits: bit b of axis i goes to position
    # (BITS-1-b)*n + i counted from the MSB of the 3*BITS-bit code
    code = jnp.zeros_like(x[0])
    for b in range(BITS):  # b: bit position in axis word (0 = LSB)
        for i in range(n):
            bit = (x[i] >> b) & 1
            pos = b * n + (n - 1 - i)
            code = code | (bit << pos)
    return code


def encode(grid_coords: jax.Array, order: str) -> jax.Array:
    """Serialization code for one of the 4 PTv3 orders."""
    if order == "z":
        return z_order_encode(grid_coords)
    if order == "z-trans":
        return z_order_encode(grid_coords[:, jnp.array([1, 0, 2])])
    if order == "hilbert":
        return hilbert_encode(grid_coords)
    if order == "hilbert-trans":
        return hilbert_encode(grid_coords[:, jnp.array([1, 0, 2])])
    raise ValueError(f"unknown order {order!r}")


def serialize(grid_coords: jax.Array, valid: jax.Array, order: str) -> jax.Array:
    """Return the permutation sorting points along the curve; padded (invalid)
    points sort last. -> (N,) int32 indices."""
    code = encode(grid_coords, order)
    key = jnp.where(valid, code, jnp.int32(2**30))
    return jnp.argsort(key, stable=True).astype(jnp.int32)
