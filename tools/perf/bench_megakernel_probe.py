"""Round-3 megakernel design probes.

Round-2 measured that a fused multi-phase kernel whose later phases read
activations from resident VMEM scratch via LANE-dim ``pl.dslice`` runs the
same matmul at 1.8-2.0 ms vs 0.17 ms for BlockSpec-fed x (CLAUDE.md).  The
round-3 design stores inter-phase activations as 3-D *tile stacks*
(n_tiles, M, chunk) so every dynamic access is a LEADING-axis index.  These
probes validate that choice before building the full kernel:

  BM_PART=xread    a) BlockSpec-fed x (baseline)
                   b) resident 3-D tile stack, x = x_ref[kk]   (new design)
                   c) resident 2-D x, lane-dim dslice          (known bad)
  BM_PART=overhead per-pallas-call fixed cost (chained tiny kernels)
  BM_PART=nibble   int4 weights: 8-per-int32 pack, bitcast + nibble shifts
                   vs int8 packed at the same logical size (half the bytes —
                   does the VPU unpack eat the win?)

Timing: chained through a carry (x perturbed by acc*1e-38) so CSE cannot
hoist the loop body; sync via np.asarray (block_until_ready lies through the
axon tunnel).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmor_tpu.ops.quantized_matmul import int8_matmul_packed, pack_int8_rows

M = int(os.environ.get("BM_M", "24"))
K = int(os.environ.get("BM_K", "4096"))
N = int(os.environ.get("BM_N", "11264"))
REPEATS = int(os.environ.get("BM_REPEATS", "20"))

CK = 2048          # x chunk width (lane dim of a K-tile)
BKP = CK // 4      # packed int32 rows per K-tile
BN = 1024          # weight tile N width


def timeit(name, jfn, args, iters=3, per=1, bytes_per=None):
    np.asarray(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jfn(*args))
    dt = (time.perf_counter() - t0) / iters / REPEATS / per
    gbs = f"  {bytes_per / dt / 1e9:7.1f} GB/s" if bytes_per else ""
    print(f"{name:42s} {dt*1e3:9.3f} ms{gbs}", flush=True)
    return dt


def chained(once, x):
    def run(x):
        def body(i, acc):
            # data-dependent no-op perturbation so CSE can't hoist the body
            # (works for float AND int inputs: the int cast lands on 0)
            xp = x + (acc * 1e-38).astype(x.dtype)
            return once(xp).astype(jnp.float32)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((), jnp.float32))
    return jax.jit(run), (x,)


# --------------------------------------------------------------------------
# part: xread
# --------------------------------------------------------------------------

MXU8 = os.environ.get("BM_MXU8", "1") == "1"


def _mm(x, w8):
    if MXU8:  # int8 x int8 -> int32 on the MXU (the serving path)
        return jax.lax.dot_general(
            x, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    return jax.lax.dot_general(
        x, w8.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _kern_stack(xt_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k):
    s = pl.program_id(0)
    kk = s % n_k

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w8 = pltpu.bitcast(w_ref[...], jnp.int8)
    x = xt_ref[kk]  # (M, CK) leading-axis dynamic index into resident stack
    acc_ref[...] += _mm(x, w8)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[0].astype(jnp.float32)
                      ).astype(o_ref.dtype)


def _kern_dslice(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k):
    s = pl.program_id(0)
    kk = s % n_k

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w8 = pltpu.bitcast(w_ref[...], jnp.int8)
    x = x_ref[:, pl.dslice(kk * CK, CK)]  # lane-dim dynamic slice (known bad)
    acc_ref[...] += _mm(x, w8)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[0].astype(jnp.float32)
                      ).astype(o_ref.dtype)


def xread_part(key):
    n_k, n_n = K // CK, N // BN
    wq = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
    wp = jax.jit(pack_int8_rows)(wq)
    del wq
    sc = jnp.full((N,), 0.01, jnp.float32)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    wbytes = K * N

    # a) BlockSpec-fed (library kernel, serving MXU mode)
    def once_a(xp):
        return int8_matmul_packed(xp, wp, sc, int8_mxu=MXU8
                                  ).astype(jnp.float32).sum()
    timeit("a) blockspec-fed x", *chained(once_a, x), bytes_per=wbytes)

    if MXU8:  # kernels consume pre-quantized int8 activations
        x = jnp.clip(jnp.round(x * 4.0), -127, 127).astype(jnp.int8)
    mpad = max(32, -(-M // 32) * 32) if MXU8 else max(16, -(-M // 16) * 16)
    xt = jnp.zeros((n_k, mpad, CK), x.dtype)
    xt = xt.at[:, :M].set(x.reshape(M, n_k, CK).transpose(1, 0, 2))

    # b) resident tile stack, leading-axis dynamic read
    def once_b(xtp):
        out = pl.pallas_call(
            functools.partial(_kern_stack, n_k=n_k),
            grid=(n_n * n_k,),
            in_specs=[
                pl.BlockSpec((n_k, mpad, CK), lambda s: (0, 0, 0)),
                pl.BlockSpec((BKP, BN), lambda s: (s % n_k, s // n_k)),
                pl.BlockSpec((1, BN), lambda s: (0, s // n_k)),
            ],
            out_specs=pl.BlockSpec((mpad, BN), lambda s: (0, s // n_k)),
            out_shape=jax.ShapeDtypeStruct((mpad, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((mpad, BN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xtp, wp, sc[None, :])
        return out.astype(jnp.float32).sum()
    timeit("b) resident stack, x_ref[kk]", *chained(once_b, xt),
           bytes_per=wbytes)

    xr = jnp.zeros((mpad, K), x.dtype).at[:M].set(x)

    # c) resident 2-D, lane-dim dslice (round-2 failure mode)
    def once_c(xp):
        out = pl.pallas_call(
            functools.partial(_kern_dslice, n_k=n_k),
            grid=(n_n * n_k,),
            in_specs=[
                pl.BlockSpec((mpad, K), lambda s: (0, 0)),
                pl.BlockSpec((BKP, BN), lambda s: (s % n_k, s // n_k)),
                pl.BlockSpec((1, BN), lambda s: (0, s // n_k)),
            ],
            out_specs=pl.BlockSpec((mpad, BN), lambda s: (0, s // n_k)),
            out_shape=jax.ShapeDtypeStruct((mpad, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((mpad, BN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xp, wp, sc[None, :])
        return out.astype(jnp.float32).sum()
    timeit("c) resident 2-D, lane dslice", *chained(once_c, xr),
           bytes_per=wbytes)


# --------------------------------------------------------------------------
# part: overhead
# --------------------------------------------------------------------------

def _kern_tiny(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 1.0000001


def overhead_part(key):
    x = jax.random.normal(key, (16, 256), jnp.bfloat16)

    def call(xp):
        return pl.pallas_call(
            _kern_tiny,
            out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        )(xp)

    for n_calls in (8, 32):
        def once(xp, n=n_calls):
            h = xp
            for _ in range(n):
                h = call(h)
            return h.astype(jnp.float32).sum()
        dt = timeit(f"{n_calls} chained tiny pallas calls", *chained(once, x))
        print(f"   -> {dt / n_calls * 1e6:8.1f} us/call", flush=True)

    # same but pure-XLA ops for comparison
    def once_xla(xp):
        h = xp
        for _ in range(32):
            h = h * 1.0000001
        return h.astype(jnp.float32).sum()
    dt = timeit("32 chained XLA multiplies", *chained(once_xla, x))
    print(f"   -> {dt / 32 * 1e6:8.1f} us/op", flush=True)


# --------------------------------------------------------------------------
# part: nibble (int4)
# --------------------------------------------------------------------------

def pack_int4_rows(w_q: jax.Array) -> jax.Array:
    """(K, N) int4-valued int8 -> (K/8, N) int32; nibble p of word r = row 8r+p.

    Layout: byte b of word r holds rows (8r+2b, 8r+2b+1) as (lo, hi) nibbles,
    so ``pltpu.bitcast(int32 -> int8)`` yields rows interleaved 2-per-byte and
    the kernel extracts lo/hi with one shift pair.
    """
    k, n = w_q.shape
    assert k % 8 == 0
    w = w_q.reshape(k // 8, 8, n).astype(jnp.int32) & 0xF
    lo = w[:, 0::2]  # rows 8r+{0,2,4,6}
    hi = w[:, 1::2]
    byte = lo | (hi << 4)  # (K/8, 4, N)
    return (byte[:, 0] | (byte[:, 1] << 8) | (byte[:, 2] << 16)
            | (byte[:, 3] << 24))


def _kern_nib(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k):
    s = pl.program_id(0)
    kk = s % n_k

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w8 = pltpu.bitcast(w_ref[...], jnp.int8)  # (BKP4*4, BN): 2 nibbles/byte
    # w8 row j packs original rows (2j, 2j+1) as (lo, hi) nibbles
    lo = ((w8 << 4) >> 4).astype(jnp.bfloat16)   # even original rows, in order
    hi = (w8 >> 4).astype(jnp.bfloat16)          # odd original rows
    dims = (((1,), (0,)), ((), ()))
    half = x_ref.shape[-1] // 2
    xe = x_ref[0][:, :half]  # even K rows of this chunk (pre-deinterleaved)
    xo = x_ref[0][:, half:]
    acc = jax.lax.dot_general(xe, lo, dims, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(xo, hi, dims, preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[0].astype(jnp.float32)
                      ).astype(o_ref.dtype)


def nibble_part(key):
    n_k, n_n = K // CK, N // BN
    wq = jax.random.randint(key, (K, N), -8, 8, jnp.int8)
    wp4 = jax.jit(pack_int4_rows)(wq)  # (K/8, N) int32
    del wq
    sc = jnp.full((N,), 0.01, jnp.float32)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    mpad = max(16, -(-M // 16) * 16)
    # x pre-deinterleaved per chunk: [even rows | odd rows] so the kernel
    # takes static half-slices matching the nibble unpack order.
    xc = x.reshape(M, n_k, CK).transpose(1, 0, 2)  # (n_k, M, CK)
    xi = jnp.zeros((n_k, mpad, CK), jnp.bfloat16)
    xi = xi.at[:, :M].set(
        jnp.concatenate([xc[..., 0::2], xc[..., 1::2]], axis=-1))

    bkp4 = CK // 8  # int32 rows per chunk

    def once(xp):
        out = pl.pallas_call(
            functools.partial(_kern_nib, n_k=n_k),
            grid=(n_n * n_k,),
            in_specs=[
                pl.BlockSpec((1, mpad, CK), lambda s: (s % n_k, 0, 0)),
                pl.BlockSpec((bkp4, BN), lambda s: (s % n_k, s // n_k)),
                pl.BlockSpec((1, BN), lambda s: (0, s // n_k)),
            ],
            out_specs=pl.BlockSpec((mpad, BN), lambda s: (0, s // n_k)),
            out_shape=jax.ShapeDtypeStruct((mpad, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((mpad, BN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xp, wp4, sc[None, :])
        return out.astype(jnp.float32).sum()

    timeit("int4 nibble-unpack matmul", *chained(once, xi),
           bytes_per=K * N // 2)

    # int8 packed baseline at the same logical size (2x the bytes)
    wq8 = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
    wp8 = jax.jit(pack_int8_rows)(wq8)
    del wq8

    def once8(xp):
        return int8_matmul_packed(
            xp, wp8, sc, int8_mxu=False).astype(jnp.float32).sum()
    timeit("int8 packed matmul (2x bytes)", *chained(once8, x),
           bytes_per=K * N)


# --------------------------------------------------------------------------
# part: rowrw (sublane-dynamic single-row read/write on resident scratch)
# --------------------------------------------------------------------------

def _kern_rowrw(q_ref, k_ref, o_ref, buf_ref, *, b, dyn):
    s = pl.program_id(0)
    if dyn:
        bi = s % b
        hg = s // b
        q = q_ref[hg, pl.dslice(bi, 1), :]       # (1, 2048) sublane-dyn read
    else:
        q = q_ref[0, 0:1, :]
    k8 = pltpu.bitcast(k_ref[...], jnp.int8)[0]  # (G, 128, T)
    # per-head matvec over the block, as decode attention does
    acc = jnp.zeros((1, k8.shape[-1]), jnp.float32)
    g_heads = k8.shape[0]
    for g in range(g_heads):
        qg = q[:, g * 128:(g + 1) * 128].astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            qg, k8[g].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    row = jnp.broadcast_to(acc[:, :1], (1, q_ref.shape[-1]))
    if dyn:
        buf_ref[hg, pl.dslice(bi, 1), :] = row    # sublane-dyn write
    else:
        buf_ref[0, 0:1, :] = row

    @pl.when(s == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = buf_ref[...]


def rowrw_part(key):
    b, hgn, g, t = 24, 2, 16, 1024
    q = jax.random.normal(key, (hgn, b, g * 128), jnp.bfloat16)
    kp = jax.random.randint(key, (hgn * b, g, 32, t), -2**30, 2**30, jnp.int32)
    kv_bytes = hgn * b * g * 128 * t

    for dyn in (False, True):
        def once(qp, dyn=dyn):
            out = pl.pallas_call(
                functools.partial(_kern_rowrw, b=b, dyn=dyn),
                grid=(hgn * b,),
                in_specs=[
                    pl.BlockSpec((hgn, b, g * 128), lambda s: (0, 0, 0)),
                    pl.BlockSpec((1, g, 32, t), lambda s: (s, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((hgn, b, g * 128),
                                       lambda s: (0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((hgn, b, g * 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((hgn, b, g * 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(qp, kp)
            return out.astype(jnp.float32).sum()
        name = "dyn sublane row r/w" if dyn else "static row r/w (baseline)"
        timeit(name, *chained(once, q), bytes_per=kv_bytes)


def main():
    part = os.environ.get("BM_PART", "xread")
    key = jax.random.PRNGKey(0)
    print(f"M={M} K={K} N={N} part={part}", flush=True)
    dict(xread=xread_part, overhead=overhead_part,
         nibble=nibble_part, rowrw=rowrw_part)[part](key)


if __name__ == "__main__":
    main()
