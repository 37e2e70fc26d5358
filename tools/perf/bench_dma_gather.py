"""Can scalar-core-issued Pallas DMAs beat XLA gather for the deformable
sampler?

The MSDeformAttn sampler needs ~1.85 M (2,2,Chead) bilinear-corner windows
per encoder layer (docs/DESIGN.md); XLA gather tops out at ~36 M
descriptors/s on this chip (tools/perf/bench_gather.py). This measures a
Pallas kernel that issues the same windows as explicit `make_async_copy`s
with a deep in-flight window, plus the XLA gather baseline on identical
geometry.

  PYTHONPATH=.:$PYTHONPATH python tools/perf/bench_dma_gather.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 92, 160, 32
N = int(os.environ.get("DG_N", str(1 << 18)))
CHUNK = int(os.environ.get("DG_CHUNK", "512"))
NSEM = int(os.environ.get("DG_NSEM", "16"))
REPEATS = 8


def kernel(idx_ref, f_ref, out_ref, sems):
    g = pl.program_id(0)

    def issue(i):
        # W is a tiled (sublane) dim: DMA slices there must be 8-aligned,
        # so fetch a 16-wide aligned window that covers the 2 corners
        y = idx_ref[g * CHUNK + i, 0]
        x8 = (idx_ref[g * CHUNK + i, 1] // 8) * 8
        return pltpu.make_async_copy(
            f_ref.at[pl.ds(y, 2), pl.ds(pl.multiple_of(x8, 8), 16), :],
            out_ref.at[i],
            sems.at[i % NSEM],
        )

    def body(i, _):
        @pl.when(i >= NSEM)
        def _():
            issue(i - NSEM).wait()
        issue(i).start()
        return ()

    jax.lax.fori_loop(0, CHUNK, body, ())

    def drain(i, _):
        issue(i).wait()
        return ()

    jax.lax.fori_loop(CHUNK - NSEM, CHUNK, drain, ())


@functools.partial(jax.jit, static_argnames=())
def dma_gather(idx, f):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // CHUNK,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((CHUNK, 2, 16, C), lambda i, _: (i, 0, 0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        ),
        out_shape=jax.ShapeDtypeStruct((N, 2, 16, C), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(idx, f)


@jax.jit
def xla_gather(idx, f):
    # same windows via one gather of (2,2,C) slices
    return f[idx[:, 0, None, None] + jnp.arange(2)[None, :, None],
             idx[:, 1, None, None] + jnp.arange(2)[None, None, :], :]


def bench(fn, idx, f, label):
    out = fn(idx, f)
    np.asarray(out)
    t0 = time.time()
    for _ in range(REPEATS):
        out = fn(idx, f)
    np.asarray(out)
    dt = (time.time() - t0) / REPEATS
    rate = N / dt / 1e6
    print(f"{label:18s} {dt*1e3:8.2f} ms  {rate:8.1f} M desc/s  "
          f"{N*2*2*C*2/dt/1e9:6.1f} GB/s useful")
    return rate


def main():
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (H, W, C), jnp.bfloat16)
    ky, kx = jax.random.split(key)
    idx = jnp.stack([
        jax.random.randint(ky, (N,), 0, H - 1, jnp.int32),
        jax.random.randint(kx, (N,), 0, W - 17, jnp.int32),
    ], axis=1)
    print(f"N={N} CHUNK={CHUNK} NSEM={NSEM} map=({H},{W},{C}) bf16")
    bench(xla_gather, idx, f, "xla (2,2,C) slices")
    bench(dma_gather, idx, f, "pallas DMA")


if __name__ == "__main__":
    main()
