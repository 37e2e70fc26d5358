"""On-TPU numerics checks for Pallas kernels (run manually: python tests/tpu/run_tpu_checks.py).

Not collected by pytest (the suite pins JAX_PLATFORMS=cpu); this script runs on
whatever accelerator is attached and compares each Pallas kernel against its
XLA oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.ops.attention import flash_attention, mha_reference

def check(name, got, want, atol):
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    status = "OK " if err <= atol else "FAIL"
    print(f"[{status}] {name}: max_abs_err={err:.3e} (atol={atol})")
    return err <= atol

def main():
    print("devices:", jax.devices())
    ok = True
    key = jax.random.PRNGKey(0)
    for (b, h, sq, sk, d), causal, dtype, atol in [
        ((2, 4, 512, 512, 128), True, jnp.float32, 8e-3),  # f32 on TPU runs the MXU in bf16 passes at default precision
        ((2, 4, 512, 512, 128), False, jnp.float32, 8e-3),
        ((1, 8, 1024, 1024, 128), True, jnp.bfloat16, 2e-2),
        ((2, 2, 384, 640, 64), False, jnp.float32, 8e-3),  # ragged, padded blocks
    ]:
        ks = jax.random.split(key, 4)
        key = ks[0]
        q = jax.random.normal(ks[1], (b, h, sq, d), dtype)
        k = jax.random.normal(ks[2], (b, h, sk, d), dtype)
        v = jax.random.normal(ks[3], (b, h, sk, d), dtype)
        got = flash_attention(q, k, v, causal=causal)
        want = mha_reference(q, k, v, causal=causal)
        ok &= check(f"flash b{b} h{h} {sq}x{sk} d{d} causal={causal} {dtype.dtype.name}", got, want, atol)

    # segment ids (varlen patches, PTv3-style)
    b, h, s, d = 1, 4, 512, 64
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[1], (b, h, s, d))
    k = jax.random.normal(ks[2], (b, h, s, d))
    v = jax.random.normal(ks[3], (b, h, s, d))
    seg = jnp.concatenate([jnp.zeros((b, 200), jnp.int32), jnp.ones((b, 120), jnp.int32), jnp.full((b, s - 320), 2, jnp.int32)], axis=1)
    got = flash_attention(q, k, v, segment_ids=seg)
    want = mha_reference(q, k, v, segment_ids=seg)
    ok &= check("flash segment-ids", got, want, 8e-3)

    print("ALL OK" if ok else "FAILURES")
    raise SystemExit(0 if ok else 1)

if __name__ == "__main__":
    main()
