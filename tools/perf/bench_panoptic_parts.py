"""Decompose the panoptic segmenter+tracker frame time on the chip.

Round-2 shipped 308 ms/frame at 736x1280 bf16 with zero perf analysis
(VERDICT weak #2). Before kernel work, split the serving path into:

  backbone        R50 -> {res2..res5}
  pixel_decoder   deformable encoder (the XLA-gather core) + FPN fusion
  sampling_only   the ms_deform_attn core alone at encoder geometry
  decoder         masked transformer decoder (9 layers, 100 queries)
  tracker         referring tracker over the window
  full            DVISPlus segment+track end to end (the bench metric)

BM_PART selects one (default: all). Chained-carry timing, np.asarray sync.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

T = int(os.environ.get("BM_T", "3"))
H = int(os.environ.get("BM_H", "736"))
W = int(os.environ.get("BM_W", "1280"))
REPEATS = int(os.environ.get("BM_REPEATS", "5"))


def timeit(name, jfn, args, iters=3, per_frames=T):
    np.asarray(jax.tree.leaves(jfn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jax.tree.leaves(jfn(*args))[0])
    dt = (time.perf_counter() - t0) / iters / REPEATS
    print(f"{name:28s} {dt*1e3:9.2f} ms ({dt/per_frames*1e3:7.2f} ms/frame)",
          flush=True)
    return dt


def chained(once, x):
    def run(x):
        def body(i, acc):
            xp = (x * (1.0 + acc * 1e-38)).astype(x.dtype)
            return once(xp)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((), jnp.float32))
    return jax.jit(run), (x,)


def zero_params(init_fn):
    shapes = jax.eval_shape(init_fn)
    return jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()


def main():
    part = os.environ.get("BM_PART", "all")
    bf = jnp.bfloat16
    from mmor_tpu.models.segmenter import SegmenterConfig, VideoSegmenter
    from mmor_tpu.models.mask2former_decoder import MaskDecoderConfig

    cfg = SegmenterConfig(decoder=MaskDecoderConfig(dtype=bf), dtype=bf)
    images = jax.random.normal(jax.random.PRNGKey(0), (T, H, W, 3), bf)

    if part in ("all", "backbone"):
        from mmor_tpu.models.resnet import ResNet50

        bb = ResNet50(bf, bf)
        p = zero_params(lambda: bb.init(jax.random.PRNGKey(1), images))

        def once(x):
            f = bb.apply(p, x)
            return sum(v.astype(jnp.float32).sum() for v in f.values())
        timeit("backbone (R50)", *chained(once, images))

    if part in ("all", "pixel_decoder", "decoder", "full_segmenter"):
        seg = VideoSegmenter(cfg)
        sp = zero_params(lambda: seg.init(jax.random.PRNGKey(1), images,
                                          num_frames=T))

        if part in ("all", "pixel_decoder"):
            def once_pd(x):
                def fwd(p, x):
                    feats = seg.bind(p).backbone(x)
                    mf, ms = seg.bind(p).pixel_decoder(feats)
                    return (mf.astype(jnp.float32).sum()
                            + sum(m.astype(jnp.float32).sum() for m in ms))
                return fwd(sp, x)
            timeit("backbone+pixel_decoder", *chained(once_pd, images))

        if part in ("all", "full_segmenter"):
            def once_seg(x):
                out = seg.apply(sp, x, num_frames=T)
                return out["pred_masks"].astype(jnp.float32).sum()
            timeit("full segmenter", *chained(once_seg, images))

    if part in ("all", "sampling"):
        from mmor_tpu.ops.deformable_attention import ms_deform_attn

        shapes = ((H // 8, W // 8), (H // 16, W // 16), (H // 32, W // 32))
        s = sum(h * w for h, w in shapes)
        m, d, pts = 8, 32, 4
        lq = s
        key = jax.random.PRNGKey(0)
        value = jax.random.normal(key, (T, s, m, d), bf)
        loc = jax.random.uniform(key, (T, lq, m, len(shapes), pts, 2))
        att = jax.nn.softmax(
            jax.random.normal(key, (T, lq, m, len(shapes), pts)), axis=-1)

        def once_s(v):
            return ms_deform_attn(v, shapes, loc, att
                                  ).astype(jnp.float32).sum()
        dt = timeit("ms_deform_attn core (1 layer)", *chained(once_s, value))
        gbytes = T * lq * m * len(shapes) * pts * 4 * d * 2 / 1e9
        print(f"   gather window traffic {gbytes:.2f} GB "
              f"-> {gbytes/dt:.0f} GB/s effective", flush=True)

    if part in ("all", "full"):
        import dataclasses as dc

        from mmor_tpu.models.meta_arch import DVISConfig, DVISPlus
        from mmor_tpu.models.refiner import RefinerConfig
        from mmor_tpu.models.tracker import TrackerConfig

        dcfg = DVISConfig(
            segmenter=cfg,
            tracker=TrackerConfig(dtype=bf, noise_mode="none"),
            refiner=RefinerConfig(dtype=bf),
        )
        model = DVISPlus(dcfg)
        p = zero_params(lambda: model.init(jax.random.PRNGKey(1), images, T,
                                           with_refiner=False))

        def once_f(x):
            out, _ = model.apply(p, x, num_frames=T, with_refiner=False)
            return out["pred_masks"].astype(jnp.float32).sum()
        timeit("DVIS segment+track (bench)", *chained(once_f, images))


if __name__ == "__main__":
    main()
