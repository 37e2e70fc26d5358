"""Typed configuration for every model family and pipeline in mmor_tpu.

One config system replaces the reference's three (detectron2 CfgNode YAML,
JSON + module constants, HF dataclass CLI args — SURVEY.md §5). Configs are
frozen dataclasses with classmethod presets; ``tiny()`` presets exist for
CPU-testable shapes.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class LlamaConfig:
    """Llama-family decoder (the MM2SG language model, LLaVA-v1.5-7B base)."""

    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    ffn_dim: int = 11008
    rope_theta: float = 10000.0
    max_seq_len: int = 4096
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    weight_quant: bool = False  # int8 weights (serving; see ops/quantized_matmul)
    quant_int8_mxu: bool = True  # int8xint8 MXU path (vs bf16-dequant MXU)
    # decoder projection weight width: 8 (per-channel scales) or 4
    # (per-(K-group, channel) scales, 8 weights/int32 word — halves the
    # weight bytes decode streams; lm_head/embeddings stay 8/bf16).
    # Gate int4 on the generation-parity tests (tests/test_generation_parity).
    weight_bits: int = 8
    weight_group: int = 1024  # int4 K-group; must equal the kernels' K-chunk
    # KV-cache element width: 8 or 4. int4 halves the dominant decode
    # stream (the cache) for the megakernel path; nibbles pack T-halved
    # (lo = position t, hi = t + T/2) so the attention dots split into two
    # lane-aligned T/2 halves. Mega-decode only; per-position scales stay
    # bf16 either way. Gated by tests/test_generation_parity.py.
    kv_bits: int = 8
    # pad the ffn dim (gate/up outputs, down input) with zero channels:
    # 11008's divisors force tiny matmul tiles (344 grid steps for down_proj
    # at ~5us DMA latency each = ~1.4 ms/call); 11264 = 11*1024 tiles cleanly.
    # Zero gate channels -> silu(0)=0 -> exact numerics.
    ffn_pad: int = 0
    fused_qkv: bool = False  # fuse q/k/v and gate/up projections (serving)
    kv_quant: bool = False  # int8 KV cache (serving; halves cache memory)
    # serve decode through the whole-step megakernel (ops/mega_decode.py):
    # ONE pallas call runs all layers per token. Requires weight_quant +
    # kv_quant + fused_qkv; changes the V-cache layout to T-packed
    # ((T/4, Dh) int32 words) so the prefill writes it accordingly.
    mega_decode: bool = False
    # tensor-parallel segment count for the FUSED projections: the fused
    # output columns are laid out in `tp_segments` groups, each holding one
    # shard's q|k|v (or gate|up) slice, so sharding the output dim over a
    # `model` mesh axis of this size never crosses an internal q/k/v split.
    # 1 = plain [q|k|v] layout (single chip). Build fused params with
    # ``fuse_llama_params(params, tp_segments=...)`` to match.
    tp_segments: int = 1

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @classmethod
    def llava_7b(cls, **kw) -> "LlamaConfig":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "LlamaConfig":
        base = dict(
            vocab_size=512, dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
            ffn_dim=128, max_seq_len=128, dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)


@dataclass(frozen=True)
class ClipVitConfig:
    """CLIP ViT vision tower (openai/clip-vit-large-patch14-336 geometry)."""

    image_size: int = 336
    patch_size: int = 14
    dim: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    mlp_dim: int = 4096
    # feature layer -2: run n_layers-1 blocks and emit that hidden state
    # (clip_encoder.py:40-51 selects hidden_states[-2]).
    feature_layer_offset: int = -2
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @property
    def tokens_per_image(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def tiny(cls, **kw) -> "ClipVitConfig":
        base = dict(
            image_size=28, patch_size=14, dim=32, n_layers=3, n_heads=2,
            mlp_dim=64, dtype=jnp.float32, param_dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)


@dataclass(frozen=True)
class PoolerConfig:
    """Multi-view fusion pooler: a small BERT-style encoder over concatenated
    per-view patch tokens + extra modality tokens (builder.py:61-194)."""

    hidden: int = 1024
    n_layers: int = 2
    n_heads: int = 8
    mlp_dim: int = 4096
    max_views: int = 7
    tokens_per_view: int = 576
    out_tokens: int = 576  # fused sequence truncated to first 576 (builder.py:175)
    pc_feature_dim: int = 512  # PTv3 output before project_pc
    audio_dim: int = 512  # CLAP embedding size
    num_segmask_tokens: int = 3
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @property
    def max_positions(self) -> int:
        return self.tokens_per_view * self.max_views

    @classmethod
    def tiny(cls, **kw) -> "PoolerConfig":
        base = dict(
            hidden=32, n_layers=2, n_heads=2, mlp_dim=64, max_views=3,
            tokens_per_view=4, out_tokens=4, pc_feature_dim=16, audio_dim=16,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)


@dataclass(frozen=True)
class SegmaskEncoderConfig:
    """32x32 label-map CNN encoder (segmentation_map_feature_extractor.py:9-75)."""

    num_classes: int = 30
    embed_dim: int = 8
    out_dim: int = 1024
    mask_size: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def tiny(cls, **kw) -> "SegmaskEncoderConfig":
        base = dict(out_dim=32, dtype=jnp.float32, param_dtype=jnp.float32)
        base.update(kw)
        return cls(**base)


@dataclass(frozen=True)
class PTv3Config:
    """PointTransformerV3 (cls_mode) point-cloud encoder, TPU-native variant."""

    in_channels: int = 6  # xyz + rgb
    enc_channels: tuple[int, ...] = (32, 64, 128, 256, 512)
    enc_depths: tuple[int, ...] = (2, 2, 2, 6, 2)
    enc_heads: tuple[int, ...] = (2, 4, 8, 16, 32)
    patch_size: int = 1024
    grid_size: float = 0.01
    max_points: int = 65536  # static capacity after voxelization
    mlp_ratio: float = 4.0
    out_dim: int = 512
    orders: tuple[str, ...] = ("z", "z-trans", "hilbert", "hilbert-trans")
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32  # reference keeps PTv3 fp32 (train.py:1301-1306)

    @classmethod
    def tiny(cls, **kw) -> "PTv3Config":
        base = dict(
            enc_channels=(8, 16), enc_depths=(1, 1), enc_heads=(2, 2),
            patch_size=16, max_points=256, out_dim=16,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)


@dataclass(frozen=True)
class MM2SGConfig:
    """Full multimodal scene-graph generator: towers + pooler + projector + LM."""

    llama: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    vision: ClipVitConfig = dataclasses.field(default_factory=ClipVitConfig)
    pooler: PoolerConfig = dataclasses.field(default_factory=PoolerConfig)
    segmask: SegmaskEncoderConfig = dataclasses.field(default_factory=SegmaskEncoderConfig)
    ptv3: PTv3Config = dataclasses.field(default_factory=PTv3Config)
    max_prompt_len: int = 2048  # model_max_length (train.py:89-95)
    max_new_tokens: int = 300  # greedy decode budget (scene_graph_prediction_model.py:227)

    @property
    def num_multimodal_tokens(self) -> int:
        # fused image tokens + 1 pc + 1 audio + segmask tokens
        return self.pooler.out_tokens + 2 + self.pooler.num_segmask_tokens

    @classmethod
    def tiny(cls, **kw) -> "MM2SGConfig":
        base = dict(
            llama=LlamaConfig.tiny(),
            vision=ClipVitConfig.tiny(),
            pooler=PoolerConfig.tiny(hidden=32),
            segmask=SegmaskEncoderConfig.tiny(),
            ptv3=PTv3Config.tiny(),
            max_prompt_len=64,
            max_new_tokens=8,
        )
        base.update(kw)
        return cls(**base)
