"""ResNet-50 backbone (detectron2 geometry) for the panoptic segmenter.

Equivalent of the reference's ``build_resnet_backbone`` config
(`configs/dvis_Plus/.../Base-*.yaml:3-15`): stem 7x7/2 + maxpool, bottleneck
stages [3,4,6,3] emitting res2 (1/4, 256) .. res5 (1/32, 2048). BatchNorm is
frozen (affine scale/bias constants) as in detectron2's ``FrozenBN`` — on TPU
this folds into the preceding conv at compile time.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """Affine-only normalization: y = x * scale + bias with frozen statistics.

    ``scale``/``bias`` absorb (gamma, beta, running_mean, running_var) of a
    trained BN; converted checkpoints precompute them.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = lambda f, k, s, name, pad="SAME": nn.Conv(
            f, (k, k), strides=(s, s), padding=pad, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        bn = lambda f, name: FrozenBN(f, self.dtype, self.param_dtype, name=name)

        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = conv(self.out_channels, 1, self.stride, "shortcut_conv")(x)
            shortcut = bn(self.out_channels, "shortcut_bn")(shortcut)

        h = nn.relu(bn(self.bottleneck_channels, "bn1")(
            conv(self.bottleneck_channels, 1, 1, "conv1")(x)))
        # explicit (1,1) padding: torch pads symmetrically at stride 2, while
        # flax "SAME" would pad (0,1) — one-pixel window shift
        h = nn.relu(bn(self.bottleneck_channels, "bn2")(
            conv(self.bottleneck_channels, 3, self.stride, "conv2",
                 pad=((1, 1), (1, 1)))(h)))
        h = bn(self.out_channels, "bn3")(conv(self.out_channels, 1, 1, "conv3")(h))
        return nn.relu(h + shortcut)


class ResNet50(nn.Module):
    """(N, H, W, 3) -> {'res2': 1/4 x 256, 'res3': 1/8 x 512,
    'res4': 1/16 x 1024, 'res5': 1/32 x 2048}."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    stage_blocks: tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
                    name="stem_conv")(x)
        x = FrozenBN(64, self.dtype, self.param_dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outputs: dict[str, jax.Array] = {}
        channels = (256, 512, 1024, 2048)
        for stage, (n_blocks, out_ch) in enumerate(zip(self.stage_blocks, channels)):
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(
                    out_channels=out_ch,
                    bottleneck_channels=out_ch // 4,
                    stride=stride,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"res{stage + 2}_block{block}",
                )(x)
            outputs[f"res{stage + 2}"] = x
        return outputs
