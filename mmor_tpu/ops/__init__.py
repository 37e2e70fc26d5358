"""TPU compute ops: Pallas kernels and XLA formulations for the hot paths."""

from mmor_tpu.ops.attention import decode_attention, flash_attention, mha_reference
from mmor_tpu.ops.deformable_attention import ms_deform_attn
from mmor_tpu.ops.matching import hungarian_match
from mmor_tpu.ops.quantized_matmul import int8_matmul, quantize_weights
from mmor_tpu.ops.sampling import point_sample, uncertain_point_coords
from mmor_tpu.ops.serialization import ORDERS, encode, serialize

__all__ = [
    "decode_attention",
    "flash_attention",
    "mha_reference",
    "ms_deform_attn",
    "hungarian_match",
    "int8_matmul",
    "quantize_weights",
    "point_sample",
    "uncertain_point_coords",
    "ORDERS",
    "encode",
    "serialize",
]
