"""Detectron2/torch checkpoint conversion: DVIS/Mask2Former .pth -> mmor_tpu params.

The reference's panoptic pipeline bootstraps every stage from pretrained
torch checkpoints: ``Trainer.resume_or_load(ctvis_r50_vspw.pth)``
(`panoptic_segmentation/train_net_video.py:396-398`) and the staged hand-off
passes the previous stage's ``model_*.pth`` as ``MODEL.WEIGHTS``. These
converters map the detectron2 state-dict layout onto our flax trees so those
published weights (and our own torch-free re-exports) load directly:

- torch Linear (out, in) -> flax kernel (in, out); Conv OIHW -> HWIO;
  Conv1d (out, in, k) -> (k, in, out);
- d2 FrozenBatchNorm (gamma, beta, mean, var) folds into our affine
  ``FrozenBN`` {scale, bias} at conversion time;
- ``nn.MultiheadAttention``'s packed ``in_proj_weight`` splits into our
  q/k/v/out projections;
- module coverage: R50 + Swin backbones, MSDeformAttn pixel decoder,
  the (video/DVIS+) masked-attention predictor, ReferringTracker and
  TemporalRefiner — i.e. the CTVIS / DVIS-online / DVIS-offline stages.

Every converter consumes keys from a shared ``_SD`` view; ``convert_dvis``
reports unconsumed reference keys so silent drops are impossible.
Tested against locally-built torch modules mirroring the reference layout
(tests/test_convert_panoptic.py).
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "StateDict",
    "convert_d2_resnet50",
    "convert_swin",
    "convert_pixel_decoder",
    "convert_predictor",
    "convert_tracker",
    "convert_refiner",
    "convert_dvis",
    "load_torch_checkpoint",
]


class StateDict:
    """Dict view that tracks consumed keys and strips a prefix."""

    def __init__(self, sd: dict, prefix: str = "", consumed: set | None = None):
        self._sd = sd
        self._prefix = prefix
        self.consumed = consumed if consumed is not None else set()

    def sub(self, prefix: str) -> "StateDict":
        return StateDict(self._sd, self._prefix + prefix, self.consumed)

    def __contains__(self, key: str) -> bool:
        return self._prefix + key in self._sd

    def keys(self):
        return [k[len(self._prefix):] for k in self._sd
                if k.startswith(self._prefix)]

    def __call__(self, key: str) -> np.ndarray:
        full = self._prefix + key
        self.consumed.add(full)
        return np.asarray(self._sd[full], dtype=np.float32)

    def unconsumed(self):
        return sorted(k for k in self._sd if k not in self.consumed)


def _lin(sd: StateDict, name: str) -> dict:
    """torch Linear -> {kernel, bias?}."""
    out = {"kernel": sd(f"{name}.weight").T}
    if f"{name}.bias" in sd:
        out["bias"] = sd(f"{name}.bias")
    return out


def _conv2d(sd: StateDict, name: str) -> dict:
    """torch Conv2d OIHW -> flax HWIO."""
    out = {"kernel": sd(f"{name}.weight").transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = sd(f"{name}.bias")
    return out


def _conv1d(sd: StateDict, name: str) -> dict:
    out = {"kernel": sd(f"{name}.weight").transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = sd(f"{name}.bias")
    return out


def _ln(sd: StateDict, name: str) -> dict:
    return {"scale": sd(f"{name}.weight"), "bias": sd(f"{name}.bias")}


def _frozen_bn(sd: StateDict, name: str, eps: float = 1e-5) -> dict:
    """(gamma, beta, running_mean, running_var) -> affine {scale, bias}."""
    gamma = sd(f"{name}.weight")
    beta = sd(f"{name}.bias")
    mean = sd(f"{name}.running_mean")
    var = sd(f"{name}.running_var")
    if f"{name}.num_batches_tracked" in sd:
        sd(f"{name}.num_batches_tracked")  # consume buffer
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def _mha(sd: StateDict, name: str) -> dict:
    """nn.MultiheadAttention -> AttentionBlock's q/k/v/out projections."""
    w = sd(f"{name}.in_proj_weight")  # (3C, C)
    b = sd(f"{name}.in_proj_bias")
    c = w.shape[1]
    qw, kw, vw = w[:c], w[c : 2 * c], w[2 * c :]
    qb, kb, vb = b[:c], b[c : 2 * c], b[2 * c :]
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": _lin(sd, f"{name}.out_proj"),
    }


def _attn_block(sd: StateDict, attn_name: str, prefix: str) -> dict:
    """Reference (Self|Cross|ReferringCross)AttentionLayer -> AttentionBlock."""
    layer = sd.sub(prefix)
    out = _mha(layer, attn_name)
    out["norm"] = _ln(layer, "norm")
    return out


def _ffn_block(sd: StateDict, prefix: str) -> dict:
    layer = sd.sub(prefix)
    return {
        "fc1": _lin(layer, "linear1"),
        "fc2": _lin(layer, "linear2"),
        "norm": _ln(layer, "norm"),
    }


def _mlp(sd: StateDict, name: str, n_layers: int = 3) -> dict:
    return {f"fc{i}": _lin(sd, f"{name}.layers.{i}") for i in range(n_layers)}


# ---------------------------------------------------------------------------
# Backbones
# ---------------------------------------------------------------------------

def convert_d2_resnet50(sd: StateDict, stage_blocks=(3, 4, 6, 3)) -> dict:
    """d2 ResNet-50 (`backbone.stem/res2..res5`) -> models/resnet.py tree."""
    params = {
        "stem_conv": _conv2d(sd, "stem.conv1"),
        "stem_bn": _frozen_bn(sd, "stem.conv1.norm"),
    }
    for stage, n_blocks in enumerate(stage_blocks):
        for b in range(n_blocks):
            blk = sd.sub(f"res{stage + 2}.{b}.")
            tree = {}
            for i in (1, 2, 3):
                tree[f"conv{i}"] = _conv2d(blk, f"conv{i}")
                tree[f"bn{i}"] = _frozen_bn(blk, f"conv{i}.norm")
            if "shortcut.weight" in blk:
                tree["shortcut_conv"] = _conv2d(blk, "shortcut")
                tree["shortcut_bn"] = _frozen_bn(blk, "shortcut.norm")
            params[f"res{stage + 2}_block{b}"] = tree
    return params


def convert_swin(sd: StateDict, depths=(2, 2, 6, 2)) -> dict:
    """d2 Swin (`backbone.patch_embed/layers.*/norm*`) -> models/swin.py tree."""
    params = {
        "patch_embed": _conv2d(sd, "patch_embed.proj"),
        "patch_norm": _ln(sd, "patch_embed.norm"),
    }
    for stage, depth in enumerate(depths):
        for b in range(depth):
            blk = sd.sub(f"layers.{stage}.blocks.{b}.")
            if f"layers.{stage}.blocks.{b}.attn.relative_position_index" in sd:
                blk("attn.relative_position_index")  # static buffer, recomputed
            params[f"stage{stage}_block{b}"] = {
                "ln1": _ln(blk, "norm1"),
                "ln2": _ln(blk, "norm2"),
                "attn": {
                    "qkv": _lin(blk, "attn.qkv"),
                    "proj": _lin(blk, "attn.proj"),
                    "rel_pos_bias": blk("attn.relative_position_bias_table"),
                },
                "fc1": _lin(blk, "mlp.fc1"),
                "fc2": _lin(blk, "mlp.fc2"),
            }
        if f"layers.{stage}.downsample.reduction.weight" in sd:
            params[f"merge_reduce{stage}"] = _lin(sd, f"layers.{stage}.downsample.reduction")
            params[f"merge_norm{stage}"] = _ln(sd, f"layers.{stage}.downsample.norm")
        params[f"out_norm{stage}"] = _ln(sd, f"norm{stage}")
    return params


# ---------------------------------------------------------------------------
# Pixel decoder
# ---------------------------------------------------------------------------

def convert_pixel_decoder(
    sd: StateDict,
    n_layers: int = 6,
    transformer_features: tuple[str, ...] = ("res3", "res4", "res5"),
) -> dict:
    """d2 MSDeformAttnPixelDecoder -> models/pixel_decoder.py tree.

    d2's ``input_proj`` list is ordered high->low stride (res5 first,
    msdeformattn.py:208-218); FPN convs are ``adapter_1``/``layer_1``.
    """
    params = {"level_embed": sd("transformer.level_embed")}
    for idx, name in enumerate(reversed(transformer_features)):
        proj = sd.sub(f"input_proj.{idx}.")
        params[f"input_proj_{name}"] = _conv2d(proj, "0")
        params[f"input_proj_{name}_norm"] = _ln(proj, "1")
    for i in range(n_layers):
        layer = sd.sub(f"transformer.encoder.layers.{i}.")
        params[f"layer_{i}"] = {
            "self_attn": {
                "sampling_offsets": _lin(layer, "self_attn.sampling_offsets"),
                "attention_weights": _lin(layer, "self_attn.attention_weights"),
                "value_proj": _lin(layer, "self_attn.value_proj"),
                "output_proj": _lin(layer, "self_attn.output_proj"),
            },
            "norm1": _ln(layer, "norm1"),
            "fc1": _lin(layer, "linear1"),
            "fc2": _lin(layer, "linear2"),
            "norm2": _ln(layer, "norm2"),
        }
    params["fpn_lateral"] = _conv2d(sd, "adapter_1")
    params["fpn_lateral_norm"] = _ln(sd, "adapter_1.norm")
    params["fpn_output"] = _conv2d(sd, "layer_1")
    params["fpn_output_norm"] = _ln(sd, "layer_1.norm")
    params["mask_features"] = _conv2d(sd, "mask_features")
    return params


# ---------------------------------------------------------------------------
# Masked-attention predictor (VideoMultiScaleMaskedTransformerDecoder[_dvisPlus])
# ---------------------------------------------------------------------------

def convert_predictor(sd: StateDict, dec_layers: int = 9, hidden_dim: int = 256) -> dict:
    params = {
        "query_feat": sd("query_feat.weight"),
        "query_embed": sd("query_embed.weight"),
        "level_embed": sd("level_embed.weight"),
        "decoder_norm": _ln(sd, "decoder_norm"),
        "class_embed": _lin(sd, "class_embed"),
        "mask_embed": _mlp(sd, "mask_embed"),
    }
    for i in range(3):
        if f"input_proj.{i}.weight" in sd:
            w = sd(f"input_proj.{i}.weight")  # Conv2d 1x1 (C, C, 1, 1)
            params[f"input_proj_{i}"] = {
                "kernel": w[:, :, 0, 0].T, "bias": sd(f"input_proj.{i}.bias"),
            }
        else:  # empty Sequential: pixel-decoder channels already match
            params[f"input_proj_{i}"] = {
                "kernel": np.eye(hidden_dim, dtype=np.float32),
                "bias": np.zeros((hidden_dim,), np.float32),
            }
    for i in range(dec_layers):
        params[f"cross_attn_{i}"] = _attn_block(
            sd, "multihead_attn", f"transformer_cross_attention_layers.{i}.")
        params[f"self_attn_{i}"] = _attn_block(
            sd, "self_attn", f"transformer_self_attention_layers.{i}.")
        params[f"ffn_{i}"] = _ffn_block(sd, f"transformer_ffn_layers.{i}.")
    if "reid_embed.layers.0.weight" in sd:
        params["reid_embed"] = _mlp(sd, "reid_embed")
    return params


# ---------------------------------------------------------------------------
# Tracker / refiner
# ---------------------------------------------------------------------------

def convert_tracker(sd: StateDict, n_layers: int = 6) -> dict:
    params = {
        "decoder_norm": _ln(sd, "decoder_norm"),
        "class_embed": _lin(sd, "class_embed"),
        "mask_embed": _mlp(sd, "mask_embed"),
        "ref_proj": _mlp(sd, "ref_proj"),
    }
    w = sd("mask_feature_proj.weight")  # Conv2d 1x1
    params["mask_feature_proj"] = {
        "kernel": w[:, :, 0, 0].T, "bias": sd("mask_feature_proj.bias"),
    }
    for i in range(n_layers):
        params[f"cross_attn_{i}"] = _attn_block(
            sd, "multihead_attn", f"transformer_cross_attention_layers.{i}.")
        params[f"self_attn_{i}"] = _attn_block(
            sd, "self_attn", f"transformer_self_attention_layers.{i}.")
        params[f"ffn_{i}"] = _ffn_block(sd, f"transformer_ffn_layers.{i}.")
    return params


def convert_refiner(sd: StateDict, n_layers: int = 6) -> dict:
    params = {
        "decoder_norm": _ln(sd, "decoder_norm"),
        "class_embed": _lin(sd, "class_embed"),
        "mask_embed": _mlp(sd, "mask_embed"),
        "activation_proj": _lin(sd, "activation_proj"),
    }
    for i in range(n_layers):
        params[f"time_attn_{i}"] = _attn_block(
            sd, "self_attn", f"transformer_time_self_attention_layers.{i}.")
        params[f"obj_attn_{i}"] = _attn_block(
            sd, "self_attn", f"transformer_obj_self_attention_layers.{i}.")
        params[f"cross_attn_{i}"] = _attn_block(
            sd, "multihead_attn", f"transformer_cross_attention_layers.{i}.")
        params[f"ffn_{i}"] = _ffn_block(sd, f"transformer_ffn_layers.{i}.")
        params[f"short_conv_{i}"] = {
            "conv5": _conv1d(sd, f"conv_short_aggregate_layers.{i}.0"),
            "conv3": _conv1d(sd, f"conv_short_aggregate_layers.{i}.2"),
            "norm": _ln(sd, f"conv_norms.{i}"),
        }
    return params


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

_IGNORED = re.compile(
    r"^(criterion\.|sem_seg_head\.predictor\.pe_layer|.*\.noiser\.)"
    r"|.*relative_position_index$|.*num_batches_tracked$|^pixel_(mean|std)$"
)


def convert_dvis(
    state_dict: dict,
    *,
    backbone: str = "resnet50",
    pixel_decoder_layers: int = 6,
    dec_layers: int = 9,
    hidden_dim: int = 256,
    tracker_layers: int = 6,
    refiner_layers: int = 6,
    swin_depths=(2, 2, 6, 2),
) -> tuple[dict, list[str]]:
    """Full DVIS/CTVIS/Mask2Former d2 state dict -> DVISPlus params.

    Returns (params, leftover_keys). Tracker/refiner sections convert only
    when present (CTVIS checkpoints have neither; online has no refiner) —
    the staged hand-off (`train_net_video.py:396-398`) loads partial trees
    over fresh inits via utils/checkpoint.py.
    """
    sd = StateDict(state_dict)
    segmenter: dict = {}
    if backbone == "resnet50":
        segmenter["backbone"] = convert_d2_resnet50(sd.sub("backbone."))
    elif backbone == "swin":
        segmenter["backbone"] = convert_swin(sd.sub("backbone."), depths=swin_depths)
    else:
        raise ValueError(f"unsupported backbone {backbone!r}")
    segmenter["pixel_decoder"] = convert_pixel_decoder(
        sd.sub("sem_seg_head.pixel_decoder."), n_layers=pixel_decoder_layers)
    segmenter["decoder"] = convert_predictor(
        sd.sub("sem_seg_head.predictor."), dec_layers=dec_layers,
        hidden_dim=hidden_dim)

    params = {"segmenter": segmenter}
    if "tracker.decoder_norm.weight" in sd:
        params["tracker"] = convert_tracker(sd.sub("tracker."), n_layers=tracker_layers)
    if "refiner.decoder_norm.weight" in sd:
        params["refiner"] = convert_refiner(sd.sub("refiner."), n_layers=refiner_layers)

    leftover = [k for k in sd.unconsumed() if not _IGNORED.match(k)]
    return params, leftover


def load_torch_checkpoint(path: str) -> dict:
    """Load a d2 ``.pth`` (handles the {'model': ...} wrapper) as numpy."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items()}
