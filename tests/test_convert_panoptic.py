"""Panoptic torch->JAX checkpoint converter tests.

Numerics: locally-built torch references mirroring the detectron2 layouts
(functional torch forwards consuming the same state-dict keys the converter
reads — `train_net_video.py:396-398` is the load path being replicated).
Structure: a synthetic full DVIS checkpoint must convert onto our module
trees exactly (same leaves, same shapes, nothing left over).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mmor_tpu.utils import convert_panoptic as cp  # noqa: E402


def rand(*shape):
    return torch.randn(*shape) * 0.1


def bn_keys(sd, name, c):
    sd[f"{name}.weight"] = rand(c) + 1.0
    sd[f"{name}.bias"] = rand(c)
    sd[f"{name}.running_mean"] = rand(c)
    sd[f"{name}.running_var"] = rand(c).abs() + 0.5


def frozen_bn_fwd(x, sd, name, eps=1e-5):
    scale = sd[f"{name}.weight"] / torch.sqrt(sd[f"{name}.running_var"] + eps)
    bias = sd[f"{name}.bias"] - sd[f"{name}.running_mean"] * scale
    return x * scale[None, :, None, None] + bias[None, :, None, None]


# ---------------------------------------------------------------------------
# ResNet-50
# ---------------------------------------------------------------------------

def make_d2_r50_sd(stage_blocks=(3, 4, 6, 3)):
    sd = {}
    sd["stem.conv1.weight"] = rand(64, 3, 7, 7)
    bn_keys(sd, "stem.conv1.norm", 64)
    in_ch = 64
    for stage, n_blocks in enumerate(stage_blocks):
        out_ch = 256 * 2 ** stage
        bc = out_ch // 4
        for b in range(n_blocks):
            p = f"res{stage + 2}.{b}"
            sd[f"{p}.conv1.weight"] = rand(bc, in_ch, 1, 1)
            bn_keys(sd, f"{p}.conv1.norm", bc)
            sd[f"{p}.conv2.weight"] = rand(bc, bc, 3, 3)
            bn_keys(sd, f"{p}.conv2.norm", bc)
            sd[f"{p}.conv3.weight"] = rand(out_ch, bc, 1, 1)
            bn_keys(sd, f"{p}.conv3.norm", out_ch)
            if b == 0:
                sd[f"{p}.shortcut.weight"] = rand(out_ch, in_ch, 1, 1)
                bn_keys(sd, f"{p}.shortcut.norm", out_ch)
            in_ch = out_ch
    return sd


def torch_d2_r50_fwd(x, sd, stage_blocks=(3, 4, 6, 3)):
    """Functional d2-ResNet50 forward over the raw state dict (NCHW)."""
    x = F.conv2d(x, sd["stem.conv1.weight"], stride=2, padding=3)
    x = F.relu(frozen_bn_fwd(x, sd, "stem.conv1.norm"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    outs = {}
    for stage, n_blocks in enumerate(stage_blocks):
        for b in range(n_blocks):
            p = f"res{stage + 2}.{b}"
            stride = 2 if (stage > 0 and b == 0) else 1
            if f"{p}.shortcut.weight" in sd:
                sc = F.conv2d(x, sd[f"{p}.shortcut.weight"], stride=stride)
                sc = frozen_bn_fwd(sc, sd, f"{p}.shortcut.norm")
            else:
                sc = x
            h = F.relu(frozen_bn_fwd(F.conv2d(x, sd[f"{p}.conv1.weight"]),
                                     sd, f"{p}.conv1.norm"))
            h = F.relu(frozen_bn_fwd(
                F.conv2d(h, sd[f"{p}.conv2.weight"], stride=stride, padding=1),
                sd, f"{p}.conv2.norm"))
            h = frozen_bn_fwd(F.conv2d(h, sd[f"{p}.conv3.weight"]),
                              sd, f"{p}.conv3.norm")
            x = F.relu(h + sc)
        outs[f"res{stage + 2}"] = x
    return outs


def test_resnet50_matches_torch():
    from mmor_tpu.models.resnet import ResNet50

    torch.manual_seed(0)
    sd = make_d2_r50_sd()
    x = torch.randn(1, 3, 64, 96) * 0.5
    with torch.no_grad():
        ref = torch_d2_r50_fwd(x, sd)

    params = cp.convert_d2_resnet50(cp.StateDict({k: v.numpy() for k, v in sd.items()}))
    model = ResNet50()
    got = model.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for name in ("res2", "res3", "res4", "res5"):
        r = ref[name].numpy().transpose(0, 2, 3, 1)
        g = np.asarray(got[name])
        assert g.shape == r.shape, name
        # random-init activations grow to ~1e3 through 50 layers; judge
        # closeness relative to the activation scale
        np.testing.assert_allclose(g, r, rtol=2e-3,
                                   atol=1e-4 * np.abs(r).max()), name


# ---------------------------------------------------------------------------
# MultiheadAttention -> AttentionBlock
# ---------------------------------------------------------------------------

def test_attention_block_matches_torch_mha():
    from mmor_tpu.models.mask2former_decoder import AttentionBlock

    torch.manual_seed(1)
    c, heads, lq, lk = 32, 4, 5, 7
    mha = torch.nn.MultiheadAttention(c, heads, batch_first=True)
    norm = torch.nn.LayerNorm(c)
    x = torch.randn(2, lq, c)      # identity/residual path
    q_in = torch.randn(2, lq, c)   # query input (e.g. with pos embed)
    k_in = torch.randn(2, lk, c)
    v_in = torch.randn(2, lk, c)
    with torch.no_grad():
        attn, _ = mha(q_in, k_in, v_in, need_weights=False)
        ref = norm(x + attn)

    sd = {f"multihead_attn.{k}": v.detach().numpy()
          for k, v in mha.state_dict().items()}
    sd["norm.weight"] = norm.weight.detach().numpy()
    sd["norm.bias"] = norm.bias.detach().numpy()
    params = cp._attn_block(cp.StateDict(sd), "multihead_attn", "")

    block = AttentionBlock(dim=c, n_heads=heads)
    got = block.apply({"params": params}, jnp.asarray(x.numpy()),
                      jnp.asarray(q_in.numpy()), jnp.asarray(k_in.numpy()),
                      jnp.asarray(v_in.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Swin window attention (packed qkv + relative position bias)
# ---------------------------------------------------------------------------

def test_swin_window_attention_matches_torch():
    from mmor_tpu.models.swin import WindowAttention, _relative_position_index

    torch.manual_seed(2)
    c, heads, w = 16, 4, 4
    ww = w * w
    qkv_w, qkv_b = rand(3 * c, c), rand(3 * c)
    proj_w, proj_b = rand(c, c), rand(c)
    table = rand((2 * w - 1) ** 2, heads)
    x = torch.randn(3, ww, c)

    with torch.no_grad():
        qkv = (x @ qkv_w.T + qkv_b).reshape(3, ww, 3, heads, c // heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) / (c // heads) ** 0.5
        idx = torch.from_numpy(_relative_position_index(w).astype(np.int64))
        bias = table[idx.reshape(-1)].reshape(ww, ww, heads).permute(2, 0, 1)
        attn = torch.softmax(attn + bias[None], dim=-1)
        ref = ((attn @ v).transpose(1, 2).reshape(3, ww, c) @ proj_w.T + proj_b)

    params = {
        "qkv": {"kernel": qkv_w.numpy().T, "bias": qkv_b.numpy()},
        "proj": {"kernel": proj_w.numpy().T, "bias": proj_b.numpy()},
        "rel_pos_bias": table.numpy(),
    }
    block = WindowAttention(dim=c, n_heads=heads, window_size=w,
                            dtype=jnp.float32, param_dtype=jnp.float32)
    got = block.apply({"params": params}, jnp.asarray(x.numpy()), None)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Refiner short-term conv (replicate-padded Conv1d stack)
# ---------------------------------------------------------------------------

def test_short_conv_matches_torch():
    from mmor_tpu.models.refiner import ShortTermConv

    torch.manual_seed(3)
    c, t = 8, 9
    c5_w, c5_b = rand(c, c, 5), rand(c)
    c3_w, c3_b = rand(c, c, 3), rand(c)
    ln_w, ln_b = rand(c) + 1.0, rand(c)
    x = torch.randn(2, c, t)  # torch Conv1d layout (N, C, T)

    with torch.no_grad():
        h = F.conv1d(F.pad(x, (2, 2), mode="replicate"), c5_w, c5_b)
        h = F.relu(h)
        h = F.conv1d(F.pad(h, (1, 1), mode="replicate"), c3_w, c3_b)
        ref = F.layer_norm((h + x).transpose(1, 2), (c,), ln_w, ln_b)

    sd = {
        "conv_short_aggregate_layers.0.0.weight": c5_w.numpy(),
        "conv_short_aggregate_layers.0.0.bias": c5_b.numpy(),
        "conv_short_aggregate_layers.0.2.weight": c3_w.numpy(),
        "conv_short_aggregate_layers.0.2.bias": c3_b.numpy(),
        "conv_norms.0.weight": ln_w.numpy(),
        "conv_norms.0.bias": ln_b.numpy(),
    }
    view = cp.StateDict(sd)
    params = {
        "conv5": cp._conv1d(view, "conv_short_aggregate_layers.0.0"),
        "conv3": cp._conv1d(view, "conv_short_aggregate_layers.0.2"),
        "norm": cp._ln(view, "conv_norms.0"),
    }
    block = ShortTermConv(dim=c)
    got = block.apply({"params": params},
                      jnp.asarray(x.numpy().transpose(0, 2, 1)))  # (N, T, C)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Full structural roundtrip: synthetic DVIS-offline checkpoint
# ---------------------------------------------------------------------------

def _mha_keys(sd, prefix, c):
    sd[f"{prefix}.in_proj_weight"] = rand(3 * c, c)
    sd[f"{prefix}.in_proj_bias"] = rand(3 * c)
    sd[f"{prefix}.out_proj.weight"] = rand(c, c)
    sd[f"{prefix}.out_proj.bias"] = rand(c)


def _ln_keys(sd, prefix, c):
    sd[f"{prefix}.weight"] = rand(c)
    sd[f"{prefix}.bias"] = rand(c)


def _lin_keys(sd, prefix, cin, cout):
    sd[f"{prefix}.weight"] = rand(cout, cin)
    sd[f"{prefix}.bias"] = rand(cout)


def _mlp_keys(sd, prefix, cin, ch, cout):
    _lin_keys(sd, f"{prefix}.layers.0", cin, ch)
    _lin_keys(sd, f"{prefix}.layers.1", ch, ch)
    _lin_keys(sd, f"{prefix}.layers.2", ch, cout)


def _attn_layer_keys(sd, prefix, attn, c):
    _mha_keys(sd, f"{prefix}.{attn}", c)
    _ln_keys(sd, f"{prefix}.norm", c)


def _ffn_keys(sd, prefix, c, ffn):
    _lin_keys(sd, f"{prefix}.linear1", c, ffn)
    _lin_keys(sd, f"{prefix}.linear2", ffn, c)
    _ln_keys(sd, f"{prefix}.norm", c)


def make_dvis_sd(conv_dim=32, hidden=32, queries=8, classes=10, dec_layers=3,
                 pd_layers=2, tracker_layers=2, refiner_layers=2, ffn=64):
    sd = {k: v for k, v in make_d2_r50_sd().items()}
    sd = {f"backbone.{k}": v for k, v in sd.items()}

    pd = "sem_seg_head.pixel_decoder"
    sd[f"{pd}.transformer.level_embed"] = rand(3, conv_dim)
    for idx, cin in enumerate((2048, 1024, 512)):  # res5, res4, res3
        sd[f"{pd}.input_proj.{idx}.0.weight"] = rand(conv_dim, cin, 1, 1)
        sd[f"{pd}.input_proj.{idx}.0.bias"] = rand(conv_dim)
        _ln_keys(sd, f"{pd}.input_proj.{idx}.1", conv_dim)
    for i in range(pd_layers):
        lp = f"{pd}.transformer.encoder.layers.{i}"
        for name, cout in (("sampling_offsets", 8 * 3 * 4 * 2),
                           ("attention_weights", 8 * 3 * 4),
                           ("value_proj", conv_dim), ("output_proj", conv_dim)):
            _lin_keys(sd, f"{lp}.self_attn.{name}", conv_dim, cout)
        _ln_keys(sd, f"{lp}.norm1", conv_dim)
        _lin_keys(sd, f"{lp}.linear1", conv_dim, conv_dim * 4)
        _lin_keys(sd, f"{lp}.linear2", conv_dim * 4, conv_dim)
        _ln_keys(sd, f"{lp}.norm2", conv_dim)
    sd[f"{pd}.adapter_1.weight"] = rand(conv_dim, 256, 1, 1)
    _ln_keys(sd, f"{pd}.adapter_1.norm", conv_dim)
    sd[f"{pd}.layer_1.weight"] = rand(conv_dim, conv_dim, 3, 3)
    _ln_keys(sd, f"{pd}.layer_1.norm", conv_dim)
    sd[f"{pd}.mask_features.weight"] = rand(conv_dim, conv_dim, 3, 3)
    sd[f"{pd}.mask_features.bias"] = rand(conv_dim)

    pr = "sem_seg_head.predictor"
    sd[f"{pr}.query_feat.weight"] = rand(queries, hidden)
    sd[f"{pr}.query_embed.weight"] = rand(queries, hidden)
    sd[f"{pr}.level_embed.weight"] = rand(3, hidden)
    _ln_keys(sd, f"{pr}.decoder_norm", hidden)
    _lin_keys(sd, f"{pr}.class_embed", hidden, classes + 1)
    _mlp_keys(sd, f"{pr}.mask_embed", hidden, hidden, conv_dim)
    _mlp_keys(sd, f"{pr}.reid_embed", hidden, hidden, hidden)
    for i in range(dec_layers):
        _attn_layer_keys(sd, f"{pr}.transformer_cross_attention_layers.{i}",
                         "multihead_attn", hidden)
        _attn_layer_keys(sd, f"{pr}.transformer_self_attention_layers.{i}",
                         "self_attn", hidden)
        _ffn_keys(sd, f"{pr}.transformer_ffn_layers.{i}", hidden, ffn)

    _ln_keys(sd, "tracker.decoder_norm", hidden)
    _lin_keys(sd, "tracker.class_embed", 2 * hidden, classes + 1)
    _mlp_keys(sd, "tracker.mask_embed", hidden, hidden, conv_dim)
    _mlp_keys(sd, "tracker.ref_proj", hidden, hidden, hidden)
    sd["tracker.mask_feature_proj.weight"] = rand(conv_dim, conv_dim, 1, 1)
    sd["tracker.mask_feature_proj.bias"] = rand(conv_dim)
    for i in range(tracker_layers):
        _attn_layer_keys(sd, f"tracker.transformer_cross_attention_layers.{i}",
                         "multihead_attn", hidden)
        _attn_layer_keys(sd, f"tracker.transformer_self_attention_layers.{i}",
                         "self_attn", hidden)
        _ffn_keys(sd, f"tracker.transformer_ffn_layers.{i}", hidden, ffn)

    _ln_keys(sd, "refiner.decoder_norm", hidden)
    _lin_keys(sd, "refiner.class_embed", hidden, classes + 1)
    _mlp_keys(sd, "refiner.mask_embed", hidden, hidden, conv_dim)
    _lin_keys(sd, "refiner.activation_proj", hidden, 1)
    for i in range(refiner_layers):
        _attn_layer_keys(sd, f"refiner.transformer_time_self_attention_layers.{i}",
                         "self_attn", hidden)
        _attn_layer_keys(sd, f"refiner.transformer_obj_self_attention_layers.{i}",
                         "self_attn", hidden)
        _attn_layer_keys(sd, f"refiner.transformer_cross_attention_layers.{i}",
                         "multihead_attn", hidden)
        _ffn_keys(sd, f"refiner.transformer_ffn_layers.{i}", hidden, ffn)
        sd[f"refiner.conv_short_aggregate_layers.{i}.0.weight"] = rand(hidden, hidden, 5)
        sd[f"refiner.conv_short_aggregate_layers.{i}.0.bias"] = rand(hidden)
        sd[f"refiner.conv_short_aggregate_layers.{i}.2.weight"] = rand(hidden, hidden, 3)
        sd[f"refiner.conv_short_aggregate_layers.{i}.2.bias"] = rand(hidden)
        _ln_keys(sd, f"refiner.conv_norms.{i}", hidden)
    return {k: v.numpy() for k, v in sd.items()}


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


def test_full_dvis_structural_roundtrip():
    from mmor_tpu.models.mask2former_decoder import MaskDecoderConfig
    from mmor_tpu.models.refiner import RefinerConfig, TemporalRefiner
    from mmor_tpu.models.segmenter import SegmenterConfig, VideoSegmenter
    from mmor_tpu.models.tracker import ReferringTracker, TrackerConfig

    torch.manual_seed(4)
    sd = make_dvis_sd()
    params, leftover = cp.convert_dvis(
        sd, pixel_decoder_layers=2, dec_layers=3, hidden_dim=32,
        tracker_layers=2, refiner_layers=2)
    assert leftover == [], leftover
    assert set(params) == {"segmenter", "tracker", "refiner"}

    seg = VideoSegmenter(SegmenterConfig(
        decoder=MaskDecoderConfig.tiny(), conv_dim=32, mask_dim=32,
        pixel_decoder_layers=2))
    seg_init = seg.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32), 1)["params"]
    got, want = _flat(params["segmenter"]), _flat(seg_init)
    assert got == want, set(got.items()) ^ set(want.items())

    trk = ReferringTracker(TrackerConfig.tiny())
    trk_init = trk.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 32)), jnp.zeros((1, 2, 8, 32)),
        jnp.zeros((1, 2, 8, 8, 32)))["params"]
    got, want = _flat(params["tracker"]), _flat(trk_init)
    assert got == want, set(got.items()) ^ set(want.items())

    ref = TemporalRefiner(RefinerConfig.tiny())
    ref_init = ref.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 32)), jnp.zeros((1, 2, 8, 32)),
        jnp.zeros((1, 2, 8, 8, 32)))["params"]
    got, want = _flat(params["refiner"]), _flat(ref_init)
    assert got == want, set(got.items()) ^ set(want.items())


def test_ctvis_checkpoint_without_tracker():
    sd = {k: v for k, v in make_dvis_sd().items()
          if not k.startswith(("tracker.", "refiner."))}
    params, leftover = cp.convert_dvis(
        sd, pixel_decoder_layers=2, dec_layers=3, hidden_dim=32)
    assert leftover == []
    assert set(params) == {"segmenter"}


def test_load_torch_checkpoint_wrapper(tmp_path):
    path = tmp_path / "model.pth"
    torch.save({"model": {"a.weight": torch.ones(2, 3)},
                "iteration": 100}, path)
    sd = cp.load_torch_checkpoint(str(path))
    assert set(sd) == {"a.weight"}
    assert sd["a.weight"].shape == (2, 3)
