"""Staged panoptic training: CTVIS -> DVIS online -> DVIS offline.

Equivalent of the reference pipeline (`train_net_video.py` + configs, SURVEY
§2.2/P17-P20):

- stage "ctvis": the full segmenter trains on frame-level set prediction
  (criterion per frame) plus the contrastive ReID loss over frames;
- stage "online": segmenter frozen (`meta_architecture.py:486-489`), the
  referring tracker trains with query-order noise;
- stage "offline": segmenter + tracker frozen (`:1180-1181`), the temporal
  refiner trains over full clips.

Freezing is a parameter partition (gradients only flow into the stage's
subtree); each stage's checkpoint hands off to the next via the shared param
tree. Frame-folded criterion: (B, T) folds into the batch axis with T=1
targets — a documented simplification of the reference's segmenter-guided
consistent matcher (`VideoHungarianMatcher_Consistent`), which can slot in
behind ``match`` later.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import optax

from mmor_tpu.models.meta_arch import DVISConfig, DVISPlus
from mmor_tpu.train.criterion import (
    CriterionConfig,
    consistent_match,
    loss_labels,
    loss_masks,
    match,
    video_set_criterion,
)
from mmor_tpu.train.ctvis import (
    cl_memory_loss,
    cl_ref_loss,
    ctvis_reid_loss,
    init_class_memory,
)
from mmor_tpu.train.trainer import partition_params

STAGE_TRAINABLE = {
    "ctvis": ("segmenter",),
    "online": ("tracker",),
    "offline": ("refiner",),
}


def _default_weights(crit: CriterionConfig):
    from mmor_tpu.train.criterion import build_class_weights

    return build_class_weights(crit)


@dataclass(frozen=True)
class PanopticTrainConfig:
    stage: str = "ctvis"
    # guide tracker/refiner matching with the frozen segmenter's predictions
    # (reference: enabled for the first half of training)
    match_from_segmenter: bool = False
    # tracker/refiner-stage contrastive reference loss (`USE_CL`): off by
    # default to match the published OR configs
    # (configs/dvis_Plus/HybridOR/DVIS_Plus_*_R50.yaml set USE_CL: False);
    # when on, the online stage adds get_cl_loss_ref over pred_references
    # and the offline stage adds get_cl_loss_with_memory with the
    # cross-video per-class memory threaded through the train state
    use_cl: bool = False
    cl_memory_len: int = 20  # Outputs_Memory_PerClasses(max_len=20)
    criterion: CriterionConfig = field(default_factory=CriterionConfig)
    reid_weight: float = 2.0  # cfg.MODEL.CL_PLUGIN.REID_WEIGHT
    aux_reid_weight: float = 3.0
    num_negatives: int = 99  # cfg.MODEL.CL_PLUGIN.NUM_NEGATIVES
    learning_rate: float = 1e-4  # AdamW, CTVIS_r50.yaml
    weight_decay: float = 0.05
    grad_clip: float = 0.01  # detectron2 full-model clip value
    backbone_multiplier: float = 0.1  # SOLVER.BACKBONE_MULTIPLIER
    weight_decay_norm: float = 0.0  # SOLVER.WEIGHT_DECAY_NORM
    weight_decay_embed: float = 0.0  # SOLVER.WEIGHT_DECAY_EMBED


_EMBED_PARAMS = ("query_feat", "query_embed", "level_embed", "rel_pos_bias")
# norm-module name fragments (LayerNorm/GroupNorm/Swin LN); FrozenBN is
# separate — its affine params are buffers in detectron2, never optimized
_NORM_PAT = ("norm", "ln1", "ln2")
_FROZEN_BN = ("stem_bn", "bn1", "bn2", "bn3", "shortcut_bn")


def _ppath(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def panoptic_param_labels(params):
    """detectron2 optimizer groups (`train_net_video.py:181-260`):

    - backbone params get lr x BACKBONE_MULTIPLIER, combined with the decay
      overrides (norm modules -> WEIGHT_DECAY_NORM, Embedding-style params +
      relative-position-bias tables -> WEIGHT_DECAY_EMBED);
    - ResNet FrozenBN affine params are buffers in detectron2 (never in the
      optimizer) -> label 'frozen', updates zeroed.
    """
    def label(path, _):
        p = _ppath(path)
        leaf = p.rsplit("/", 1)[-1]
        parent = p.rsplit("/", 2)[-2] if "/" in p else ""
        bb = "backbone" in p
        if bb and any(parent.endswith(tag) for tag in _FROZEN_BN):
            return "frozen"
        if leaf in _EMBED_PARAMS:
            kind = "embed"
        elif any(tag in parent for tag in _NORM_PAT):
            kind = "norm"
        else:
            kind = "base"
        return f"bb_{kind}" if bb else kind
    return jax.tree_util.tree_map_with_path(label, params)


def make_panoptic_optimizer(cfg: PanopticTrainConfig) -> optax.GradientTransformation:
    adamw = lambda lr, wd: optax.adamw(lr, weight_decay=wd)
    lr, bb_lr = cfg.learning_rate, cfg.learning_rate * cfg.backbone_multiplier
    groups = optax.multi_transform(
        {
            "base": adamw(lr, cfg.weight_decay),
            "norm": adamw(lr, cfg.weight_decay_norm),
            "embed": adamw(lr, cfg.weight_decay_embed),
            "bb_base": adamw(bb_lr, cfg.weight_decay),
            "bb_norm": adamw(bb_lr, cfg.weight_decay_norm),
            "bb_embed": adamw(bb_lr, cfg.weight_decay_embed),
            "frozen": optax.set_to_zero(),
        },
        panoptic_param_labels,
    )
    # full-model gradient clip BEFORE the groups, matching the reference's
    # FullModelGradientClippingOptimizer (clip over all params jointly)
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), groups)


def _fold_time(targets):
    """(B, N, T, H, W) video targets -> (B*T, N, 1, H, W) frame targets."""
    masks = targets["masks"]
    b, n, t, h, w = masks.shape
    frame_masks = masks.transpose(0, 2, 1, 3, 4).reshape(b * t, n, 1, h, w)
    labels = jnp.repeat(targets["labels"], t, axis=0)
    valid = jnp.repeat(targets["valid"], t, axis=0)
    if "frame_valid" in targets:  # (B, N, T) per-frame visibility
        fv = targets["frame_valid"].transpose(0, 2, 1).reshape(b * t, n)
        valid = valid & fv
    return {"labels": labels, "masks": frame_masks, "valid": valid}


def make_panoptic_train_step(
    model: DVISPlus,
    cfg: PanopticTrainConfig,
    params,
    class_weights=None,
):
    """Build (step_fn(state, batch, key) -> (state, metrics), init_state).

    batch: images (B*T, H, W, 3) normalized; num_frames static via closure is
    taken from targets; targets: labels (B, N), masks (B, N, T, H/4, W/4),
    valid (B, N), optional frame_valid (B, N, T).
    """
    tx = make_panoptic_optimizer(cfg)
    trainable, _frozen, rebuild = partition_params(
        params, STAGE_TRAINABLE[cfg.stage]
    )
    state = {
        "trainable": trainable,
        "opt_state": tx.init(trainable),
        "step": jnp.zeros((), jnp.int32),
    }
    if cfg.use_cl and cfg.stage == "offline":
        rcfg = model.cfg.refiner
        state["cl_memory"] = init_class_memory(
            rcfg.num_classes, cfg.cl_memory_len, rcfg.hidden_dim)

    def losses_ctvis(full_params, batch, key):
        images, targets = batch["images"], batch["targets"]
        b, n, t = targets["masks"].shape[:3]
        key, k_dp = jax.random.split(key)
        # train=True: backbone stochastic depth (swin/vit_adapter DropPath)
        seg = model.apply(full_params, images, train=True,
                          rngs={"dropout": k_dp},
                          method=DVISPlus.segment_frames)
        outputs = {
            "pred_logits": seg["pred_logits"],  # (B*T, Q, K+1)
            "pred_masks": seg["pred_masks"],  # (B*T, Q, 1, H, W)
            "aux_outputs": [
                {"pred_logits": a["pred_logits"], "pred_masks": a["pred_masks"]}
                for a in seg["aux_outputs"]
            ],
        }
        frame_targets = _fold_time(targets)
        key, k_crit, k_match, k_neg = jax.random.split(key, 4)
        losses = video_set_criterion(
            cfg.criterion, outputs, frame_targets, k_crit, class_weights
        )
        # contrastive ReID across frames
        assignment = match(cfg.criterion, outputs, frame_targets, k_match)
        q = seg["pred_embds"].shape[1]
        embeds = seg["pred_embds"].reshape(b, t, q, -1)
        reid = ctvis_reid_loss(
            embeds,
            assignment.reshape(b, t, n),
            frame_targets["valid"].reshape(b, t, n),
            k_neg,
            num_negatives=min(cfg.num_negatives, q - 1),
        )
        losses["loss_reid"] = reid["loss_reid"]
        losses["loss_aux_reid"] = reid["loss_aux_reid"]
        losses["total"] = (losses["total"]
                           + cfg.reid_weight * reid["loss_reid"]
                           + cfg.aux_reid_weight * reid["loss_aux_reid"])
        return losses

    def _video_outputs(full_params, batch, key, with_refiner: bool):
        images, targets = batch["images"], batch["targets"]
        b, n, t = targets["masks"].shape[:3]
        seg = jax.lax.stop_gradient(
            model.apply(full_params, images, method=DVISPlus.segment_frames)
        )
        q, c = seg["pred_embds"].shape[1:]
        embds = seg["pred_embds"].reshape(b, t, q, c)
        norm = embds / (jnp.linalg.norm(embds, axis=-1, keepdims=True) + 1e-6)
        mf = seg["mask_features"]
        mask_features = mf.reshape(b, t, *mf.shape[2:])
        out, _state = model.apply(
            full_params, norm, embds, mask_features,
            noise_key=key, train=not with_refiner,
            method=DVISPlus.track,
        )
        if with_refiner:
            out = jax.lax.stop_gradient(out)
            out = model.apply(
                full_params,
                out["pred_embds"], out["pred_embds"], mask_features,
                train=True, method=DVISPlus.refine,
            )
        return out

    def losses_tracker(full_params, batch, key, with_refiner: bool,
                       cl_memory=None):
        """Tracker/refiner stages: one consistent (first-appearance) match per
        clip — optionally guided by the frozen segmenter — then per-frame
        class/mask losses with the fixed assignment (DVIS semantics).
        Returns (losses, new_cl_memory) — the memory is None unless
        cfg.use_cl and with_refiner."""
        targets = batch["targets"]
        b, n, t = targets["masks"].shape[:3]
        k_fwd, k_match, k_pts = jax.random.split(key, 3)
        out = _video_outputs(full_params, batch, k_fwd, with_refiner)
        q = out["pred_masks"].shape[1]

        if "frame_valid" not in targets:
            targets = dict(targets, frame_valid=jnp.broadcast_to(
                targets["valid"][..., None], (b, n, t)
            ))
        matcher_outputs = None
        if cfg.match_from_segmenter:
            # segmenter-guided matching, used for the first half of training
            # in the reference (meta_architecture.py:670-677)
            seg = jax.lax.stop_gradient(
                model.apply(full_params, batch["images"],
                            method=DVISPlus.segment_frames)
            )
            matcher_outputs = {
                "pred_logits": seg["pred_logits"].reshape(b, t, q, -1),
                "pred_masks": seg["pred_masks"].reshape(b, t, q, *seg["pred_masks"].shape[-2:])
                .transpose(0, 2, 1, 3, 4),
            }
        assignment = consistent_match(
            cfg.criterion, out, targets, k_match, matcher_outputs=matcher_outputs
        )  # (B, N)

        def fold(o):
            logits = o["pred_logits"]  # (B, T, Q, K+1)
            masks = o["pred_masks"]  # (B, Q, T, H, W)
            return {
                "pred_logits": logits.reshape(b * t, q, -1),
                "pred_masks": masks.transpose(0, 2, 1, 3, 4).reshape(
                    b * t, q, 1, *masks.shape[-2:]
                ),
            }

        frame_targets = _fold_time(targets)
        tiled_assignment = jnp.repeat(assignment, t, axis=0)  # (B*T, N)
        losses: dict = {}
        total = 0.0
        layer_outputs = [fold(out)] + [fold(a) for a in out.get("aux_outputs", [])]
        for i, o in enumerate(layer_outputs):
            k_pts, k_layer = jax.random.split(k_pts)
            l_ce = loss_labels(cfg.criterion, o, frame_targets, tiled_assignment,
                               class_weights if class_weights is not None
                               else _default_weights(cfg.criterion))
            l_mask, l_dice = loss_masks(cfg.criterion, o, frame_targets,
                                        tiled_assignment, k_layer)
            suffix = "" if i == 0 else f"_{i - 1}"
            losses[f"loss_ce{suffix}"] = l_ce
            losses[f"loss_mask{suffix}"] = l_mask
            losses[f"loss_dice{suffix}"] = l_dice
            total = total + (cfg.criterion.class_weight * l_ce
                             + cfg.criterion.mask_weight * l_mask
                             + cfg.criterion.dice_weight * l_dice)

        new_memory = None
        if cfg.use_cl:
            ok = targets["valid"] & (assignment >= 0)
            if not with_refiner:
                # online: get_cl_loss_ref over the tracker's references
                cl = cl_ref_loss(out["pred_references"], assignment, ok)
            else:
                # offline: class-memory contrastive over refiner embeddings
                cl, new_memory = cl_memory_loss(
                    out["pred_embds"], assignment, ok,
                    targets["labels"], cl_memory)
            losses["loss_reid"] = cl["loss_reid"]
            losses["loss_aux_reid"] = cl["loss_aux_reid"]
            total = total + (cfg.reid_weight * cl["loss_reid"]
                             + cfg.aux_reid_weight * cl["loss_aux_reid"])
        losses["total"] = total
        return losses, new_memory

    def step_fn(state, batch, key):
        def loss_fn(trainable_now):
            full = rebuild(trainable_now)
            memory = None
            if cfg.stage == "ctvis":
                losses = losses_ctvis(full, batch, key)
            elif cfg.stage == "online":
                losses, _ = losses_tracker(full, batch, key,
                                           with_refiner=False)
            elif cfg.stage == "offline":
                losses, memory = losses_tracker(
                    full, batch, key, with_refiner=True,
                    cl_memory=state.get("cl_memory"))
            else:
                raise ValueError(f"unknown stage {cfg.stage!r}")
            return losses["total"], (losses, memory)

        (total, (losses, memory)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["trainable"])
        updates, opt_state = tx.update(grads, state["opt_state"], state["trainable"])
        new_trainable = optax.apply_updates(state["trainable"], updates)
        new_state = {
            "trainable": new_trainable,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        if memory is not None:
            new_state["cl_memory"] = jax.lax.stop_gradient(memory)
        elif "cl_memory" in state:
            new_state["cl_memory"] = state["cl_memory"]
        metrics = {k: v for k, v in losses.items() if not k[-1].isdigit()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step_fn, state, rebuild


def make_sharded_panoptic_train_step(
    mesh,
    model: DVISPlus,
    cfg: PanopticTrainConfig,
    params,
    class_weights=None,
):
    """Data-parallel panoptic step over the mesh's ``data`` axis.

    The reference trains DP via detectron2's ``--num-gpus`` launcher
    (`train_net_video.py:412-414`); here the batch (images with the clip
    axis folded into the batch dim, per-clip targets) shards on ``data``,
    stage-trainable params replicate, and XLA inserts the gradient
    all-reduce over ICI. Clips are independent samples, so sharding the
    batch axis is exact — each device matches/criterions its own clips.

    Returns (jitted step, state ON THE MESH, rebuild). Both the B and B*T
    leading axes must be divisible by the data-axis size.
    """
    from mmor_tpu.parallel.mesh import batch_sharding, replicate, replicated

    step_fn, state, rebuild = make_panoptic_train_step(
        model, cfg, params, class_weights=class_weights
    )
    state = replicate(mesh, state)
    rep = replicated(mesh)
    jitted = jax.jit(
        step_fn,
        in_shardings=(rep, batch_sharding(mesh), rep),
        donate_argnums=(0,),
    )
    return jitted, state, rebuild
