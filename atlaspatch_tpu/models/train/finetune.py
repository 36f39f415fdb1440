"""SAM2 tissue-segmentation finetuning on TPU meshes.

The reference's segmentation model was produced by finetuning SAM2 hiera-tiny
with the backbone frozen and only normalization layers trained (reference:
CHANGELOG.md:13, SURVEY.md §6). This module reproduces that training
capability TPU-natively: a jittable train step (focal + dice loss on mask
logits, IoU head MSE) whose gradient mask selects LayerNorm scale/bias only,
sharded data-parallel over a `('data','model')` mesh with parameters
replicated — XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from atlaspatch_tpu.models.sam2.config import SAM2Config
from atlaspatch_tpu.models.sam2.interp import interpolate_torch
from atlaspatch_tpu.models.sam2.model import SAM2ImageModel, normalize_images


def norm_param_mask(params: Any) -> Any:
    """Pytree of bools: True only for LayerNorm scales/biases (trainable)."""

    def is_norm(path) -> bool:
        # a param is a norm param iff one of its OWNING modules has "norm"
        # in its name (layer_norm1, trunk_norm, ...); the leaf name itself
        # ("scale"/"bias") is shared with convs and must not match
        names = [p.key for p in path if hasattr(p, "key")]
        return any("norm" in n for n in names[:-1])

    return jax.tree_util.tree_map_with_path(lambda p, _: is_norm(p), params)


def _sigmoid_focal_loss(logits, targets, alpha=0.25, gamma=2.0, reduce=True):
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = loss * (alpha * targets + (1 - alpha) * (1 - targets))
    return loss.mean() if reduce else loss


def _dice_loss(logits, targets, eps=1.0, reduce=True):
    p = jax.nn.sigmoid(logits)
    num = 2 * (p * targets).sum(axis=(-2, -1)) + eps
    den = p.sum(axis=(-2, -1)) + targets.sum(axis=(-2, -1)) + eps
    per_sample = 1 - num / den
    return per_sample.mean() if reduce else per_sample


def seg_forward(cfg: SAM2Config, params, images_u8, out_hw):
    """Full-frame box-prompted forward: (logits at out_hw, iou_pred)."""
    model = SAM2ImageModel(cfg)
    pixels = normalize_images(cfg, images_u8)
    B = images_u8.shape[0]
    box = jnp.asarray([[0.0, 0.0, cfg.image_size, cfg.image_size]], jnp.float32)
    boxes = jnp.broadcast_to(box[None], (B, 1, 4))
    masks, iou_pred, _obj = model.apply(
        {"params": params}, pixels, boxes, multimask_output=False
    )
    low_res = masks[:, 0, 0]  # (B, S/4, S/4)
    logits = interpolate_torch(low_res[..., None], out_hw, "bilinear")[..., 0]
    return logits, iou_pred


def _per_sample_loss_terms(logits, iou_pred, target_masks):
    """(per-sample loss vector, per-sample IoU vector) — the single source of
    the training objective, shared by seg_loss_fn and the eval step."""
    focal = _sigmoid_focal_loss(logits, target_masks, reduce=False).mean(
        axis=(-2, -1)
    )
    dice = _dice_loss(logits, target_masks, reduce=False)
    pred_bin = (logits > 0).astype(jnp.float32)
    inter = (pred_bin * target_masks).sum(axis=(-2, -1))
    union = jnp.clip(
        pred_bin.sum(axis=(-2, -1)) + target_masks.sum(axis=(-2, -1)) - inter, 1.0
    )
    actual_iou = inter / union
    # IoU-head regression toward the actual IoU of the predicted mask
    iou_loss = (iou_pred[:, 0, 0] - actual_iou) ** 2
    return 20.0 * focal + dice + iou_loss, actual_iou


def seg_loss_fn(cfg: SAM2Config, params, images_u8, target_masks):
    """images_u8 (B,S,S,3); target_masks (B,S,S) in {0,1} at full image res."""
    logits, iou_pred = seg_forward(cfg, params, images_u8, target_masks.shape[-2:])
    loss, _iou = _per_sample_loss_terms(logits, iou_pred, target_masks)
    return loss.mean()


def make_eval_step(cfg: SAM2Config):
    """jitted eval_step(params, images_u8, targets) → per-sample (loss, IoU)
    vectors, so callers can drop padding duplicates before averaging."""

    def eval_step(params, images_u8, targets):
        logits, iou_pred = seg_forward(cfg, params, images_u8, targets.shape[-2:])
        return _per_sample_loss_terms(logits, iou_pred, targets)

    return jax.jit(eval_step)


def make_optimizer(
    learning_rate: float = 1e-4,
    *,
    schedule: str = "constant",
    warmup_steps: int = 0,
    total_steps: int | None = None,
):
    """AdamW with an optional LR schedule.

    ``constant`` (default, with optional linear warmup) or ``cosine``
    (linear warmup to the peak then cosine decay over total_steps). The
    schedule rides on the optimizer's step count, so checkpoint resume
    continues it at the right position.
    """
    if schedule == "cosine":
        total = max(int(total_steps or 0), warmup_steps + 1)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=total,
        )
    elif schedule == "constant":
        if warmup_steps > 0:
            lr = optax.join_schedules(
                [
                    optax.linear_schedule(0.0, learning_rate, warmup_steps),
                    optax.constant_schedule(learning_rate),
                ],
                [warmup_steps],
            )
        else:
            lr = learning_rate
    else:
        raise ValueError(f"unknown LR schedule: {schedule!r}")
    return optax.adamw(lr, weight_decay=0.01)


def make_train_step(cfg: SAM2Config, optimizer, *, trainable: str = "norms"):
    """Returns train_step(params, opt_state, images_u8, targets) → (params, opt_state, loss).

    ``trainable="norms"`` (the reference recipe): gradients flow through the
    whole model but updates apply only to normalization parameters.
    ``trainable="all"``: every parameter updates — the mode for training from
    scratch/random init, where norm-only recalibration has no pretrained
    features to steer.
    """
    if trainable not in ("norms", "all"):
        raise ValueError(f"trainable must be 'norms' or 'all', got {trainable!r}")

    def train_step(params, opt_state, images_u8, targets):
        loss, grads = jax.value_and_grad(
            lambda p: seg_loss_fn(cfg, p, images_u8, targets)
        )(params)
        if trainable == "norms":
            mask = norm_param_mask(params)
            grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, mask
            )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        if trainable == "norms":
            # Mask the *updates* too: AdamW's decoupled weight decay would
            # otherwise shrink frozen parameters even with zero gradients.
            updates = jax.tree.map(
                lambda u, m: u if m else jnp.zeros_like(u), updates, mask
            )
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def shard_train_step(cfg: SAM2Config, optimizer, mesh: Mesh, *, trainable: str = "norms"):
    """jit the train step over a mesh: batch sharded over 'data', params and
    optimizer state replicated (pure DP — collectives inserted by XLA)."""
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    step = make_train_step(cfg, optimizer, trainable=trainable)
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, batch_sharded, batch_sharded),
        out_shardings=(replicated, replicated, replicated),
    )
