"""Jitted detection train / eval steps (DETR head + Hungarian + losses).

The detection counterpart of `train_step.py`: one jitted function covers
on-device augmentation, forward (backbone + DETR decoder + triplet
features), device-side Hungarian matching, the weighted loss sum
(train.py:1450 semantics) and the AdamW update. The reference's version of
this loop (/root/reference/train.py:1425-1479) crossed the device boundary
twice per step (matcher cost→CPU at train.py:963, `losses.item()` at
train.py:1462); this one never leaves the chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from arsvt_tpu.core.dtypes import DEFAULT_POLICY, FP32_POLICY, to_unit_float
from arsvt_tpu.models.detector import apply_detector, init_detector
from arsvt_tpu.objectives.detection_loss import (
    DetectionLossConfig,
    detection_loss,
)
from arsvt_tpu.objectives.matcher import MatcherConfig
from arsvt_tpu.parallel.sharding import shard_params
from arsvt_tpu.train.config import TrainConfig, resolve_detector
from arsvt_tpu.train.optim import make_optimizer


def make_detector_step_fns(cfg: TrainConfig, mesh=None):
    """Build (init_fn, train_step, eval_step) for the detection task.

    batch = {"image": (B,H,W,C) raw [0,1] float, "boxes": (B,M,4) xyxy
    normalized, "labels": (B,M) int32, "mask": (B,M) bool}.
    """
    det_cfg = resolve_detector(cfg)
    policy = DEFAULT_POLICY if cfg.bf16 else FP32_POLICY
    optimizer = make_optimizer(cfg)
    loss_cfg = DetectionLossConfig(
        num_classes=det_cfg.head.num_classes,
        background_weight=cfg.background_weight,
        w_ce=cfg.w_ce, w_bbox=cfg.w_bbox, w_giou=cfg.w_giou,
        w_triplet=cfg.w_triplet, triplet_margin=cfg.triplet_margin,
        matcher=MatcherConfig(),
    )

    if cfg.augment not in ("detection", "none"):
        # mirror the classification step's loudness: a typo (or a
        # classify-only mode like crop_flip) would otherwise silently
        # train un-augmented AND un-normalized, then serve with a
        # mismatched normalize_inputs contract
        raise ValueError(
            f"unknown augment mode {cfg.augment!r} for detect "
            "(expected 'detection' or 'none')"
        )
    aug = cfg.augment == "detection"
    if aug:
        from arsvt_tpu.data.augment import (
            DetectionAugmentConfig,
            detection_train_augment,
            eval_preprocess,
        )

        aug_cfg = DetectionAugmentConfig(
            image_size=det_cfg.backbone.image_size,
            warp_variant=cfg.warp_variant,
        )

        def augment_batch(rng, images, boxes, mask):
            keys = jax.random.split(rng, images.shape[0])
            return jax.vmap(
                lambda k, im, bx, ms: detection_train_augment(
                    k, im, bx, ms, aug_cfg
                )
            )(keys, images, boxes, mask)

        def eval_pre(images):
            return jax.vmap(
                lambda im: eval_preprocess(
                    im, size=det_cfg.backbone.image_size
                )
            )(images)

    def init_fn(rng):
        params = init_detector(rng, det_cfg)
        if mesh is not None:
            params = shard_params(params, mesh)
        opt_state = optimizer.init(params)
        state = {
            "params": params,
            "opt_state": opt_state,
            "step": jnp.zeros((), jnp.int32),
        }
        if mesh is not None:
            from arsvt_tpu.parallel.sharding import place_on_mesh

            state = place_on_mesh(state, mesh)
        return state

    def loss_fn(params, batch, rng):
        compute_params = policy.cast_to_compute(params)
        images = to_unit_float(batch["image"])  # uint8 rescales on device
        boxes, mask = batch["boxes"], batch["mask"]
        if aug:
            from arsvt_tpu.data.augment import augment_input_cast

            rng, aug_rng = jax.random.split(rng)
            images, boxes, mask = augment_batch(
                aug_rng, augment_input_cast(images), boxes, mask
            )
        outputs, feats = apply_detector(
            compute_params,
            images.astype(policy.compute_dtype),
            det_cfg,
            train=True, rng=rng, return_features=True, remat=cfg.remat,
            remat_policy=cfg.remat_policy, return_aux=cfg.aux_loss,
        )
        targets = {"boxes": boxes, "labels": batch["labels"], "mask": mask}
        aux = outputs.pop("aux", None)
        total, parts = detection_loss(outputs, targets, loss_cfg, feats)
        if aux is not None:
            # DETR deep supervision: every intermediate decoder layer gets
            # the same (independently matched) loss; the reference has no
            # equivalent and its decoder trains poorly for it. One vmapped
            # matcher+loss over the (L-1) layer axis — the per-layer python
            # loop of round 1 serialized L-1 matcher scans.
            aux_totals = jax.vmap(
                lambda cl, bx: detection_loss(
                    {"class_logits": cl, "boxes_cxcywh": bx},
                    targets, loss_cfg,
                )[0]
            )(aux["class_logits"], aux["boxes_cxcywh"])
            total = total + jnp.sum(aux_totals)
            parts = dict(parts, total=total)
        return total, parts

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, base_rng):
        from arsvt_tpu.train.accum import accumulated_value_and_grad

        step_rng = jax.random.fold_in(base_rng, state["step"])
        (_, parts), grads = accumulated_value_and_grad(
            loss_fn, state["params"], batch, step_rng, cfg.grad_accum, mesh,
        )
        if cfg.fused_adamw:
            from arsvt_tpu.train.optim import fused_adamw_update

            params, opt_state, grad_norm = fused_adamw_update(
                cfg, grads, state["opt_state"], state["params"],
                mesh=mesh,
            )
        else:
            updates, opt_state = optimizer.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            grad_norm = optax.global_norm(grads)
        metrics = {"loss": parts["total"], **{
            k: v for k, v in parts.items() if k != "total"
        }, "grad_norm": grad_norm}
        return (
            {"params": params, "opt_state": opt_state,
             "step": state["step"] + 1},
            metrics,
        )

    @jax.jit
    def eval_step(params, batch):
        compute_params = policy.cast_to_compute(params)
        images = to_unit_float(batch["image"])
        if aug:
            images = eval_pre(images)
        outputs = apply_detector(
            compute_params, images.astype(policy.compute_dtype), det_cfg,
            train=False,
        )
        targets = {
            "boxes": batch["boxes"], "labels": batch["labels"],
            "mask": batch["mask"],
        }
        # padded equal-shard eval streams carry "valid" (B,) 0/1: pad
        # images drop out of every loss term and of the count the trainer
        # weights this batch's scalars by
        valid = batch.get("valid")
        total, parts = detection_loss(
            outputs, targets, loss_cfg, None, image_weight=valid
        )
        count = (jnp.asarray(images.shape[0], jnp.int32) if valid is None
                 else jnp.sum(valid.astype(jnp.int32)))
        return {"loss": total, **parts, "count": count, "outputs": outputs}

    return init_fn, train_step, eval_step
