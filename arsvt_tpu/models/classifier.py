"""Full image classifier = backbone + classifier head.

The north-star model family (BASELINE.json configs 1-4): ViT-Tiny/Base/Large
with a 6-class recycling head. One params pytree, one jittable apply.
"""

from __future__ import annotations

import jax

from arsvt_tpu.models.vit import BackboneConfig, init_backbone, apply_backbone
from arsvt_tpu.models.heads import (
    ClassifierConfig,
    init_classifier,
    apply_classifier,
)


def init_image_classifier(key, backbone_cfg: BackboneConfig, num_classes: int):
    kb, kh = jax.random.split(key)
    head_cfg = ClassifierConfig(
        num_classes=num_classes, distilled=backbone_cfg.distilled
    )
    return {
        "backbone": init_backbone(kb, backbone_cfg),
        "classifier": init_classifier(kh, head_cfg, backbone_cfg.embed_dim),
    }


def apply_image_classifier(
    params,
    images,
    backbone_cfg: BackboneConfig,
    num_classes: int,
    *,
    train: bool = False,
    rng=None,
    force_reference: bool = False,
    remat: bool = False,
    remat_policy: str = "full",
    return_heads: bool = False,
):
    """images (B, H, W, C) -> logits (B, num_classes) fp32.

    `return_heads=True` (distilled backbones only) returns the CLS and DIST
    head logits separately instead of their average — the training surface
    for DeiT distillation, where the DIST head learns from the teacher and
    the CLS head from the labels.
    """
    tokens = apply_backbone(
        params["backbone"], images, backbone_cfg,
        train=train, rng=rng, force_reference=force_reference, remat=remat,
        remat_policy=remat_policy,
    )
    head_cfg = ClassifierConfig(
        num_classes=num_classes, distilled=backbone_cfg.distilled
    )
    if return_heads:
        return apply_classifier(
            params["classifier"], tokens, head_cfg, return_heads=True
        )
    return apply_classifier(params["classifier"], tokens, head_cfg)
