"""Full object detector = backbone + DETR head (+ triplet projection).

Re-design of `DeiTObjectDetector` / `ViTObjectDetector`
(/root/reference/train.py:798-850, evaluation.py:203-238): backbone tokens →
strip special tokens → DETR decoder head; in training mode the CLS feature
additionally goes through an L2-normalized triplet projection
(train.py:827,836-838) feeding the metric-learning loss.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from arsvt_tpu.models.vit import BackboneConfig, init_backbone, apply_backbone
from arsvt_tpu.models.heads import DetrHeadConfig, init_detr_head, apply_detr_head
from arsvt_tpu.models.vit import _linear_init


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    backbone: BackboneConfig = BackboneConfig()
    head: DetrHeadConfig = DetrHeadConfig()
    triplet_dim: int = 256  # train.py:827 Linear(D, 256)


def init_detector(key, cfg: DetectorConfig):
    kb, kh, kt = jax.random.split(key, 3)
    d = cfg.backbone.embed_dim
    return {
        "backbone": init_backbone(kb, cfg.backbone),
        "detr": init_detr_head(kh, cfg.head, d),
        "triplet_proj": {
            "kernel": _linear_init(kt, d, (d, cfg.triplet_dim)),
            "bias": jnp.zeros((cfg.triplet_dim,)),
        },
    }


def apply_detector(
    params,
    images,
    cfg: DetectorConfig,
    *,
    train: bool = False,
    rng=None,
    return_features: bool = False,
    force_reference: bool = False,
    remat: bool = False,
    remat_policy: str = "full",
    return_aux: bool = False,
):
    """images (B,H,W,C) -> outputs dict; optionally + L2-normed triplet feats.

    outputs: {'class_logits': (B,Q,C+1) fp32, 'boxes_cxcywh': (B,Q,4) fp32}.
    """
    rng_b = rng_h = None
    if rng is not None:
        rng_b, rng_h = jax.random.split(rng)
    tokens = apply_backbone(
        params["backbone"], images, cfg.backbone,
        train=train, rng=rng_b, force_reference=force_reference, remat=remat,
        remat_policy=remat_policy,
    )
    n_special = cfg.backbone.num_special_tokens
    memory = tokens[:, n_special:]  # strip CLS [+DIST] (train.py:842)
    head_out = apply_detr_head(
        params["detr"], memory, cfg.head, cfg.backbone.embed_dim,
        train=train, rng=rng_h, force_reference=force_reference,
        return_aux=return_aux,
    )
    if return_aux:
        outputs, aux = head_out  # aux is None for depth-1 heads
        if aux is not None:
            outputs = dict(outputs, aux=aux)
    else:
        outputs = head_out
    if not return_features:
        return outputs
    cls_feat = tokens[:, 0].astype(jnp.float32)
    feat = (
        jnp.dot(cls_feat, params["triplet_proj"]["kernel"],
                preferred_element_type=jnp.float32)
        + params["triplet_proj"]["bias"]
    )
    feat = feat / jnp.maximum(
        jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12
    )
    return outputs, feat
