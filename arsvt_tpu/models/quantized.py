"""Int8 W8A8 quantized ViT/DeiT inference (serving path).

A beyond-parity serving feature (the reference has no quantized path):
the five matmul weight families of the backbone — patch embed, fused QKV,
attention out-projection, MLP fc1/fc2 — are quantized offline to
per-output-channel int8 (`ops/quant.py`), and the eval forward runs every
one of those matmuls as an s8 x s8 -> s32 MXU pass with per-token dynamic
activation scales. Everything that is small or precision-sensitive stays
in floating point: LayerNorms, biases, CLS/DIST/pos embeddings, the
softmax-attention core (the bf16 Pallas flash kernel via
`self_attention_from_qkv`), and the zero-cost classifier head.

Eval-only by design: there is no quantized backward, and the forward
mirrors `models/vit.py::apply_backbone` with train/remat stripped (a
separate lean function rather than more flags on the production training
path). Weight memory drops ~4x (int8 vs fp32) which also quarters the
HBM weight traffic per step — the win for small-batch serving, where
weight reads dominate.
"""

from __future__ import annotations

import jax.numpy as jnp

from arsvt_tpu.models.heads import ClassifierConfig, apply_classifier
from arsvt_tpu.models.vit import BackboneConfig
from arsvt_tpu.ops.attention import self_attention_from_qkv
from arsvt_tpu.ops.layernorm import layer_norm
from arsvt_tpu.ops.mlp import gelu_tanh
from arsvt_tpu.ops.patch_embed import extract_patches
from arsvt_tpu.ops.quant import quant_dense, quantize_weight


def quantize_backbone(bb, cfg: BackboneConfig):
    """Backbone params subtree -> quantized-inference subtree.

    Matmul kernels become `{"q": int8, "scale": fp32-per-out-channel}`;
    every other leaf is carried unchanged.
    """
    blocks = bb["blocks"]

    def qk(leaf):  # (in, out) or (depth, in, out): contraction is axis -2
        return quantize_weight(leaf, axis=-2)

    qbackbone = {
        "patch_embed": {
            "kernel": qk(bb["patch_embed"]["kernel"]),
            "bias": bb["patch_embed"]["bias"],
        },
        "cls_token": bb["cls_token"],
        "pos_embed": bb["pos_embed"],
        "blocks": {
            "ln1": blocks["ln1"],
            "attn": {
                "qkv": {
                    "kernel": qk(blocks["attn"]["qkv"]["kernel"]),
                    "bias": blocks["attn"]["qkv"]["bias"],
                },
                "proj": {
                    "kernel": qk(blocks["attn"]["proj"]["kernel"]),
                    "bias": blocks["attn"]["proj"]["bias"],
                },
            },
            "ln2": blocks["ln2"],
            "mlp": {
                "fc1": {
                    "kernel": qk(blocks["mlp"]["fc1"]["kernel"]),
                    "bias": blocks["mlp"]["fc1"]["bias"],
                },
                "fc2": {
                    "kernel": qk(blocks["mlp"]["fc2"]["kernel"]),
                    "bias": blocks["mlp"]["fc2"]["bias"],
                },
            },
        },
        "ln_f": bb["ln_f"],
    }
    if cfg.distilled:
        qbackbone["dist_token"] = bb["dist_token"]
    return qbackbone


def quantize_image_classifier(params, cfg: BackboneConfig):
    """Classifier params pytree -> quantized-inference pytree.

    The backbone quantizes (`quantize_backbone`); the classifier head
    stays fp (a (D, num_classes) matmul is ~0 cost and logits are the one
    place quantization error has nowhere to wash out).
    """
    return {
        "backbone": quantize_backbone(params["backbone"], cfg),
        "classifier": params["classifier"],
    }


def quantize_detector(params, cfg):
    """Detector params pytree -> quantized-inference pytree.

    `cfg` is a models.detector.DetectorConfig. Only the backbone (the
    FLOPs- and weight-dominant part at S=197 vs Q<=100 queries) quantizes;
    the DETR decoder head and triplet projection stay fp — box regression
    is the most quantization-sensitive output and the head is a rounding
    error of the total compute.
    """
    return {
        "backbone": quantize_backbone(params["backbone"], cfg.backbone),
        "detr": params["detr"],
        "triplet_proj": params["triplet_proj"],
    }


def apply_backbone_int8(qparams, images, cfg: BackboneConfig,
                        *, compute_dtype=jnp.bfloat16):
    """Quantized eval forward: images (B, H, W, C) -> tokens (B, S, D).

    Mirrors `apply_backbone` (vit.py) with train/remat stripped and every
    projection matmul routed through `quant_dense`. The attention core
    (QK^T softmax AV) runs the normal bf16 dispatch — flash kernel on TPU.
    """
    import jax

    b = images.shape[0]
    x = images.astype(compute_dtype)
    patches = extract_patches(x, cfg.patch_size)
    x = quant_dense(
        patches, qparams["patch_embed"]["kernel"],
        qparams["patch_embed"]["bias"], out_dtype=compute_dtype,
    )  # (B, N, D)

    specials = [
        jnp.broadcast_to(
            qparams["cls_token"].astype(compute_dtype), (b, 1, cfg.embed_dim)
        )
    ]
    if cfg.distilled:
        specials.append(
            jnp.broadcast_to(
                qparams["dist_token"].astype(compute_dtype),
                (b, 1, cfg.embed_dim),
            )
        )
    x = jnp.concatenate(specials + [x], axis=1)
    x = x + qparams["pos_embed"].astype(compute_dtype)

    def block(x, bp):
        y = layer_norm(x, bp["ln1"]["scale"], bp["ln1"]["bias"],
                       eps=cfg.ln_eps)
        qkv = quant_dense(
            y, bp["attn"]["qkv"]["kernel"], bp["attn"]["qkv"]["bias"],
        )
        attn = self_attention_from_qkv(qkv, cfg.num_heads)
        x = x + quant_dense(
            attn, bp["attn"]["proj"]["kernel"], bp["attn"]["proj"]["bias"],
        )
        y = layer_norm(x, bp["ln2"]["scale"], bp["ln2"]["bias"],
                       eps=cfg.ln_eps)
        u = quant_dense(y, bp["mlp"]["fc1"]["kernel"], bp["mlp"]["fc1"]["bias"])
        h = gelu_tanh(u)
        return x + quant_dense(
            h, bp["mlp"]["fc2"]["kernel"], bp["mlp"]["fc2"]["bias"],
        ), None

    x, _ = jax.lax.scan(block, x, qparams["blocks"])
    return layer_norm(x, qparams["ln_f"]["scale"],
                      qparams["ln_f"]["bias"], eps=cfg.ln_eps)


def apply_image_classifier_int8(qparams, images, cfg: BackboneConfig,
                                num_classes: int,
                                *, compute_dtype=jnp.bfloat16):
    """images (B, H, W, C) -> logits (B, num_classes) fp32, int8 backbone."""
    tokens = apply_backbone_int8(
        qparams["backbone"], images, cfg, compute_dtype=compute_dtype
    )
    head_cfg = ClassifierConfig(
        num_classes=num_classes, distilled=cfg.distilled
    )
    return apply_classifier(qparams["classifier"], tokens, head_cfg)


def apply_detector_int8(qparams, images, cfg,
                        *, compute_dtype=jnp.bfloat16):
    """Quantized detector eval: int8 backbone + fp DETR head.

    `cfg` is a models.detector.DetectorConfig; returns the same outputs
    dict as `apply_detector(train=False)` — {'class_logits', 'boxes_cxcywh'}.
    """
    from arsvt_tpu.models.heads import apply_detr_head

    tokens = apply_backbone_int8(
        qparams["backbone"], images, cfg.backbone,
        compute_dtype=compute_dtype,
    )
    memory = tokens[:, cfg.backbone.num_special_tokens:]
    return apply_detr_head(
        qparams["detr"], memory, cfg.head, cfg.backbone.embed_dim,
        train=False,
    )
