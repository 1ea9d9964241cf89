"""Heads: linear classifier and DETR-style detection decoder.

Classifier head — the north-star surface (BASELINE.json: 6-class
glass/paper/cardboard/plastic/metal/trash taxonomy, top-1 + confusion
matrix): pooled special token(s) → linear logits. For DeiT backbones the
CLS and DIST tokens get separate heads whose logits are averaged (standard
DeiT inference).

DETR head — re-design of `ObjectDetectionHead` (/root/reference/train.py:
691-731): learned object queries cross-attend to patch tokens through a
stack of decoder blocks, then linear class logits (num_classes+1 with
background last) and sigmoid box regression. Differences from the
reference, on purpose:
  * pre-LN decoder blocks (torch's `nn.TransformerDecoderLayer` default is
    post-LN) — trains stably without warmup;
  * boxes are produced as normalized cxcywh and converted where needed —
    the reference's head *comments* cxcywh but its losses treat the raw
    sigmoid output as x1y1x2y2 (train.py:712 vs 994-1024), which permits
    degenerate x2<x1 boxes and forced its defensive asserts. Sigmoid-cxcywh
    is degeneracy-free by construction.
  * decoder blocks are stacked + `lax.scan`, attention via the dispatching
    flash kernel.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from arsvt_tpu.ops.attention import (
    multi_head_attention,
    self_attention_from_qkv,
)
from arsvt_tpu.ops.layernorm import layer_norm
from arsvt_tpu.ops.mlp import gelu_mlp
from arsvt_tpu.models.vit import _linear_init, _trunc_normal, dropout


# ---------------------------------------------------------------- classifier


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    num_classes: int = 6
    distilled: bool = False


def init_classifier(key, cfg: ClassifierConfig, embed_dim: int):
    # `key` is unused by design: zero-init classifier heads (standard
    # fine-tune practice); kept for init-API symmetry
    del key
    params = {
        "head": {
            "kernel": jnp.zeros((embed_dim, cfg.num_classes)),
            "bias": jnp.zeros((cfg.num_classes,)),
        }
    }
    if cfg.distilled:
        params["head_dist"] = {
            "kernel": jnp.zeros((embed_dim, cfg.num_classes)),
            "bias": jnp.zeros((cfg.num_classes,)),
        }
    return params


def apply_classifier(params, tokens, cfg: ClassifierConfig,
                     *, return_heads: bool = False):
    """tokens: (B, S, D) with CLS [, DIST] first -> logits (B, num_classes).

    Distilled backbones average the CLS and DIST head logits (standard DeiT
    inference); `return_heads=True` returns them separately instead — the
    distillation training surface.
    """
    cls = tokens[:, 0]
    logits = (
        jnp.dot(cls, params["head"]["kernel"].astype(cls.dtype),
                preferred_element_type=jnp.float32)
        + params["head"]["bias"]
    ).astype(jnp.float32)
    if cfg.distilled and "head_dist" not in params:
        raise ValueError(
            "distilled classifier config but params lack 'head_dist' — "
            "checkpoint/config mismatch (e.g. converted from a "
            "non-distilled source); silently evaluating CLS-only would "
            "change numbers without an error"
        )
    if cfg.distilled:
        dist = tokens[:, 1]
        logits_d = (
            jnp.dot(dist, params["head_dist"]["kernel"].astype(dist.dtype),
                    preferred_element_type=jnp.float32)
            + params["head_dist"]["bias"]
        ).astype(jnp.float32)
        if return_heads:
            return logits, logits_d
        return (logits + logits_d) / 2.0
    if return_heads:
        raise ValueError(
            "return_heads requires a distilled backbone (DIST token + head)"
        )
    return logits


# --------------------------------------------------------------- DETR head


@dataclasses.dataclass(frozen=True)
class DetrHeadConfig:
    num_classes: int = 6          # foreground classes; +1 background logit
    num_queries: int = 25         # reference Config.NUM_QUERIES=5 (train.py:1351)
    depth: int = 6                # nn.TransformerDecoder num_layers (train.py:708)
    num_heads: int = 8            # train.py:703
    ffn_dim: int = 2048           # train.py:704
    dropout: float = 0.0
    attn_dropout: float = 0.0     # on attention probs (see BackboneConfig)
    ln_eps: float = 1e-5          # torch nn.LayerNorm default (see BackboneConfig)


def init_detr_head(key, cfg: DetrHeadConfig, embed_dim: int):
    d, depth = embed_dim, cfg.depth
    keys = jax.random.split(key, 12)

    def stack_linear(k, fan_in, shape):
        ks = jax.random.split(k, depth)
        return jnp.stack([_linear_init(ks[i], fan_in, shape) for i in range(depth)])

    def ln(width=d):
        return {"scale": jnp.ones((depth, width)), "bias": jnp.zeros((depth, width))}

    return {
        "queries": _trunc_normal(keys[0], (cfg.num_queries, d)),
        "blocks": {
            "ln_self": ln(),
            "self_attn": {
                "qkv": {"kernel": stack_linear(keys[1], d, (d, 3 * d)),
                        "bias": jnp.zeros((depth, 3 * d))},
                "proj": {"kernel": stack_linear(keys[2], d, (d, d)),
                         "bias": jnp.zeros((depth, d))},
            },
            "ln_cross_q": ln(),
            "ln_cross_kv": ln(),
            "cross_attn": {
                "q": {"kernel": stack_linear(keys[3], d, (d, d)),
                      "bias": jnp.zeros((depth, d))},
                "kv": {"kernel": stack_linear(keys[4], d, (d, 2 * d)),
                       "bias": jnp.zeros((depth, 2 * d))},
                "proj": {"kernel": stack_linear(keys[5], d, (d, d)),
                         "bias": jnp.zeros((depth, d))},
            },
            "ln_mlp": ln(),
            "mlp": {
                "fc1": {"kernel": stack_linear(keys[6], d, (d, cfg.ffn_dim)),
                        "bias": jnp.zeros((depth, cfg.ffn_dim))},
                "fc2": {"kernel": stack_linear(keys[7], cfg.ffn_dim, (cfg.ffn_dim, d)),
                        "bias": jnp.zeros((depth, d))},
            },
        },
        "ln_f": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "class_head": {
            "kernel": _linear_init(keys[8], d, (d, cfg.num_classes + 1)),
            "bias": jnp.zeros((cfg.num_classes + 1,)),
        },
        "bbox_head": {
            "kernel": _linear_init(keys[9], d, (d, 4)),
            "bias": jnp.zeros((4,)),
        },
    }


def _mha_from_proj(x_q, x_kv, num_heads, head_dim, force_reference,
                   dropout_rate=0.0, dropout_rng=None):
    b, sq, d = x_q.shape
    sk = x_kv.shape[1]
    q = x_q.reshape(b, sq, num_heads, head_dim).transpose(0, 2, 1, 3)
    kv = x_kv.reshape(b, sk, 2, num_heads, head_dim).transpose(2, 0, 3, 1, 4)
    out = multi_head_attention(q, kv[0], kv[1], force_reference=force_reference,
                               dropout_rate=dropout_rate,
                               dropout_rng=dropout_rng)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, d)


def _decoder_block(x, memory, bp, cfg: DetrHeadConfig, head_dim, *, train, rng,
                   force_reference):
    b, q, d = x.shape
    k1 = k2 = k3 = kp1 = kp2 = None
    if train and rng is not None:
        k1, k2, k3, kp1, kp2 = jax.random.split(rng, 5)
    attn_rate = cfg.attn_dropout if train else 0.0

    # self-attention over queries
    y = layer_norm(x, bp["ln_self"]["scale"], bp["ln_self"]["bias"],
                   eps=cfg.ln_eps)
    qkv = (jnp.dot(y, bp["self_attn"]["qkv"]["kernel"].astype(y.dtype))
           + bp["self_attn"]["qkv"]["bias"].astype(x.dtype))
    # decoder self-attn is tiny (Q<=100 queries): the packed-reference path
    # is cheaper than a kernel launch
    sa = self_attention_from_qkv(qkv, cfg.num_heads, force_reference=True,
                                 dropout_rate=attn_rate, dropout_rng=kp1)
    sa = (jnp.dot(sa, bp["self_attn"]["proj"]["kernel"].astype(sa.dtype))
          + bp["self_attn"]["proj"]["bias"].astype(x.dtype))
    x = x + dropout(sa, cfg.dropout, k1, train=train)

    # cross-attention to patch tokens
    yq = layer_norm(x, bp["ln_cross_q"]["scale"],
                    bp["ln_cross_q"]["bias"], eps=cfg.ln_eps)
    ykv = layer_norm(memory, bp["ln_cross_kv"]["scale"],
                     bp["ln_cross_kv"]["bias"], eps=cfg.ln_eps)
    xq = (jnp.dot(yq, bp["cross_attn"]["q"]["kernel"].astype(yq.dtype))
          + bp["cross_attn"]["q"]["bias"].astype(x.dtype))
    xkv = (jnp.dot(ykv, bp["cross_attn"]["kv"]["kernel"].astype(ykv.dtype))
           + bp["cross_attn"]["kv"]["bias"].astype(x.dtype))
    ca = _mha_from_proj(xq, xkv, cfg.num_heads, head_dim, force_reference,
                        dropout_rate=attn_rate, dropout_rng=kp2)
    ca = (jnp.dot(ca, bp["cross_attn"]["proj"]["kernel"].astype(ca.dtype))
          + bp["cross_attn"]["proj"]["bias"].astype(x.dtype))
    x = x + dropout(ca, cfg.dropout, k2, train=train)

    # FFN
    y = layer_norm(x, bp["ln_mlp"]["scale"], bp["ln_mlp"]["bias"],
                   eps=cfg.ln_eps)
    y = gelu_mlp(y,
                 bp["mlp"]["fc1"]["kernel"].astype(y.dtype),
                 bp["mlp"]["fc1"]["bias"],
                 bp["mlp"]["fc2"]["kernel"].astype(y.dtype),
                 bp["mlp"]["fc2"]["bias"],
                 force_reference=force_reference)
    return x + dropout(y, cfg.dropout, k3, train=train)


def apply_detr_head(
    params,
    memory,
    cfg: DetrHeadConfig,
    embed_dim: int,
    *,
    train: bool = False,
    rng=None,
    force_reference: bool = False,
    return_aux: bool = False,
):
    """memory: patch tokens (B, N, D) -> {'class_logits': (B, Q, C+1),
    'boxes_cxcywh': (B, Q, 4) in [0,1]}.

    `return_aux=True` additionally returns per-intermediate-layer outputs
    ({'class_logits': (L-1, B, Q, C+1), 'boxes_cxcywh': (L-1, B, Q, 4)})
    through the SHARED heads — DETR's deep supervision, which the reference
    lacks and which is what makes decoder training converge.
    """
    if embed_dim % cfg.num_heads:
        raise ValueError("detr num_heads must divide embed_dim")
    head_dim = embed_dim // cfg.num_heads
    b = memory.shape[0]
    x = jnp.broadcast_to(
        params["queries"][None], (b, cfg.num_queries, embed_dim)
    ).astype(memory.dtype)

    def body(carry, xs):
        x, rng = carry
        bp, idx = xs
        layer_rng = None
        if train and rng is not None:
            layer_rng = jax.random.fold_in(rng, idx)
        x = _decoder_block(x, memory, bp, cfg, head_dim, train=train,
                           rng=layer_rng, force_reference=force_reference)
        return (x, rng), x

    (x, _), layer_states = jax.lax.scan(
        body, (x, rng), (params["blocks"], jnp.arange(cfg.depth))
    )

    def heads(h):
        h = layer_norm(h, params["ln_f"]["scale"],
                       params["ln_f"]["bias"], eps=cfg.ln_eps)
        class_logits = (
            jnp.dot(h, params["class_head"]["kernel"].astype(h.dtype),
                    preferred_element_type=jnp.float32)
            + params["class_head"]["bias"]
        ).astype(jnp.float32)
        boxes = jax.nn.sigmoid(
            (jnp.dot(h, params["bbox_head"]["kernel"].astype(h.dtype),
                     preferred_element_type=jnp.float32)
             + params["bbox_head"]["bias"]).astype(jnp.float32)
        )
        return {"class_logits": class_logits, "boxes_cxcywh": boxes}

    outputs = heads(x)
    if not return_aux:
        return outputs
    if cfg.depth < 2:
        return outputs, None  # no intermediate layers to supervise
    aux = jax.vmap(heads)(layer_states[:-1])  # (L-1, B, Q, ...)
    return outputs, aux
