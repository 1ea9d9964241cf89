"""ViT / DeiT backbone as a pure-functional pytree model.

One definition serves both of the reference's backbones (it defines
`VisionTransformer` at /root/reference/evaluation.py:120-157 and the actually
trained `DataEfficientImageTransformer` at /root/reference/train.py:637-688,
copy-pasted between files with diverging configs — the duplication disease
SURVEY.md §7 cures): `distilled=False` gives ViT (CLS token), `distilled=True`
gives DeiT (CLS + DIST tokens).

TPU-first design decisions vs. the reference:
  * params are a plain pytree; the 12 encoder blocks are *stacked* along a
    leading depth axis and applied with `lax.scan` — one trace/compile of the
    block instead of 12, and mesh partition specs apply uniformly.
  * NHWC images; patch embedding is a single MXU matmul (`ops.patch_embed`).
  * pre-LN blocks exactly like the reference (train.py:584-592):
    ``x += attn(LN1(x)); x += mlp(LN2(x))`` with a final LN.
  * attention is the dispatching `multi_head_attention` (Pallas flash on
    TPU). Dropout applies to the pos-embed, attention output, MLP output
    AND — via `attn_dropout` — to the attention probabilities, in-kernel
    (stateless TPU-PRNG mask replayed in backward). BackboneConfig rates
    default to 0.0; the reference-faithful presets (`deit_ref_400_16_224`,
    `deit_detector_ref`) carry its 0.1 for both (train.py:1352).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from arsvt_tpu.ops.attention import self_attention_from_qkv
from arsvt_tpu.ops.dispatch import use_fused_encoder_attention
from arsvt_tpu.ops.layernorm import layer_norm
from arsvt_tpu.ops.mlp import gelu_mlp
from arsvt_tpu.ops.patch_embed import patch_embed


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    image_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_dim: int = 768
    dropout: float = 0.0
    # dropout on the attention softmax probabilities (train.py:528,545).
    # Runs IN-KERNEL on TPU: the flash kernels sample a stateless mask from
    # the hardware PRNG and replay it in backward, so reference-config
    # regularisation (rate 0.1, train.py:1352) trains on the kernel path.
    attn_dropout: float = 0.0
    distilled: bool = False  # DeiT: CLS + DIST tokens (train.py:646-648)
    # LayerNorm epsilon. 1e-5 = torch nn.LayerNorm's default, i.e. what
    # every reference LN runs with (train.py:576-593). Converted
    # checkpoints must carry their source's value (timm ViT: 1e-6,
    # HF ViT: 1e-12) or every block's rstd drifts systematically.
    ln_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_special_tokens(self) -> int:
        return 2 if self.distilled else 1

    @property
    def seq_len(self) -> int:
        return self.num_patches + self.num_special_tokens

    @property
    def head_dim(self) -> int:
        if self.embed_dim % self.num_heads:
            raise ValueError("num_heads must divide embed_dim")
        return self.embed_dim // self.num_heads


def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    # truncated at ±2σ, matching the reference's trunc_normal_(std=.02)
    # init for tokens/pos-embeds (train.py:661-664).
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def _linear_init(key, fan_in, shape, dtype=jnp.float32):
    # LeCun-normal style for kernels (jnp default for ViT practice).
    std = (1.0 / fan_in) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def init_backbone(key, cfg: BackboneConfig) -> dict[str, Any]:
    d, depth = cfg.embed_dim, cfg.depth
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.in_channels
    keys = jax.random.split(key, 10)

    def stack_linear(k, fan_in, shape):
        ks = jax.random.split(k, depth)
        return jnp.stack([_linear_init(ks[i], fan_in, shape) for i in range(depth)])

    params = {
        "patch_embed": {
            "kernel": _linear_init(keys[0], patch_dim, (patch_dim, d)),
            "bias": jnp.zeros((d,)),
        },
        "cls_token": _trunc_normal(keys[1], (1, 1, d)),
        "pos_embed": _trunc_normal(keys[2], (1, cfg.seq_len, d)),
        "blocks": {
            "ln1": {"scale": jnp.ones((depth, d)), "bias": jnp.zeros((depth, d))},
            "attn": {
                "qkv": {
                    "kernel": stack_linear(keys[3], d, (d, 3 * d)),
                    "bias": jnp.zeros((depth, 3 * d)),
                },
                "proj": {
                    "kernel": stack_linear(keys[4], d, (d, d)),
                    "bias": jnp.zeros((depth, d)),
                },
            },
            "ln2": {"scale": jnp.ones((depth, d)), "bias": jnp.zeros((depth, d))},
            "mlp": {
                "fc1": {
                    "kernel": stack_linear(keys[5], d, (d, cfg.mlp_dim)),
                    "bias": jnp.zeros((depth, cfg.mlp_dim)),
                },
                "fc2": {
                    "kernel": stack_linear(keys[6], cfg.mlp_dim, (cfg.mlp_dim, d)),
                    "bias": jnp.zeros((depth, d)),
                },
            },
        },
        "ln_f": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }
    if cfg.distilled:
        params["dist_token"] = _trunc_normal(keys[7], (1, 1, d))
    return params


def dropout(x, rate: float, key, *, train: bool):
    if not train or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


def _encoder_block(x, bp, cfg: BackboneConfig, *, train, rng, force_reference,
                   remat_mlp=False, remat_mlp_tail=False):
    """One pre-LN block. bp: per-layer (unstacked) block params.

    remat_mlp: wrap only the MLP in jax.checkpoint(nothing_saveable) —
    selective recompute of the two (B,S,M) internals (u, gelu(u)) that
    dominate no-remat's residual memory (~7.4 GB at ViT-B bs256). A
    checkpoint *policy* cannot drop them: gelu_tanh's custom-VJP residual
    (u) is saved unconditionally, outside policy control — function-level
    nesting is the only lever that works.

    remat_mlp_tail: save the fc1 output u but recompute gelu(u) in
    backward (elementwise only — no matmul recompute); see ops/mlp.py.
    """
    b, s, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    k1 = k2 = kp = None
    if train and rng is not None:
        k1, k2, kp = jax.random.split(rng, 3)

    y = layer_norm(x, bp["ln1"]["scale"], bp["ln1"]["bias"],
                   eps=cfg.ln_eps)
    attn_dropping = train and cfg.attn_dropout > 0.0 and kp is not None
    if not force_reference and use_fused_encoder_attention(h, hd):
        # one custom VJP over qkv-proj → attention → out-proj: the Pallas
        # kernels read/write per-head column blocks of the (B,S,3D)/(B,S,D)
        # layouts directly — no (B,H,S,d) transposes in either direction.
        # attn_dropout rides the kernel too (stateless in-kernel mask).
        from arsvt_tpu.ops.dispatch import use_attn_save_probs
        from arsvt_tpu.ops.pallas.flash_attention import (
            fused_encoder_attention,
            fused_encoder_attention_savep,
        )

        if train and use_attn_save_probs():
            # save-probs backward: only pays when training without remat
            # (eval has no backward; remat replays the fwd anyway)
            fused_encoder_attention = fused_encoder_attention_savep
        attn = fused_encoder_attention(
            y,
            bp["attn"]["qkv"]["kernel"].astype(y.dtype),
            bp["attn"]["qkv"]["bias"].astype(y.dtype),
            bp["attn"]["proj"]["kernel"].astype(y.dtype),
            bp["attn"]["proj"]["bias"].astype(y.dtype),
            h,
            dropout_rate=cfg.attn_dropout if attn_dropping else 0.0,
            dropout_rng=kp,
        )
    else:
        # linears emit the storage dtype directly (MXU still accumulates
        # fp32 internally); keeps "dots"-policy residuals bf16 not fp32
        qkv = (
            jnp.dot(y, bp["attn"]["qkv"]["kernel"].astype(y.dtype))
            + bp["attn"]["qkv"]["bias"].astype(x.dtype)
        )
        attn = self_attention_from_qkv(
            qkv, h, force_reference=force_reference,
            dropout_rate=cfg.attn_dropout if train else 0.0, dropout_rng=kp,
        )
        attn = (
            jnp.dot(attn, bp["attn"]["proj"]["kernel"].astype(attn.dtype))
            + bp["attn"]["proj"]["bias"].astype(x.dtype)
        )
    x = x + dropout(attn, cfg.dropout, k1, train=train)

    y = layer_norm(x, bp["ln2"]["scale"], bp["ln2"]["bias"],
                   eps=cfg.ln_eps)
    mlp_fn = lambda *a: gelu_mlp(  # noqa: E731
        *a, force_reference=force_reference, remat_tail=remat_mlp_tail
    )
    if remat_mlp:
        mlp_fn = jax.checkpoint(
            mlp_fn, policy=jax.checkpoint_policies.nothing_saveable
        )
    y = mlp_fn(
        y,
        bp["mlp"]["fc1"]["kernel"].astype(y.dtype),
        bp["mlp"]["fc1"]["bias"],
        bp["mlp"]["fc2"]["kernel"].astype(y.dtype),
        bp["mlp"]["fc2"]["bias"],
    )
    return x + dropout(y, cfg.dropout, k2, train=train)


def apply_backbone(
    params,
    images,
    cfg: BackboneConfig,
    *,
    train: bool = False,
    rng=None,
    force_reference: bool = False,
    remat: bool = False,
    remat_policy: str = "full",
):
    """images: (B, H, W, C) -> all tokens (B, S, D) after the final LN.

    Like the reference backbones, returns *all* tokens (special + patches);
    heads decide what to strip (train.py:842, evaluation.py:234).

    remat_policy (active when remat=True):
      "full"  save only block inputs; recompute everything in backward
              (minimum memory, +1 fwd of FLOPs)
      "dots"  save matmul outputs (bf16), recompute only elementwise ops
              — ~25% fewer backward FLOPs than "full" for ~8 GB of
              residuals at ViT-B bs256
      "names" save exactly the flash-attention output/logsumexp and the
              MLP pre-activation (checkpoint_name tags): the backward
              replay DCEs the attention-kernel rerun and the fc2 input
              recompute for ~5 GB of bf16 residuals
      "all_but_mlp"
              save everything EXCEPT the (B,S,M) MLP internals —
              near-no-remat (~3.1x fwd FLOPs) that fits bs256 on one v5e
      "mlp_tail"
              like "all_but_mlp" but the fc1 output u is saved too;
              backward recomputes only the elementwise gelu(u) — no
              matmul recompute at all (+310 MB/layer of bf16 residuals)
    """
    b = images.shape[0]
    x = patch_embed(
        images,
        params["patch_embed"]["kernel"],
        params["patch_embed"]["bias"],
        patch_size=cfg.patch_size,
    )  # (B, N, D)

    specials = [jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim))]
    if cfg.distilled:
        specials.append(
            jnp.broadcast_to(params["dist_token"], (b, 1, cfg.embed_dim))
        )
    x = jnp.concatenate(specials + [x], axis=1).astype(x.dtype)
    x = x + params["pos_embed"].astype(x.dtype)

    pos_key = None
    if train and rng is not None:
        rng, pos_key = jax.random.split(rng)
    x = dropout(x, cfg.dropout, pos_key, train=train)

    block_params = params["blocks"]
    _REMAT_POLICIES = ("full", "dots", "names", "all_but_mlp", "mlp_tail")
    if remat and remat_policy not in _REMAT_POLICIES:
        raise ValueError(
            f"unknown remat_policy {remat_policy!r}; one of {_REMAT_POLICIES}"
        )
    remat_mlp = remat and remat_policy == "all_but_mlp"
    remat_mlp_tail = remat and remat_policy == "mlp_tail"

    def block_apply(x, bp, layer_rng):
        return _encoder_block(
            x, bp, cfg, train=train, rng=layer_rng,
            force_reference=force_reference, remat_mlp=remat_mlp,
            remat_mlp_tail=remat_mlp_tail,
        )

    if remat and not (remat_mlp or remat_mlp_tail):
        if remat_policy == "dots":
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        elif remat_policy == "names":
            policy = jax.checkpoint_policies.save_only_these_names(
                "flash_out", "flash_lse", "mlp_u"
            )
        else:
            policy = jax.checkpoint_policies.nothing_saveable
        block_apply = jax.checkpoint(block_apply, policy=policy)

    def body(carry, xs):
        x, rng = carry
        bp, idx = xs
        layer_rng = None
        if train and rng is not None:
            layer_rng = jax.random.fold_in(rng, idx)
        x = block_apply(x, bp, layer_rng)
        return (x, rng), None

    idxs = jnp.arange(cfg.depth)
    (x, _), _ = jax.lax.scan(body, (x, rng), (block_params, idxs))
    return layer_norm(x, params["ln_f"]["scale"],
                      params["ln_f"]["bias"], eps=cfg.ln_eps)
