"""Pretrained-weight conversion: HuggingFace / timm ViT -> arsvt pytree.

BASELINE.json config #2 is "ViT-Base/16 fine-tune from pretrained weights";
with zero network egress the framework ships the *converter*, not the
weights: point it at a local `pytorch_model.bin` / safetensors state dict
(HF `ViTModel`/`ViTForImageClassification` naming) or a timm ViT state
dict, get back an `init_backbone`-shaped parameter tree (stacked blocks).

Layout notes:
  * torch Linear weights are (out, in) -> transposed to our (in, out);
  * HF keeps separate q/k/v projections -> concatenated into our fused
    (D, 3D) kernel; timm already stores fused qkv;
  * the patch conv (D, C, p, p) -> our flattened (p*p*C, D) matmul kernel
    with (kh, kw, c) ordering matching `ops.patch_embed.extract_patches`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from arsvt_tpu.models.vit import BackboneConfig


def _t(w):  # torch (out, in) -> (in, out)
    return np.asarray(w).T


def _conv_to_matmul(w):
    # (D, C, p, p) -> (p, p, C, D) -> (p*p*C, D)
    w = np.asarray(w)
    d = w.shape[0]
    return w.transpose(2, 3, 1, 0).reshape(-1, d)


def detect_source(state: dict) -> str:
    keys = set(state)
    if any(".attention.attention.query.weight" in k for k in keys):
        return "hf"
    if any(k.endswith("attn.qkv.weight") for k in keys):
        return "timm"
    raise ValueError("unrecognised ViT state-dict naming")


def _strip_prefix(state: dict) -> dict:
    # HF checkpoints may carry a top-level "vit." (ViTForImageClassification)
    if any(k.startswith("vit.") for k in state):
        return {k[len("vit."):]: v for k, v in state.items()
                if k.startswith("vit.")}
    return state


def from_pretrained_state(state: dict, cfg: BackboneConfig) -> dict:
    """Convert a torch state dict (numpy-convertible values) to our params.

    NOTE: LayerNorm eps is a config, not a weight — converted checkpoints
    should run with the SOURCE model's value (`cfg.ln_eps`: timm ViT 1e-6,
    HF ViT layer_norm_eps, typically 1e-12; our default is torch's 1e-5).
    """
    state = {k: np.asarray(v) for k, v in state.items()}
    source = detect_source(_strip_prefix(state))
    if source == "hf":
        return _from_hf(_strip_prefix(state), cfg)
    return _from_timm(state, cfg)


def _stack(layers: list[dict]) -> dict:
    out: dict = {}
    for key in layers[0]:
        if isinstance(layers[0][key], dict):
            out[key] = _stack([layer[key] for layer in layers])
        else:
            out[key] = jnp.asarray(np.stack([layer[key] for layer in layers]))
    return out


def _from_hf(s: dict, cfg: BackboneConfig) -> dict:
    d = cfg.embed_dim
    layers = []
    for i in range(cfg.depth):
        p = f"encoder.layer.{i}."
        qkv_w = np.concatenate(
            [_t(s[p + f"attention.attention.{n}.weight"])
             for n in ("query", "key", "value")], axis=1,
        )
        qkv_b = np.concatenate(
            [s[p + f"attention.attention.{n}.bias"]
             for n in ("query", "key", "value")]
        )
        layers.append({
            "ln1": {"scale": s[p + "layernorm_before.weight"],
                    "bias": s[p + "layernorm_before.bias"]},
            "attn": {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "proj": {"kernel": _t(s[p + "attention.output.dense.weight"]),
                         "bias": s[p + "attention.output.dense.bias"]},
            },
            "ln2": {"scale": s[p + "layernorm_after.weight"],
                    "bias": s[p + "layernorm_after.bias"]},
            "mlp": {
                "fc1": {"kernel": _t(s[p + "intermediate.dense.weight"]),
                        "bias": s[p + "intermediate.dense.bias"]},
                "fc2": {"kernel": _t(s[p + "output.dense.weight"]),
                        "bias": s[p + "output.dense.bias"]},
            },
        })
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(_conv_to_matmul(
                s["embeddings.patch_embeddings.projection.weight"]
            )),
            "bias": jnp.asarray(
                s["embeddings.patch_embeddings.projection.bias"]
            ),
        },
        "cls_token": jnp.asarray(s["embeddings.cls_token"]),
        "pos_embed": jnp.asarray(s["embeddings.position_embeddings"]),
        "blocks": _stack(layers),
        "ln_f": {"scale": jnp.asarray(s["layernorm.weight"]),
                 "bias": jnp.asarray(s["layernorm.bias"])},
    }
    _check_shapes(params, cfg)
    return params


def _from_timm(s: dict, cfg: BackboneConfig) -> dict:
    layers = []
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        layers.append({
            "ln1": {"scale": s[p + "norm1.weight"],
                    "bias": s[p + "norm1.bias"]},
            "attn": {
                "qkv": {"kernel": _t(s[p + "attn.qkv.weight"]),
                        "bias": s[p + "attn.qkv.bias"]},
                "proj": {"kernel": _t(s[p + "attn.proj.weight"]),
                         "bias": s[p + "attn.proj.bias"]},
            },
            "ln2": {"scale": s[p + "norm2.weight"],
                    "bias": s[p + "norm2.bias"]},
            "mlp": {
                "fc1": {"kernel": _t(s[p + "mlp.fc1.weight"]),
                        "bias": s[p + "mlp.fc1.bias"]},
                "fc2": {"kernel": _t(s[p + "mlp.fc2.weight"]),
                        "bias": s[p + "mlp.fc2.bias"]},
            },
        })
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(_conv_to_matmul(s["patch_embed.proj.weight"])),
            "bias": jnp.asarray(s["patch_embed.proj.bias"]),
        },
        "cls_token": jnp.asarray(s["cls_token"]),
        "pos_embed": jnp.asarray(s["pos_embed"]),
        "blocks": _stack(layers),
        "ln_f": {"scale": jnp.asarray(s["norm.weight"]),
                 "bias": jnp.asarray(s["norm.bias"])},
    }
    if "dist_token" in s:
        params["dist_token"] = jnp.asarray(s["dist_token"])
    _check_shapes(params, cfg)
    return params


def _check_shapes(params: dict, cfg: BackboneConfig):
    d = cfg.embed_dim
    k = params["blocks"]["attn"]["qkv"]["kernel"]
    if k.shape != (cfg.depth, d, 3 * d):
        raise ValueError(
            f"converted qkv kernel {k.shape} does not match config "
            f"({cfg.depth}, {d}, {3 * d}) — wrong preset for this checkpoint?"
        )
    pe = params["pos_embed"]
    if pe.shape[1] != cfg.seq_len:
        raise ValueError(
            f"pos_embed length {pe.shape[1]} != config seq_len "
            f"{cfg.seq_len} (image_size/patch_size mismatch)"
        )


def load_torch_state(path: str) -> dict:
    """Load a .bin/.pt (torch.load) or .safetensors file to numpy dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    # The reference wraps weights as {'model_state_dict': ..., 'epoch': int,
    # 'optimizer_state_dict': ..., ...} (train.py:1647-1654); HF/timm use
    # 'state_dict' or a bare dict. Unwrap, then keep only tensor values
    # (skip epoch/val_loss/config metadata).
    for key in ("model_state_dict", "state_dict"):
        if key in state and isinstance(state[key], dict):
            state = state[key]
            break
    return {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}


# ------------------------------------------------- reference .pth detectors


def from_reference_detector_state(state: dict, det_cfg) -> dict:
    """Convert a checkpoint saved by the REFERENCE repo's training script
    (/root/reference/train.py:1647-1654 `model_state_dict` of
    `DeiTObjectDetector`) into this framework's detector pytree.

    The backbone converts exactly — the reference's
    `DataEfficientImageTransformer` (train.py:637-688) and our DeiT backbone
    share structure (pre-LN blocks, CLS+DIST tokens, fused qkv). The DETR
    decoder converts best-effort: the reference uses torch's post-LN
    `nn.TransformerDecoderLayer` (train.py:701-708) while ours is pre-LN
    with a separate cross-attention KV norm, and its box head was trained
    on raw-sigmoid corner coordinates while ours is cxcywh — expect to
    fine-tune after conversion; the backbone transfer is the value.
    """
    # unwrap the reference's checkpoint envelope BEFORE np.asarray —
    # asarray on a nested dict produces a useless 0-d object array
    for key in ("model_state_dict", "state_dict"):
        if key in state and isinstance(state[key], dict):
            state = state[key]
            break
    state = {k: np.asarray(v) for k, v in state.items()
             if hasattr(v, "shape") or hasattr(v, "__array__")}
    bb_cfg = det_cfg.backbone
    s = {k[len("backbone."):]: v for k, v in state.items()
         if k.startswith("backbone.")}

    layers = []
    for i in range(bb_cfg.depth):
        p = f"transformer_blocks.{i}."
        layers.append({
            "ln1": {"scale": s[p + "layer_norm1.weight"],
                    "bias": s[p + "layer_norm1.bias"]},
            "attn": {
                "qkv": {"kernel": _t(s[p + "attention.qkv.weight"]),
                        "bias": s[p + "attention.qkv.bias"]},
                "proj": {"kernel": _t(s[p + "attention.projection.weight"]),
                         "bias": s[p + "attention.projection.bias"]},
            },
            "ln2": {"scale": s[p + "layer_norm2.weight"],
                    "bias": s[p + "layer_norm2.bias"]},
            "mlp": {
                "fc1": {"kernel": _t(s[p + "mlp.linear1.weight"]),
                        "bias": s[p + "mlp.linear1.bias"]},
                "fc2": {"kernel": _t(s[p + "mlp.linear2.weight"]),
                        "bias": s[p + "mlp.linear2.bias"]},
            },
        })
    backbone = {
        "patch_embed": {
            "kernel": jnp.asarray(
                _conv_to_matmul(s["patch_embedding.projection.weight"])
            ),
            "bias": jnp.asarray(s["patch_embedding.projection.bias"]),
        },
        "cls_token": jnp.asarray(s["cls_token"]),
        "dist_token": jnp.asarray(s["dist_token"]),
        "pos_embed": jnp.asarray(s["position_embedding"]),
        "blocks": _stack(layers),
        "ln_f": {"scale": jnp.asarray(s["layer_norm.weight"]),
                 "bias": jnp.asarray(s["layer_norm.bias"])},
    }
    _check_shapes(backbone, bb_cfg)

    # decoder: approximate structural transfer (see docstring)
    d = bb_cfg.embed_dim
    h = det_cfg.head
    dec_layers = []
    for i in range(h.depth):
        p = f"detection_head.decoder.layers.{i}."
        in_w = state[p + "self_attn.in_proj_weight"]   # (3D, D)
        in_b = state[p + "self_attn.in_proj_bias"]
        x_w = state[p + "multihead_attn.in_proj_weight"]
        x_b = state[p + "multihead_attn.in_proj_bias"]
        dec_layers.append({
            "ln_self": {"scale": state[p + "norm1.weight"],
                        "bias": state[p + "norm1.bias"]},
            "self_attn": {
                "qkv": {"kernel": _t(in_w), "bias": in_b},
                "proj": {"kernel": _t(state[p + "self_attn.out_proj.weight"]),
                         "bias": state[p + "self_attn.out_proj.bias"]},
            },
            "ln_cross_q": {"scale": state[p + "norm2.weight"],
                           "bias": state[p + "norm2.bias"]},
            # the reference has no KV norm; identity init
            "ln_cross_kv": {"scale": np.ones(d, np.float32),
                            "bias": np.zeros(d, np.float32)},
            "cross_attn": {
                "q": {"kernel": _t(x_w[:d]), "bias": x_b[:d]},
                "kv": {"kernel": _t(x_w[d:]), "bias": x_b[d:]},
                "proj": {
                    "kernel": _t(state[p + "multihead_attn.out_proj.weight"]),
                    "bias": state[p + "multihead_attn.out_proj.bias"],
                },
            },
            "ln_mlp": {"scale": state[p + "norm3.weight"],
                       "bias": state[p + "norm3.bias"]},
            "mlp": {
                "fc1": {"kernel": _t(state[p + "linear1.weight"]),
                        "bias": state[p + "linear1.bias"]},
                "fc2": {"kernel": _t(state[p + "linear2.weight"]),
                        "bias": state[p + "linear2.bias"]},
            },
        })
    detr = {
        "queries": jnp.asarray(state["detection_head.object_queries"]),
        "blocks": _stack(dec_layers),
        "ln_f": {"scale": jnp.ones((d,), jnp.float32),
                 "bias": jnp.zeros((d,), jnp.float32)},
        "class_head": {
            "kernel": jnp.asarray(_t(state["detection_head.class_head.weight"])),
            "bias": jnp.asarray(state["detection_head.class_head.bias"]),
        },
        "bbox_head": {
            "kernel": jnp.asarray(_t(state["detection_head.bbox_head.weight"])),
            "bias": jnp.asarray(state["detection_head.bbox_head.bias"]),
        },
    }
    out = {"backbone": backbone, "detr": detr}
    if "triplet_projection.weight" in state:
        out["triplet_proj"] = {
            "kernel": jnp.asarray(_t(state["triplet_projection.weight"])),
            "bias": jnp.asarray(state["triplet_projection.bias"]),
        }
    return out


# ------------------------------------------------------------------- CLI


def import_torch_checkpoint(torch_state_path: str, checkpoint_dir: str, *,
                            train_preset: str = "vit_base_finetune",
                            source: str = "auto",
                            overrides: dict | None = None) -> dict:
    """torch weights file → a ready orbax training checkpoint (step 0).

    The migration entry point: point it at an HF/timm ViT state dict (or a
    checkpoint saved by the reference's own train.py) and get a checkpoint
    directory every other surface consumes directly — `train.cli --resume`
    fine-tunes from it, `evaluation.cli` / `serving.server` /
    `serving.export` serve it. Weights land in the fp32 master slots; the
    optimizer state starts fresh (the reference's .pth optimizer state is
    Adam-on-torch-layout and does not transfer).

    `source="reference"` forces the reference DeiTObjectDetector layout
    (needed because its backbone.* keys are timm-like); "auto" handles
    HF/timm classifier backbones.
    """
    import jax

    from arsvt_tpu.train.config import (
        TRAIN_PRESETS,
        resolve_backbone,
        resolve_detector,
    )
    from arsvt_tpu.train.trainer import Trainer

    cfg = TRAIN_PRESETS[train_preset].with_overrides(
        checkpoint_dir=checkpoint_dir, **(overrides or {})
    )
    state_dict = load_torch_state(torch_state_path)

    is_reference = any(k.startswith("detection_head.") for k in state_dict)
    # LayerNorm eps is a config, not a weight: imported backbones must run
    # with their source's value or every block's rstd drifts (the torch
    # default 1e-5 is only right for reference checkpoints). The standard
    # values are baked per source; an explicit ln_eps override wins.
    if not cfg.ln_eps and not is_reference:
        detected = detect_source(_strip_prefix(
            {k: np.asarray(v) for k, v in state_dict.items()}
        )) if source == "auto" else source
        if detected == "hf":
            cfg = cfg.with_overrides(ln_eps=1e-12)   # HF ViT layer_norm_eps
        elif detected == "timm":
            cfg = cfg.with_overrides(ln_eps=1e-6)    # timm ViT default

    trainer = Trainer(cfg)
    state = trainer.init_state()
    params = state["params"]

    if source not in ("auto", "hf", "timm", "reference"):
        raise ValueError(f"unknown source {source!r}")
    if is_reference and source in ("hf", "timm"):
        raise ValueError(
            f"{torch_state_path} contains detection_head.* keys — it is a "
            f"checkpoint from the reference repo, not a {source} ViT; use "
            f"--source reference (or auto)"
        )
    if source == "reference" or (source == "auto" and is_reference):
        if cfg.task != "detect":
            raise ValueError(
                f"{torch_state_path} is a reference detector checkpoint; "
                f"use a detect train preset (got task={cfg.task!r})"
            )
        converted = from_reference_detector_state(
            state_dict, resolve_detector(cfg)
        )
        imported = sorted(converted)
    else:
        bb_cfg = resolve_backbone(cfg)
        arrays = {k: np.asarray(v) for k, v in state_dict.items()}
        try:
            if source == "hf":
                converted = {"backbone": _from_hf(_strip_prefix(arrays),
                                                  bb_cfg)}
            elif source == "timm":
                converted = {"backbone": _from_timm(arrays, bb_cfg)}
            else:
                converted = {"backbone": from_pretrained_state(
                    state_dict, bb_cfg)}
        except KeyError as e:
            raise ValueError(
                f"{torch_state_path} does not match the "
                f"{'forced ' if source != 'auto' else ''}{source} ViT "
                f"layout (missing key {e}); try --source auto"
            ) from e
        imported = ["backbone"]  # head stays fresh — fine-tune scenario

    def cast_like(path, init_leaf, new_leaf):
        # every imported leaf must match the target preset's shape — a
        # silent mismatch (e.g. reference num_queries=5 imported into a
        # 100-query preset, or a --num-classes override disagreeing with
        # the source head) would write a corrupt step-0 checkpoint that
        # only fails at the first restore
        new_leaf = jnp.asarray(new_leaf, dtype=init_leaf.dtype)
        if new_leaf.shape != init_leaf.shape:
            name = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            raise ValueError(
                f"imported leaf {name!r} has shape {new_leaf.shape}, the "
                f"{train_preset!r} preset expects {init_leaf.shape} — "
                f"source checkpoint and target preset disagree"
            )
        return new_leaf

    for key, tree in converted.items():
        if key not in params:
            raise KeyError(
                f"converted component {key!r} not in {sorted(params)} — "
                f"preset/task mismatch"
            )
        params[key] = jax.tree_util.tree_map_with_path(
            cast_like, params[key], tree
        )

    trainer.ckpt.save(0, state)
    trainer.ckpt.wait()
    return {
        "checkpoint_dir": checkpoint_dir,
        "train_preset": train_preset,
        "task": cfg.task,
        "imported": imported,
        "source_keys": len(state_dict),
    }


def main(argv=None):
    import argparse
    import json

    from arsvt_tpu.train.config import TRAIN_PRESETS

    p = argparse.ArgumentParser(
        description="Import torch ViT weights (HF / timm / the reference "
                    "repo's .pth) as an arsvt_tpu training checkpoint."
    )
    p.add_argument("--torch-state", required=True,
                   help=".pth/.bin (torch.save) or .safetensors file")
    p.add_argument("--checkpoint-dir", required=True,
                   help="output orbax checkpoint directory")
    p.add_argument("--train-preset", default="vit_base_finetune",
                   choices=sorted(TRAIN_PRESETS))
    p.add_argument("--source", default="auto",
                   choices=("auto", "hf", "timm", "reference"))
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--ln-eps", type=float, default=None,
                   help="LayerNorm eps for the imported weights (default: "
                        "auto — timm 1e-6 / HF 1e-12 / reference 1e-5)")
    args = p.parse_args(argv)
    overrides = {}
    if args.num_classes is not None:
        overrides["num_classes"] = args.num_classes
    if args.ln_eps is not None:
        overrides["ln_eps"] = args.ln_eps
    print(json.dumps(import_torch_checkpoint(
        args.torch_state, args.checkpoint_dir,
        train_preset=args.train_preset, source=args.source,
        overrides=overrides or None,
    )))


if __name__ == "__main__":
    main()
