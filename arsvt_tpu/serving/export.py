"""Serialized inference artifacts via `jax.export` (StableHLO).

The TPU-native deployment story the reference lacks entirely (its only
artifact is a torch.save pickle that evaluation.py:375-391 reloads with
strict=False into a possibly-different architecture): export the FULL
jitted serving computation — uint8 image batch → [0,1] rescale →
ImageNet normalize → forward (bf16 or int8-W8A8) → softmax / DETR
post-process — as one self-contained StableHLO module with the weights
baked in as constants. The artifact:

- is one file, loadable without orbax, model code, or the training config
  (`load_exported(path).call(images)`);
- pins the preprocessing contract at export time (`normalize_inputs`,
  thresholds) so it cannot drift from the checkpoint's training contract;
- has a symbolic batch dimension (any B at call time, one compile per
  backend);
- can be lowered for multiple backends at once (`platforms=("tpu","cpu")`)
  for edge-CPU sorter deployments of TPU-trained models.

Classify artifacts return `(class_idx[B], probs[B,C])`; detect artifacts
return the post-processed `{boxes, scores, labels, valid}` dict exactly as
`evaluation.detect.post_process` emits it.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

_SUPPORTED_QUANT = (None, "int8")


@contextlib.contextmanager
def _portable_trace_guard(platforms):
    """Force the pure-jnp op path while tracing a portable artifact.

    Pallas Mosaic kernels lower only for TPU: exporting from a TPU host
    (where `ops.dispatch.use_pallas()` is True) with any non-TPU platform
    in `platforms` would embed `tpu_custom_call`s that cannot lower for
    CPU and the export would fail. The jnp reference path lowers for every
    backend (including TPU — slower than the kernels, but portable), so a
    multi-/non-TPU-platform export trades kernel speed for portability.
    A TPU-only export (platforms None or ("tpu",)) keeps the kernels.
    """
    if platforms is not None and any(p != "tpu" for p in platforms):
        old = os.environ.get("ARSVT_DISABLE_PALLAS")
        old_force = os.environ.pop("ARSVT_FORCE_PALLAS", None)
        os.environ["ARSVT_DISABLE_PALLAS"] = "1"
        try:
            yield
        finally:
            if old is None:
                os.environ.pop("ARSVT_DISABLE_PALLAS", None)
            else:
                os.environ["ARSVT_DISABLE_PALLAS"] = old
            if old_force is not None:
                os.environ["ARSVT_FORCE_PALLAS"] = old_force
    else:
        yield


def _check_quant(quantize):
    if quantize not in _SUPPORTED_QUANT:
        raise ValueError(f"unknown quantize mode {quantize!r}")


def _input_spec(image_size: int, input_dtype):
    b = jax.export.symbolic_shape("b")[0]
    return jax.ShapeDtypeStruct((b, image_size, image_size, 3), input_dtype)


def export_classifier(params, backbone_cfg, num_classes: int, *,
                      compute_dtype=jnp.bfloat16,
                      normalize_inputs: bool = True,
                      quantize: str | None = None,
                      input_dtype=jnp.uint8,
                      platforms: tuple[str, ...] | None = None):
    """Classifier checkpoint → `jax.export.Exported` serving artifact.

    The exported callable maps `(B, S, S, 3)` images (uint8 by default —
    the sorter camera's native dtype; `input_dtype` overrides) to
    `(class_idx[B] int32, probs[B, num_classes] float32)`. B is symbolic.
    """
    from arsvt_tpu.core.dtypes import to_unit_float
    from arsvt_tpu.data.augment import normalize
    from arsvt_tpu.models.classifier import apply_image_classifier

    _check_quant(quantize)
    if quantize == "int8":
        from arsvt_tpu.models.quantized import (
            apply_image_classifier_int8,
            quantize_image_classifier,
        )

        params = quantize_image_classifier(params, backbone_cfg)

    def serve(images):
        x = to_unit_float(images, jnp.float32)
        if normalize_inputs:
            x = normalize(x)
        if quantize == "int8":
            logits = apply_image_classifier_int8(
                params, x.astype(compute_dtype), backbone_cfg, num_classes,
                compute_dtype=compute_dtype,
            )
        else:
            logits = apply_image_classifier(
                params, x.astype(compute_dtype), backbone_cfg, num_classes,
            )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(probs, axis=-1).astype(jnp.int32), probs

    spec = _input_spec(backbone_cfg.image_size, input_dtype)
    with _portable_trace_guard(platforms):
        return jax.export.export(
            jax.jit(serve), platforms=platforms
        )(spec)


def export_detector(params, detector_cfg, *,
                    compute_dtype=jnp.bfloat16,
                    normalize_inputs: bool = True,
                    quantize: str | None = None,
                    conf_threshold: float = 0.5,
                    nms_threshold: float = 0.5,
                    input_dtype=jnp.uint8,
                    platforms: tuple[str, ...] | None = None):
    """Detector checkpoint → `jax.export.Exported` serving artifact.

    The exported callable maps `(B, S, S, 3)` images to the post-processed
    `{boxes[B,Q,4], scores[B,Q], labels[B,Q], valid[B,Q]}` dict (conf
    threshold + class-aware NMS baked in at the exported thresholds).
    """
    from arsvt_tpu.core.dtypes import to_unit_float
    from arsvt_tpu.data.augment import normalize
    from arsvt_tpu.evaluation.detect import post_process
    from arsvt_tpu.models.detector import apply_detector

    _check_quant(quantize)
    if quantize == "int8":
        from arsvt_tpu.models.quantized import quantize_detector

        params = quantize_detector(params, detector_cfg)

    def serve(images):
        x = to_unit_float(images, jnp.float32)
        if normalize_inputs:
            x = normalize(x)
        if quantize == "int8":
            from arsvt_tpu.models.quantized import apply_detector_int8

            out = apply_detector_int8(
                params, x.astype(compute_dtype), detector_cfg,
                compute_dtype=compute_dtype,
            )
        else:
            out = apply_detector(
                params, x.astype(compute_dtype), detector_cfg, train=False,
            )
        return post_process(
            out["class_logits"], out["boxes_cxcywh"],
            conf_threshold=conf_threshold, nms_threshold=nms_threshold,
        )

    spec = _input_spec(detector_cfg.backbone.image_size, input_dtype)
    with _portable_trace_guard(platforms):
        return jax.export.export(
            jax.jit(serve), platforms=platforms
        )(spec)


def save_exported(exported, path: str) -> None:
    """Serialize an `Exported` to one portable file."""
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    """Load a serialized artifact; run it with `.call(images)`.

    `.call` is traceable — it composes under `jax.jit` at the deployment
    site for repeated low-latency invocation.
    """
    with open(path, "rb") as f:
        return jax.export.deserialize(bytearray(f.read()))


def export_checkpoint(checkpoint_dir: str, out_path: str, *,
                      step: int | None = None,
                      quantize: str | None = None,
                      conf_threshold: float | None = None,
                      nms_threshold: float | None = None,
                      platforms: tuple[str, ...] | None = None) -> dict:
    """Training checkpoint → serialized serving artifact on disk.

    Reads the architecture and the preprocessing contract from the config
    stored inside the checkpoint (never from caller-supplied constants —
    the reference's silent-mismatch defect, SURVEY §3.4). The thresholds
    apply to detect checkpoints only (default 0.5) — passing them for a
    classify checkpoint is an error, not a silent no-op. Returns a
    manifest dict describing what was exported.
    """
    from arsvt_tpu.serving.loading import load_inference_bundle

    params, cfg = load_inference_bundle(checkpoint_dir, step=step)
    normalize_inputs = cfg.augment != "none"
    manifest = {
        "task": cfg.task,
        "normalize_inputs": normalize_inputs,
        "quantize": quantize,
        "path": out_path,
    }
    if cfg.task == "detect":
        from arsvt_tpu.train.config import resolve_detector

        det_cfg = resolve_detector(cfg)
        conf = 0.5 if conf_threshold is None else conf_threshold
        nms = 0.5 if nms_threshold is None else nms_threshold
        exported = export_detector(
            params, det_cfg, normalize_inputs=normalize_inputs,
            quantize=quantize, conf_threshold=conf,
            nms_threshold=nms, platforms=platforms,
        )
        image_size = det_cfg.backbone.image_size
        manifest.update(conf_threshold=conf, nms_threshold=nms)
    else:
        if conf_threshold is not None or nms_threshold is not None:
            raise ValueError(
                "conf/nms thresholds apply to detect checkpoints; "
                f"{checkpoint_dir} holds a {cfg.task!r} checkpoint"
            )
        from arsvt_tpu.train.config import resolve_backbone

        bb_cfg = resolve_backbone(cfg)
        exported = export_classifier(
            params, bb_cfg, cfg.num_classes,
            normalize_inputs=normalize_inputs, quantize=quantize,
            platforms=platforms,
        )
        image_size = bb_cfg.image_size
    save_exported(exported, out_path)
    manifest.update(
        image_size=image_size,
        platforms=list(exported.platforms),
        input="(b, {s}, {s}, 3) uint8".format(s=image_size),
    )
    return manifest


def main(argv=None):
    import argparse
    import json

    p = argparse.ArgumentParser(
        description="Export a training checkpoint as a self-contained "
                    "StableHLO serving artifact."
    )
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--int8", action="store_true",
                   help="export the W8A8 quantized backbone")
    p.add_argument("--conf-threshold", type=float, default=None,
                   help="detect checkpoints only (default 0.5)")
    p.add_argument("--nms-threshold", type=float, default=None,
                   help="detect checkpoints only (default 0.5)")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets, e.g. tpu,cpu "
                        "(default: current backend)")
    args = p.parse_args(argv)
    platforms = (
        tuple(s.strip() for s in args.platforms.split(","))
        if args.platforms else None
    )
    manifest = export_checkpoint(
        args.checkpoint_dir, args.out, step=args.step,
        quantize="int8" if args.int8 else None,
        conf_threshold=args.conf_threshold,
        nms_threshold=args.nms_threshold, platforms=platforms,
    )
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
