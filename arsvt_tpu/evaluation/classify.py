"""Classification evaluation + the streaming sorter loop.

North-star metric surface (BASELINE.json): top-1 accuracy, per-class
accuracy, confusion matrix on the 6-class taxonomy; and a streaming
single-image classify path with a p50 latency meter for the physical
sorter loop (config #5: "JPEG decode→preprocess→classify single-image
pipeline").
"""

from __future__ import annotations

import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from arsvt_tpu.data.taxonomy import RECYCLING_CLASSES, class_name
from arsvt_tpu.utils.latency import LatencyWindow
from arsvt_tpu.models.classifier import apply_image_classifier
from arsvt_tpu.objectives.classification import confusion_matrix


def evaluate_classifier(
    params, batches: Iterator[dict], backbone_cfg, num_classes: int,
    *, compute_dtype=jnp.bfloat16, normalize_inputs: bool = False,
    quantize: str | None = None,
) -> dict:
    """Full eval sweep -> {top1, per_class_accuracy, confusion_matrix, n}.

    `normalize_inputs` must match the checkpoint's training contract: pass
    `cfg.augment != "none"` — crop_flip/randaugment training normalizes
    (ImageNet stats) inside the step, so eval must too (train_step.py's
    eval_step applies the same rule; this standalone API mirrors it).

    `quantize="int8"` runs the W8A8 backbone (models/quantized.py): int8
    MXU matmuls with per-token activation scales — the high-throughput
    serving path. None (default) is the exact bf16/fp32 forward.
    """
    if quantize not in (None, "int8"):
        raise ValueError(f"unknown quantize mode {quantize!r}")
    if quantize == "int8":
        from arsvt_tpu.models.quantized import quantize_image_classifier

        params = quantize_image_classifier(params, backbone_cfg)

    @jax.jit
    def step(params, images, labels):
        from arsvt_tpu.core.dtypes import to_unit_float

        x = to_unit_float(images, jnp.float32)
        if normalize_inputs:
            from arsvt_tpu.data.augment import eval_preprocess

            x = jax.vmap(
                lambda im: eval_preprocess(im, size=backbone_cfg.image_size)
            )(x)
        if quantize == "int8":
            from arsvt_tpu.models.quantized import (
                apply_image_classifier_int8,
            )

            logits = apply_image_classifier_int8(
                params, x.astype(compute_dtype), backbone_cfg, num_classes,
                compute_dtype=compute_dtype,
            )
        else:
            logits = apply_image_classifier(
                params, x.astype(compute_dtype), backbone_cfg,
                num_classes,
            )
        preds = jnp.argmax(logits, axis=-1)
        return (
            jnp.sum((preds == labels).astype(jnp.int32)),
            confusion_matrix(preds, labels, num_classes),
        )

    correct, total = 0, 0
    conf = np.zeros((num_classes, num_classes), np.int64)
    for batch in batches:
        c, cm = step(params, batch["image"], batch["label"])
        correct += int(c)
        total += int(batch["label"].shape[0])
        conf += np.asarray(cm)
    per_class = {}
    for i, name in enumerate(RECYCLING_CLASSES[:num_classes]):
        row = conf[i].sum()
        per_class[name] = float(conf[i, i] / row) if row else float("nan")
    return {
        "top1": correct / total if total else float("nan"),
        "per_class_accuracy": per_class,
        "confusion_matrix": conf.tolist(),
        "n": total,
    }


def _load_letterboxed_single(path: str, size: int) -> np.ndarray:
    """Decode one image + letterbox to (size, size, 3): native C++ core
    when built, PIL fallback otherwise. Shared by both streaming paths.

    Returns RAW uint8 — the jitted forwards rescale on device
    (to_unit_float), and shipping bytes instead of fp32 is 4x less H2D,
    which through the serving tunnel is most of the single-image p50
    (BENCH_r04: 43.9 ms of a 72.7 ms p50 was the fp32 frame's H2D)."""
    from arsvt_tpu.data import native_loader

    if native_loader.available():
        images, meta = native_loader.load_letterboxed_batch(
            [path], size, dtype=np.uint8
        )
        if meta[0, 3] == 0.0:
            raise ValueError(f"undecodable image: {path}")
        return images[0]
    from arsvt_tpu.data.pipeline import letterbox_u8, load_image_u8

    image, _ = letterbox_u8(load_image_u8(path), size)
    return image


class StreamingClassifier(LatencyWindow):
    """Single-image classify path for the physical sorter loop.

    Pre-compiles a batch-1 forward; `__call__` takes one HWC uint8 or
    [0,1]-float image and returns (class_index, class_name, probs) —
    uint8 is rescaled and (when `normalize_inputs`, the default, matching
    checkpoints trained with augment != "none") ImageNet-normalized inside
    the jitted forward. Tracks latency for the p50 metric.
    """

    def __init__(self, params, backbone_cfg, num_classes: int,
                 *, compute_dtype=jnp.bfloat16, preprocess=None,
                 normalize_inputs: bool = True, quantize: str | None = None):
        """`quantize="int8"`: serve the W8A8 backbone (models/quantized.py)
        — int8 MXU matmuls, 4x smaller weights; parity pinned by
        tests/test_quant.py."""
        self._cfg = backbone_cfg
        self._n = num_classes
        self._preprocess = preprocess
        self._normalize_inputs = normalize_inputs
        self._latencies = self.new_window()
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        if quantize == "int8":
            from arsvt_tpu.models.quantized import quantize_image_classifier

            params = quantize_image_classifier(params, backbone_cfg)

        @jax.jit
        def infer_batched(params, images):
            from arsvt_tpu.core.dtypes import to_unit_float

            x = to_unit_float(images, jnp.float32)
            if normalize_inputs:
                from arsvt_tpu.data.augment import normalize

                x = normalize(x)
            if quantize == "int8":
                from arsvt_tpu.models.quantized import (
                    apply_image_classifier_int8,
                )

                logits = apply_image_classifier_int8(
                    params, x.astype(compute_dtype),
                    backbone_cfg, num_classes,
                    compute_dtype=compute_dtype,
                )
            else:
                logits = apply_image_classifier(
                    params, x.astype(compute_dtype),
                    backbone_cfg, num_classes,
                )
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.argmax(probs, axis=-1), probs

        def infer(params, image):
            idx, probs = infer_batched(params, image[None])
            return idx[0], probs[0]

        self._infer = infer
        self._infer_batched = infer_batched
        self._params = params
        # warm up compile so first real frame is not a 20s outlier —
        # BOTH input dtypes (they key separate traces): classify_path
        # ships raw uint8 frames, external callers may pass [0,1] fp32
        s = backbone_cfg.image_size
        jax.block_until_ready(
            self._infer(params, jnp.zeros((s, s, 3), jnp.float32))
        )
        jax.block_until_ready(
            self._infer(params, jnp.zeros((s, s, 3), jnp.uint8))
        )

    def __call__(self, image) -> tuple[int, str, np.ndarray]:
        t0 = time.perf_counter()
        if self._preprocess is not None:
            image = self._preprocess(image)
        if self._normalize_inputs:
            from arsvt_tpu.core.dtypes import check_unit_range_images

            check_unit_range_images(
                image, "StreamingClassifier(normalize_inputs=True)"
            )
        # ONE blocking fetch for both outputs: `int(idx)` then
        # `np.asarray(probs)` would each pay a full tunnel round trip
        # (BENCH_r04's 28.8 ms "device+dispatch" for a 0.3 ms forward)
        idx, probs = jax.device_get(
            self._infer(self._params, jnp.asarray(image))
        )
        idx = int(idx)
        probs = np.asarray(probs)
        self._latencies.append(time.perf_counter() - t0)
        return idx, class_name(idx), probs

    @property
    def image_size(self) -> int:
        return self._cfg.image_size

    def infer_batch(self, images) -> tuple[np.ndarray, np.ndarray]:
        """Batched forward for the serving micro-batcher: (B, S, S, 3)
        uint8 or [0,1]-float images -> (class_idx[B], probs[B, C]). One
        compile per distinct B — callers should pad to a fixed bucket."""
        if self._normalize_inputs:
            from arsvt_tpu.core.dtypes import check_unit_range_images

            check_unit_range_images(
                images, "infer_batch(normalize_inputs=True)"
            )
        idx, probs = jax.device_get(
            self._infer_batched(self._params, jnp.asarray(images))
        )
        return np.asarray(idx), np.asarray(probs)

    def classify_path(self, path: str) -> tuple[int, str, np.ndarray]:
        """Full sorter-loop step: JPEG decode → letterbox → rescale/
        normalize (inside the jitted forward) → classify (BASELINE config
        #5). Decode uses the native C++ core when built."""
        t0 = time.perf_counter()
        image = _load_letterboxed_single(path, self._cfg.image_size)
        result = self(image)
        # replace the __call__ latency with the full decode-included one
        self.replace_last_latency(time.perf_counter() - t0)
        return result


class StreamingDetector(LatencyWindow):
    """Single-image detect path: decode → preprocess → DETR forward →
    post-process (conf threshold + NMS). Counterpart of StreamingClassifier
    for the sorter's detection mode."""

    def __init__(self, params, detector_cfg, *, compute_dtype=jnp.bfloat16,
                 conf_threshold: float = 0.5, nms_threshold: float = 0.5,
                 normalize_inputs: bool = True, quantize: str | None = None):
        """`normalize_inputs` must match the training contract: True for
        checkpoints trained with augment="detection" (the pipeline
        normalizes), False for augment="none" (raw [0,1] inputs).

        `quantize="int8"`: W8A8 backbone, fp DETR head
        (models/quantized.py)."""
        from arsvt_tpu.data.augment import normalize
        from arsvt_tpu.evaluation.detect import post_process
        from arsvt_tpu.models.detector import apply_detector

        self._cfg = detector_cfg
        self._latencies = self.new_window()
        size = detector_cfg.backbone.image_size
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        if quantize == "int8":
            from arsvt_tpu.models.quantized import quantize_detector

            params = quantize_detector(params, detector_cfg)

        @jax.jit
        def infer(params, image):
            from arsvt_tpu.core.dtypes import to_unit_float

            x = to_unit_float(image, jnp.float32)
            if normalize_inputs:
                x = normalize(x)
            if quantize == "int8":
                from arsvt_tpu.models.quantized import apply_detector_int8

                out = apply_detector_int8(
                    params, x[None].astype(compute_dtype), detector_cfg,
                    compute_dtype=compute_dtype,
                )
            else:
                out = apply_detector(
                    params, x[None].astype(compute_dtype),
                    detector_cfg, train=False,
                )
            return post_process(
                out["class_logits"], out["boxes_cxcywh"],
                conf_threshold=conf_threshold, nms_threshold=nms_threshold,
            )

        self._infer = infer
        self._params = params
        self._size = size
        # warm both input-dtype traces (detect_path ships raw uint8)
        jax.device_get(
            infer(params, jnp.zeros((size, size, 3), jnp.float32))["valid"]
        )
        jax.device_get(
            infer(params, jnp.zeros((size, size, 3), jnp.uint8))["valid"]
        )

    @property
    def image_size(self) -> int:
        return self._size

    def detect_path(self, path: str) -> dict:
        t0 = time.perf_counter()
        image = _load_letterboxed_single(path, self._size)
        # one blocking fetch for the whole output dict (sequential
        # np.asarray calls would pay a tunnel round trip per array)
        out = jax.device_get(self._infer(self._params, jnp.asarray(image)))
        out = {k: np.asarray(v)[0] for k, v in out.items()}
        sel = out["valid"]
        result = {
            "boxes": out["boxes"][sel],
            "labels": out["labels"][sel],
            "scores": out["scores"][sel],
            "class_names": [class_name(i) for i in out["labels"][sel]],
        }
        self._latencies.append(time.perf_counter() - t0)
        return result
