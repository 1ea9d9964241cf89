"""Serve a StableHLO export artifact — no model code, config, or orbax.

The counterpart of `serving/export.py`: `load_artifact_engine(path)`
deserializes an exported module (weights baked in, preprocessing contract
pinned at export time) and wraps it in the same duck-typed surface the
HTTP server drives (`__call__`/`classify_path` or `detect_path`,
`latency_stats`, `image_size`) — so a deployment box needs only this file
and the artifact, never the training stack. The reference cannot do this
at all: its torch.save pickle requires the full model source and silently
tolerates architecture mismatch (evaluation.py:375-391, SURVEY §3.4).

The task (classify vs detect) and the input contract (image size, dtype)
are introspected from the artifact itself — `Exported.in_avals` carries
the (b, S, S, 3) input spec with its symbolic batch dim, `out_tree` the
output structure (classify: `(class_idx, probs)` tuple; detect: the
post-processed `{boxes, scores, labels, valid}` dict).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from arsvt_tpu.data.taxonomy import class_name
from arsvt_tpu.utils.latency import LatencyWindow


def _artifact_task(exported) -> str:
    """Classify or detect, from the artifact's output structure alone."""
    tree = jax.tree_util.tree_unflatten(
        exported.out_tree, [None] * exported.out_tree.num_leaves
    )
    if isinstance(tree, dict) and "boxes" in tree:
        return "detect"
    if isinstance(tree, (tuple, list)) and len(tree) == 2:
        return "classify"
    raise ValueError(
        f"unrecognized artifact output structure: {exported.out_tree}"
    )


class _ArtifactEngine(LatencyWindow):
    """Shared plumbing: input-contract introspection, batch-1 jit, latency
    window. `__call__`-level semantics live in the task subclasses."""

    def __init__(self, exported):
        aval = exported.in_avals[0]
        if len(aval.shape) != 4 or aval.shape[3] != 3:
            raise ValueError(
                f"artifact input is not a (b, S, S, 3) image batch: "
                f"{aval.shape}"
            )
        self.image_size = int(aval.shape[1])
        self._input_dtype = aval.dtype
        self._call = jax.jit(exported.call)
        self._latencies = self.new_window()

    def _to_input_batch(self, image) -> jnp.ndarray:
        """One HWC image (uint8 or [0,1] float) → the artifact's exact
        (1, S, S, 3) input dtype. The artifact rescales/normalizes inside
        its graph per the contract baked at export time."""
        arr = np.asarray(image)
        if arr.shape != (self.image_size, self.image_size, 3):
            raise ValueError(
                f"expected ({self.image_size}, {self.image_size}, 3) "
                f"image, got {arr.shape}"
            )
        from arsvt_tpu.core.dtypes import check_unit_range_images

        # already-normalized or [0,255]-scaled floats would be silently
        # mangled by the uint8 round-trip / unit-float pass-through;
        # normalization happens inside the artifact per its export contract
        check_unit_range_images(arr, "artifact engines")
        if np.issubdtype(self._input_dtype, np.integer):
            if np.issubdtype(arr.dtype, np.floating):
                arr = np.clip(np.round(arr * 255.0), 0, 255)
            arr = arr.astype(self._input_dtype)
        else:
            if np.issubdtype(arr.dtype, np.integer):
                arr = arr.astype(np.float32) / 255.0
            arr = arr.astype(self._input_dtype)
        return jnp.asarray(arr[None])

class ArtifactClassifier(_ArtifactEngine):
    """StreamingClassifier-compatible engine over a classify artifact."""

    def infer_batch(self, images) -> tuple[np.ndarray, np.ndarray]:
        """Batched forward for the serving micro-batcher: (B, S, S, 3)
        uint8 or [0,1]-float -> (class_idx[B], probs[B, C]). The symbolic
        batch dim compiles once per distinct B — callers pad to a bucket."""
        arr = np.asarray(images)
        batched = np.stack([
            np.asarray(self._to_input_batch(im))[0] for im in arr
        ])
        idx, probs = self._call(jnp.asarray(batched))
        return np.asarray(idx), np.asarray(probs)

    def __call__(self, image):
        t0 = time.perf_counter()
        # one blocking fetch for both outputs (per-array np.asarray would
        # pay a tunnel round trip each — see StreamingClassifier.__call__)
        idx, probs = jax.device_get(self._call(self._to_input_batch(image)))
        idx = int(np.asarray(idx)[0])
        probs = np.asarray(probs)[0]
        self._latencies.append(time.perf_counter() - t0)
        return idx, class_name(idx), probs

    def classify_path(self, path: str):
        from arsvt_tpu.evaluation.classify import _load_letterboxed_single

        t0 = time.perf_counter()
        result = self(_load_letterboxed_single(path, self.image_size))
        self.replace_last_latency(time.perf_counter() - t0)
        return result


class ArtifactDetector(_ArtifactEngine):
    """StreamingDetector-compatible engine over a detect artifact."""

    def detect_path(self, path: str) -> dict:
        from arsvt_tpu.evaluation.classify import _load_letterboxed_single

        t0 = time.perf_counter()
        image = _load_letterboxed_single(path, self.image_size)
        out = jax.device_get(self._call(self._to_input_batch(image)))
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


def load_artifact_engine(path: str):
    """Artifact file → ArtifactClassifier or ArtifactDetector (task is
    read from the artifact's own output structure)."""
    from arsvt_tpu.serving.export import load_exported

    exported = load_exported(path)
    task = _artifact_task(exported)
    if task == "detect":
        return ArtifactDetector(exported)
    return ArtifactClassifier(exported)
