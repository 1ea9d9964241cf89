"""Serving surfaces: HTTP server, StableHLO export, artifact engines.

Submodules are loaded lazily so `python -m arsvt_tpu.serving.export` /
`.server` run as clean entry points (no runpy double-import warning) and
importing one surface does not pull in the others' dependencies.
"""

_EXPORTS = {
    "MicroBatcher": "arsvt_tpu.serving.batching",
    "ArtifactClassifier": "arsvt_tpu.serving.artifact",
    "ArtifactDetector": "arsvt_tpu.serving.artifact",
    "load_artifact_engine": "arsvt_tpu.serving.artifact",
    "export_checkpoint": "arsvt_tpu.serving.export",
    "export_classifier": "arsvt_tpu.serving.export",
    "export_detector": "arsvt_tpu.serving.export",
    "load_exported": "arsvt_tpu.serving.export",
    "save_exported": "arsvt_tpu.serving.export",
    "load_inference_bundle": "arsvt_tpu.serving.loading",
    "InferenceServer": "arsvt_tpu.serving.server",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
