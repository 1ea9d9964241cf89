"""Checkpoint → inference-bundle loading shared by the serving surfaces.

The reference never reads its saved config back (it saves `config` at
train.py:1653 but evaluation.py:527-541 re-hardcodes a *different*
architecture and loads with strict=False — SURVEY §3.4's silent-mismatch
defect). Here every serving entry point reconstructs the model from the
config stored inside the checkpoint, so an artifact can never be served
under the wrong architecture.
"""

from __future__ import annotations


def load_inference_bundle(checkpoint_dir: str, *, step: int | None = None):
    """Restore (params, TrainConfig) from an orbax training checkpoint.

    Host-local and params-only: the saved mesh shape is NOT rebuilt (a
    checkpoint trained mesh_data=8 must serve on a 1-chip box — rebuilding
    the training mesh raised 'mesh 8x1 does not cover 1 devices') and the
    Adam moments are never deserialized (orbax partial restore; ~2x the
    parameter bytes of disk reads a serving process can't use).

    Raises FileNotFoundError when the directory holds no checkpoint.
    """
    import jax

    from arsvt_tpu.train.checkpoint import load_params_for_eval, peek_config
    from arsvt_tpu.train.config import resolve_backbone, resolve_detector

    cfg = peek_config(checkpoint_dir, step=step)
    if cfg.task == "detect":
        from arsvt_tpu.models.detector import init_detector

        params_like = init_detector(
            jax.random.PRNGKey(0), resolve_detector(cfg)
        )
    else:
        from arsvt_tpu.models.classifier import init_image_classifier

        params_like = init_image_classifier(
            jax.random.PRNGKey(0), resolve_backbone(cfg), cfg.num_classes
        )
    params, _ = load_params_for_eval(
        checkpoint_dir, cfg, params_like, step=step
    )
    return params, cfg
