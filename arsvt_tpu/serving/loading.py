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

    Raises FileNotFoundError when the directory holds no checkpoint.
    """
    import orbax.checkpoint as ocp

    from arsvt_tpu.train.config import TrainConfig
    from arsvt_tpu.train.trainer import Trainer

    mgr = ocp.CheckpointManager(checkpoint_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {checkpoint_dir}")
    cfg_json = mgr.restore(
        step, args=ocp.args.Composite(config=ocp.args.JsonRestore())
    )["config"]["train_config"]
    mgr.close()
    cfg = TrainConfig.from_json(cfg_json)
    trainer = Trainer(cfg.with_overrides(checkpoint_dir=checkpoint_dir))
    trainer.init_state()
    trainer.state, _ = trainer.ckpt.restore(trainer.state, step=step)
    return trainer.state["params"], cfg
