"""Training CLI: `python -m arsvt_tpu.train.cli --preset ... --data-dir ...`.

Replaces the reference's entry point (`python train.py`, which had no CLI at
all — config edits required source changes, /root/reference/train.py:1343).
Every TrainConfig field is a flag; presets give the BASELINE.json configs;
`--resume` restores the latest checkpoint (the reference saved optimizer
state but had no code to load it — SURVEY.md §5 checkpoint row).
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import os
import sys

from arsvt_tpu.train.config import TRAIN_PRESETS, TrainConfig


def _parse_bool(s: str) -> bool:
    v = s.lower()
    if v in ("1", "true", "yes", "on"):
        return True
    if v in ("0", "false", "no", "off"):
        return False
    # anything else must FAIL, not silently become False — a typo like
    # `--remat ture` would otherwise flip a preset's True and e.g. OOM a
    # ViT-L run with no hint why
    raise argparse.ArgumentTypeError(f"expected true/false, got {s!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="arsvt_tpu trainer")
    p.add_argument("--train-preset", default=None,
                   help=f"one of {sorted(TRAIN_PRESETS)}")
    p.add_argument("--resume", action="store_true",
                   help="resume from latest checkpoint in checkpoint_dir")
    p.add_argument("--steps", type=int, default=None,
                   help="override total_steps")
    for f in dataclasses.fields(TrainConfig):
        flag = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(flag, type=_parse_bool, default=None)
        elif isinstance(f.default, int):
            p.add_argument(flag, type=int, default=None)
        elif isinstance(f.default, float) or "float" in str(f.type):
            p.add_argument(flag, type=float, default=None)
        else:
            p.add_argument(flag, type=str, default=None)
    return p


def config_from_args(args) -> TrainConfig:
    if args.train_preset:
        if args.train_preset not in TRAIN_PRESETS:
            raise SystemExit(
                f"unknown --train-preset {args.train_preset!r}; "
                f"one of {sorted(TRAIN_PRESETS)}"
            )
        cfg = TRAIN_PRESETS[args.train_preset]
    else:
        cfg = TrainConfig()
    overrides = {}
    for f in dataclasses.fields(TrainConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            overrides[f.name] = v
    if args.steps is not None:
        overrides["total_steps"] = args.steps
    return cfg.with_overrides(**overrides)


def make_data(cfg: TrainConfig, *, skip_batches: int = 0):
    """Returns (train_batches, eval_batches_fn).

    Under ARSVT_MULTIHOST each process loads only its stride-shard of the
    records and feeds batch_size // process_count rows; the trainer
    assembles the global batch (parallel/multihost.py).

    `skip_batches`: fast-forward the train stream past the batches an
    interrupted run already consumed (one batch per step) — a resumed run
    then sees exactly the data an uninterrupted one would, instead of
    re-consuming the earliest epochs (skipping is index-level: nothing is
    decoded)."""
    import itertools as _it

    import jax

    from arsvt_tpu.parallel.multihost import local_batch
    from arsvt_tpu.train.config import input_canvas

    pidx, pcount = jax.process_index(), jax.process_count()
    try:
        local_bs = local_batch(cfg.batch_size)
    except ValueError as e:
        raise SystemExit(str(e))
    if not cfg.data_dir:
        if cfg.task == "detect":
            raise SystemExit("--data-dir required for detection training")
        from arsvt_tpu.data.synthetic import synthetic_classification_batches

        size = input_canvas(cfg)
        train = synthetic_classification_batches(
            batch_size=local_bs, image_size=size, seed=cfg.seed + pidx
        )
        if skip_batches:
            # synthetic draws are cheap; replaying the stream keeps the
            # resumed data order identical to the uninterrupted run
            train = _it.islice(train, skip_batches, None)

        def eval_batches():
            return itertools.islice(
                synthetic_classification_batches(
                    batch_size=local_bs, image_size=size, seed=9999 + pidx
                ),
                8,
            )

        return train, eval_batches

    from arsvt_tpu.data.pipeline import (
        classification_batches,
        detection_batches,
    )

    if cfg.task == "detect":
        from arsvt_tpu.data.coco import CocoDataset

        train_ds = CocoDataset(f"{cfg.data_dir}/train")
        val_ds = CocoDataset(f"{cfg.data_dir}/valid")
    else:
        # classification accepts COCO splits OR the TrashNet-style
        # folder-per-class layout (data/folder.py auto-detects, incl.
        # the unsplit layout via a stable per-file hash split)
        from arsvt_tpu.data.folder import open_classification_split

        train_ds = open_classification_split(cfg.data_dir, "train")
        val_ds = open_classification_split(cfg.data_dir, "valid")
    if train_ds.num_classes > cfg.num_classes:
        raise SystemExit(
            f"dataset has {train_ds.num_classes} classes "
            f"({train_ds.class_names}) but num_classes={cfg.num_classes}; "
            f"pass --num-classes {train_ds.num_classes} (labels beyond "
            f"num_classes would silently contribute zero CE gradient)"
        )
    canvas = input_canvas(cfg)
    host_shard = dict(process_index=pidx, process_count=pcount)
    if cfg.task == "detect":
        train = detection_batches(
            train_ds, batch_size=local_bs, canvas=canvas,
            max_objects=cfg.max_objects, seed=cfg.seed,
            skip_batches=skip_batches, **host_shard,
        )

        def eval_batches():
            # padded equal shards: every host yields the same batch count
            # (collective eval never deadlocks on pods — plateau schedules
            # work multi-host) and the eval shape is fixed (no ragged-tail
            # recompile); pad rows carry valid=0 and drop out of metrics
            return detection_batches(
                val_ds, batch_size=local_bs, canvas=canvas,
                max_objects=cfg.max_objects, seed=1, repeat=False,
                shuffle=False, drop_remainder=False,
                pad_to_equal_batches=True, **host_shard,
            )
    else:
        train = classification_batches(
            train_ds, batch_size=local_bs, canvas=canvas,
            seed=cfg.seed, skip_batches=skip_batches, **host_shard,
        )

        def eval_batches():
            # see the detection eval_batches note on pad_to_equal_batches
            return classification_batches(
                val_ds, batch_size=local_bs, canvas=canvas,
                seed=1, repeat=False, shuffle=False, drop_remainder=False,
                pad_to_equal_batches=True, **host_shard,
            )

    return train, eval_batches


def main(argv=None):
    import jax  # deferred past arg parsing; backends init lazily later

    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    # multi-host pods: every process runs this same command line with
    # ARSVT_MULTIHOST=1; jax.distributed auto-discovers the pod topology
    if os.environ.get("ARSVT_MULTIHOST"):
        from arsvt_tpu.parallel.multihost import initialize_multihost

        if not initialize_multihost():
            # NEVER degrade silently to N independent trainings writing
            # the same checkpoint_dir — the operator asked for a pod run
            raise SystemExit(
                "ARSVT_MULTIHOST=1 but jax.distributed failed to "
                "initialize (no pod metadata/coordinator found, or the "
                "backend was already initialized single-process). Unset "
                "ARSVT_MULTIHOST for single-host runs."
            )
        print(f"multihost: process {jax.process_index()}/"
              f"{jax.process_count()}", file=sys.stderr)

    # ARSVT_PLATFORM=cpu must pin EVERYTHING to CPU, not just the mesh:
    # some PJRT plugins (the axon TPU tunnel) ignore JAX_PLATFORMS, so
    # un-pinned ops (param init, host arrays) would otherwise ride the
    # tunnel even for CPU-mesh runs and couple them to its health.
    platform = os.environ.get("ARSVT_PLATFORM")
    if platform:
        # local_devices, not devices: multi-process jax.devices() is the
        # GLOBAL list, whose first entry belongs to process 0 — pinning a
        # non-addressable default device makes every eager op on other
        # processes produce arrays they cannot read
        jax.config.update(
            "jax_default_device", jax.local_devices(backend=platform)[0]
        )

    from arsvt_tpu.train.trainer import Trainer
    from arsvt_tpu.utils.logging import MetricLogger

    import dataclasses as _dc

    trainer = Trainer(
        cfg,
        logger=MetricLogger(out_dir=".", run_config=_dc.asdict(cfg)),
    )

    start = 0
    if args.resume:
        start = trainer.maybe_resume()
        print(f"resumed at step {start}", file=sys.stderr)

    # fast-forward the data stream past the batches the interrupted run
    # consumed (one per step) so resumed training never re-sees early data
    # multi-host in-training eval works: make_data's eval streams pad to
    # equal per-host batch counts (pipeline.py pad_to_equal_batches), so
    # the collective eval step never deadlocks and plateau schedules run
    # on pods (tests/test_multihost_eval.py drives 2 real processes)
    train_batches, eval_batches_fn = make_data(cfg, skip_batches=start)
    last = trainer.fit(train_batches, eval_batches_fn=eval_batches_fn)
    print(f"done: {last}", file=sys.stderr)
    return last


if __name__ == "__main__":
    main()
