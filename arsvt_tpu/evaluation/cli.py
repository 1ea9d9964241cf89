"""Evaluation CLI: `python -m arsvt_tpu.evaluation.cli --checkpoint-dir ...`.

Replaces `python evaluation.py` (/root/reference/evaluation.py:525-618),
fixing its two structural defects: the model is reconstructed from the
config STORED IN THE CHECKPOINT (never from separately-hardcoded constants
— the reference silently evaluated a 768-dim ViT against a 400-dim DeiT
checkpoint, SURVEY.md §3.4), and real metrics are emitted (top-1 /
per-class / confusion matrix for classification; COCO mAP for detection —
the reference printed only raw prediction counts, evaluation.py:593-615).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="arsvt_tpu evaluator")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--data-dir", default="")
    p.add_argument("--split", default="test")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--conf-threshold", type=float, default=0.5)
    p.add_argument("--nms-threshold", type=float, default=0.5)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--visualize", type=int, default=0,
                   help="save this many prediction visualizations")
    p.add_argument("--out", default="eval_results.json")
    args = p.parse_args(argv)

    # read the training config back out of the checkpoint first
    from arsvt_tpu.train.checkpoint import latest_step as latest_step_in

    step = (args.step if args.step is not None
            else latest_step_in(args.checkpoint_dir))
    if step is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint_dir}")

    # ONE loading path shared with serving: host-local (never rebuilds the
    # saved training mesh — a mesh_data=8 checkpoint must evaluate on a
    # 1-chip box) and params-only (the Adam moments are never read)
    from arsvt_tpu.serving.loading import load_inference_bundle
    from arsvt_tpu.train.trainer import Trainer

    params, cfg = load_inference_bundle(args.checkpoint_dir, step=step)
    print(f"checkpoint step {step}: preset={cfg.preset} task={cfg.task}",
          file=sys.stderr)
    trainer = Trainer(cfg.with_overrides(
        checkpoint_dir=args.checkpoint_dir, mesh_data=-1, mesh_model=1,
    ))
    from arsvt_tpu.parallel.sharding import shard_params

    trainer.state = {"params": shard_params(params, trainer.mesh)}

    data_dir = args.data_dir or cfg.data_dir
    if not data_dir:
        raise SystemExit("--data-dir required (checkpoint has none)")

    from arsvt_tpu.data.pipeline import (
        classification_batches,
        detection_batches,
    )
    from arsvt_tpu.train.config import input_canvas

    if cfg.task == "detect":
        from arsvt_tpu.data.coco import CocoDataset

        ds = CocoDataset(f"{data_dir}/{args.split}")
    else:
        # COCO split dirs or the TrashNet folder-per-class layout
        from arsvt_tpu.data.folder import open_classification_split

        ds = open_classification_split(data_dir, args.split)
    canvas = input_canvas(cfg)

    if cfg.task == "detect":
        from arsvt_tpu.evaluation.detect import evaluate_detector

        if args.visualize:
            _visualize_first_batches(trainer, ds, cfg, args, canvas)
        batches = detection_batches(
            ds, batch_size=args.batch_size, canvas=canvas,
            max_objects=cfg.max_objects, repeat=False, shuffle=False,
            drop_remainder=False,
        )
        results = evaluate_detector(
            trainer.eval_step, trainer.state["params"], batches,
            num_classes=cfg.num_classes,
            conf_threshold=args.conf_threshold,
            nms_threshold=args.nms_threshold,
        )
    else:
        batches = classification_batches(
            ds, batch_size=args.batch_size, canvas=canvas,
            repeat=False, shuffle=False, drop_remainder=False,
        )
        results = trainer.evaluate(batches)

    print(json.dumps(results, indent=1))
    with open(args.out, "w") as f:
        json.dump({"step": int(step), "split": args.split, **results}, f,
                  indent=1)
    return results


def _visualize_first_batches(trainer, ds, cfg, args, canvas):
    """The reference's first-batches PNG dump (evaluation.py:505-519)."""
    from arsvt_tpu.data.pipeline import detection_batches
    from arsvt_tpu.evaluation.detect import post_process
    from arsvt_tpu.evaluation.visualize import visualize_batch

    it = detection_batches(
        ds, batch_size=args.batch_size, canvas=canvas,
        max_objects=cfg.max_objects, repeat=False, shuffle=False,
        drop_remainder=False,
    )
    saved = []
    for bi, batch in enumerate(it):
        if len(saved) >= args.visualize:
            break
        m = trainer.eval_step(trainer.state["params"], batch)
        out = m["outputs"]
        posts = post_process(
            out["class_logits"], out["boxes_cxcywh"],
            conf_threshold=args.conf_threshold,
            nms_threshold=args.nms_threshold,
        )
        images_f32 = np.asarray(batch["image"], np.float32)
        if batch["image"].dtype == np.uint8:
            images_f32 /= 255.0
        saved += visualize_batch(
            images_f32, posts,
            {"boxes": batch["boxes"], "labels": batch["labels"],
             "mask": batch["mask"]},
            out_dir="eval_visualizations", batch_index=bi,
            max_images=min(2, args.visualize - len(saved)),
        )
    print(f"wrote {len(saved)} visualizations to eval_visualizations/",
          file=sys.stderr)


if __name__ == "__main__":
    main()
