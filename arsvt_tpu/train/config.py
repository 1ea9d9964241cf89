"""One config to rule train *and* eval.

The reference hardcodes two diverging config surfaces
(/root/reference/train.py:1343-1392 vs evaluation.py:527-541) with personal
filesystem paths and a leftover API-key field; evaluation silently runs a
different architecture than was trained (SURVEY.md §3.4). Here: a single
serializable dataclass, embedded into every checkpoint and read back at
eval/resume, plus CLI overrides.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

from arsvt_tpu.models.vit import BackboneConfig
from arsvt_tpu.models.heads import DetrHeadConfig
from arsvt_tpu.models.detector import DetectorConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # model
    preset: str = "vit_tiny_16_224"          # models/registry.py key
    task: str = "classify"                   # "classify" | "detect"
    num_classes: int = 6                     # recycling taxonomy
    # data
    data_dir: str = ""                       # COCO-format root ("" = synthetic)
    batch_size: int = 512                    # global batch (train.py:1356 was 32)
    image_size: int = 0                      # 0 = preset default
    canvas: int = 256                        # host letterbox size (static shape)
    augment: str = "none"                    # "none"|"crop_flip"|"randaugment"|"detection"
    # bilinear affine-warp strategy for the on-device augmentation
    # ("" = data/augment.py module default; "taps"|"flat"|"patch"|
    # "shear_matmul" — see _bilinear_warp). Part of the jitted step's
    # static config so A/B runs switch it in-process.
    warp_variant: str = ""
    # optimization (reference: AdamW 1e-4 / wd 1e-4, train.py:1358-1360)
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    grad_clip_norm: float = 1.0
    schedule: str = "cosine"                 # "cosine" | "constant" | "plateau"
    warmup_steps: int = 500
    total_steps: int = 10_000
    min_lr_ratio: float = 1e-3
    # plateau schedule (reference ReduceLROnPlateau, train.py:1363-1367)
    plateau_factor: float = 0.7
    plateau_patience: int = 1
    plateau_min_lr: float = 1e-7
    plateau_threshold: float = 1e-3          # torch rel-mode (train.py:1366)
    # regularisation
    label_smoothing: float = 0.0
    mixup_alpha: float = 0.0                 # 0 = off
    # attention-prob dropout (train.py:528,545). None = inherit the model
    # preset's value; 0.0 = explicitly OFF (overrides a preset's 0.1 — the
    # round-4 ablation harness needs this distinction)
    attn_dropout: float | None = None
    ln_eps: float = 0.0                      # 0 = preset default (torch's 1e-5);
                                             # imported checkpoints carry their
                                             # source's (timm 1e-6, HF 1e-12)
    # distillation (the reference carries these flags, off: train.py:1382-1384;
    # here they actually work — DeiT-style through the DIST head)
    distillation: str = "none"               # "none" | "hard" | "soft"
    distill_teacher: str = ""                # checkpoint dir of teacher classifier
    distill_alpha: float = 0.5               # weight of the distillation term
    distill_temperature: float = 3.0         # soft-distillation temperature
    # precision / parallelism
    bf16: bool = True
    mesh_data: int = -1
    mesh_model: int = 1
    # split the global batch into k microbatches inside one jitted step
    # (lax.scan) — bs512-class recipes at bs512/k activation memory; the
    # reference cannot express large effective batches at all (train/accum.py)
    grad_accum: int = 1
    remat: bool = False                      # jax.checkpoint the encoder blocks
    remat_policy: str = "full"  # "full"|"dots"|"names"|"all_but_mlp"|"mlp_tail"
    # one-pass Pallas AdamW (ops/pallas/fused_adamw.py); state layout and
    # math are identical to the optax chain, checkpoints interoperate
    fused_adamw: bool = False
    # bookkeeping
    seed: int = 0
    log_every: int = 100                     # wandb cadence parity (train.py:1470)
    eval_every: int = 1000
    checkpoint_every: int = 1000
    checkpoint_dir: str = "checkpoints"
    keep_checkpoints: int = 3
    # detection loss weights (train.py:1375-1380)
    w_ce: float = 1.0
    w_bbox: float = 5.0
    w_giou: float = 2.0
    w_triplet: float = 0.6
    background_weight: float = 0.1           # train.py:1215-1217
    triplet_margin: float = 0.3              # train.py:1370
    max_objects: int = 25                    # padded targets per image
    aux_loss: bool = True                    # DETR deep supervision

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True, indent=1)

    @classmethod
    def from_json(cls, s: str) -> "TrainConfig":
        d = json.loads(s)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def with_overrides(self, **kwargs: Any) -> "TrainConfig":
        return dataclasses.replace(self, **kwargs)


def resolve_backbone(cfg: TrainConfig) -> BackboneConfig:
    from arsvt_tpu.models.registry import get_preset

    bb = get_preset(cfg.preset)
    if cfg.image_size and cfg.image_size != bb.image_size:
        bb = dataclasses.replace(bb, image_size=cfg.image_size)
    if cfg.attn_dropout is not None and cfg.attn_dropout != bb.attn_dropout:
        bb = dataclasses.replace(bb, attn_dropout=cfg.attn_dropout)
    if cfg.ln_eps and cfg.ln_eps != bb.ln_eps:
        bb = dataclasses.replace(bb, ln_eps=cfg.ln_eps)
    return bb


def resolve_detector(cfg: TrainConfig) -> DetectorConfig:
    from arsvt_tpu.models.registry import DETECTOR_PRESETS, get_preset

    if cfg.preset in DETECTOR_PRESETS:
        det = DETECTOR_PRESETS[cfg.preset]
    else:
        det = DetectorConfig(
            backbone=get_preset(cfg.preset),
            head=DetrHeadConfig(num_classes=cfg.num_classes),
        )
    if det.head.num_classes != cfg.num_classes:
        det = dataclasses.replace(
            det,
            head=dataclasses.replace(det.head, num_classes=cfg.num_classes),
        )
    if cfg.attn_dropout is not None:
        det = dataclasses.replace(
            det,
            backbone=dataclasses.replace(
                det.backbone, attn_dropout=cfg.attn_dropout
            ),
            head=dataclasses.replace(det.head, attn_dropout=cfg.attn_dropout),
        )
    if cfg.ln_eps:
        det = dataclasses.replace(
            det,
            backbone=dataclasses.replace(det.backbone, ln_eps=cfg.ln_eps),
            head=dataclasses.replace(det.head, ln_eps=cfg.ln_eps),
        )
    return det


def input_canvas(cfg: TrainConfig) -> int:
    """Host-pipeline letterbox size for this config.

    With augment="none" the jitted step applies no crop/resize, so batches
    must arrive at the model's native size; augmented configs letterbox to
    the (larger) augmentation canvas and the step crops/resizes on device.
    The ONE copy of this rule — the train CLI, the eval CLI, and the
    visualizer all derive from it (divergent copies would re-create the
    reference's evaluate-at-the-wrong-size bug class, SURVEY §3.4)."""
    if cfg.augment != "none":
        return cfg.canvas
    if cfg.image_size:
        return cfg.image_size
    if cfg.task == "detect":
        return resolve_detector(cfg).backbone.image_size
    return resolve_backbone(cfg).image_size


# Named train presets mirroring BASELINE.json's config matrix.
TRAIN_PRESETS: dict[str, TrainConfig] = {
    "smoke": TrainConfig(
        preset="vit_test_8_32", batch_size=16, total_steps=30,
        warmup_steps=5, log_every=10, eval_every=10**9,
        checkpoint_every=10**9, bf16=False,
    ),
    "vit_tiny_eval": TrainConfig(preset="vit_tiny_16_224", batch_size=8),
    "vit_base_finetune": TrainConfig(
        preset="vit_base_16_224", batch_size=512, learning_rate=3e-4,
        warmup_steps=500, total_steps=20_000, label_smoothing=0.1,
        augment="crop_flip",  # BASELINE config #2's defining feature
    ),
    "vit_base_bf16_flash": TrainConfig(
        # the bench champion recipe: bs512 as 16 no-remat scan microbatches
        # (988 img/s/chip measured — PERFORMANCE.md round 3)
        preset="vit_base_16_224", batch_size=512, bf16=True, grad_accum=16,
    ),
    "vit_large_384": TrainConfig(
        preset="vit_large_16_384", batch_size=256, mixup_alpha=0.2,
        label_smoothing=0.1, remat=True,
        augment="randaugment", canvas=416,  # BASELINE config #4: RandAugment
    ),
    # the reference's own detector training config (train.py:1345-1392):
    # the albumentations train pipeline (LongestMaxSize(224) → shadow/flip/
    # affine/jitter/dropout/normalize, train.py:387-446) is augment=
    # "detection" on a 224 canvas
    "deit_detector_ref": TrainConfig(
        preset="deit_detector_ref", task="detect", batch_size=32,
        learning_rate=1e-4, weight_decay=1e-4, schedule="plateau",
        max_objects=25, augment="detection", canvas=224,
        # the reference trains with dropout 0.1 *including* attention probs
        # (train.py:545,1352); runs in-kernel on TPU (stateless PRNG mask)
        attn_dropout=0.1,
    ),
}
