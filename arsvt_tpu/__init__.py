"""arsvt_tpu — TPU-native vision-transformer framework for recycling-waste sorting.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of
``akavkl/Automated-Recycling-Sorter-with-Vision-Transformers`` (reference at
``/root/reference``, surveyed in ``SURVEY.md``): a COCO-format data layer with
fused on-device preprocessing, ViT / DeiT backbones built on Pallas TPU kernels,
a 6-class recycling classification head and a DETR-style detection head with
device-side Hungarian matching, a single jitted bf16 train step that is
data-parallel over an ICI device mesh, orbax checkpointing with config-bound
resume, and evaluation / streaming-inference / benchmark harnesses.

Package layout (SURVEY.md §7):
    core/        dtype policy, PRNG helpers
    parallel/    device mesh, sharding rules, collectives (the "comm backend")
    ops/         compute ops: pure-jnp references + Pallas TPU kernels
    models/      ViT & DeiT backbones, classifier / DETR heads, presets
    objectives/  Hungarian matcher, GIoU, detection + triplet + CE losses
    data/        COCO reader, taxonomy, on-device augmentation, host pipeline
    train/       config, optimizer, jitted train/eval steps, trainer, checkpoints
    evaluation/  top-1 / confusion matrix / mAP, post-processing, streaming path
    utils/       metric logging (JSONL; wandb-gated), misc
"""

__version__ = "0.1.0"
