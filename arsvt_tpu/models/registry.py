"""Named model presets.

Covers BASELINE.json's config matrix (ViT-Tiny/16@224, ViT-B/16@224,
ViT-L/16@384) plus the reference's actually-trained detector config
(DeiT 400d/12L/25H/1600mlp, 5 queries — /root/reference/train.py:1345-1352)
and the eval script's 768-dim ViT detector (evaluation.py:527-534). Presets
are the cure for the reference's train/eval config divergence (SURVEY.md
§3.4): one name → one config, serialized into checkpoints.
"""

from __future__ import annotations

from arsvt_tpu.models.vit import BackboneConfig
from arsvt_tpu.models.heads import DetrHeadConfig
from arsvt_tpu.models.detector import DetectorConfig

PRESETS: dict[str, BackboneConfig] = {
    "vit_tiny_16_224": BackboneConfig(
        image_size=224, patch_size=16, embed_dim=192, depth=12,
        num_heads=3, mlp_dim=768,
    ),
    "vit_small_16_224": BackboneConfig(
        image_size=224, patch_size=16, embed_dim=384, depth=12,
        num_heads=6, mlp_dim=1536,
    ),
    "vit_base_16_224": BackboneConfig(
        image_size=224, patch_size=16, embed_dim=768, depth=12,
        num_heads=12, mlp_dim=3072,
    ),
    "vit_large_16_384": BackboneConfig(
        image_size=384, patch_size=16, embed_dim=1024, depth=24,
        num_heads=16, mlp_dim=4096,
    ),
    # the reference's trained DeiT detector backbone (train.py:1345-1352):
    # 400-dim, 25 heads (head_dim 16), CLS+DIST, dropout 0.1 — INCLUDING
    # the attention-prob dropout (train.py:528,545), which belongs to the
    # model preset itself so `--preset deit_detector_ref` alone is already
    # reference-faithful (the train preset's attn_dropout=0.1 then matches
    # rather than supplies it)
    "deit_ref_400_16_224": BackboneConfig(
        image_size=224, patch_size=16, embed_dim=400, depth=12,
        num_heads=25, mlp_dim=1600, dropout=0.1, attn_dropout=0.1,
        distilled=True,
    ),
    # mid-size demo backbone for the classification-generalization artifact
    # (benchmarks/classification_generalization_demo.py): big enough to
    # learn shape/texture classes, small enough to train in minutes
    "vit_demo_8_96": BackboneConfig(
        image_size=96, patch_size=8, embed_dim=192, depth=6,
        num_heads=3, mlp_dim=768,
    ),
    # tiny configs for tests
    "vit_test_8_32": BackboneConfig(
        image_size=32, patch_size=8, embed_dim=32, depth=2,
        num_heads=2, mlp_dim=64,
    ),
    "deit_test_8_32": BackboneConfig(
        image_size=32, patch_size=8, embed_dim=32, depth=2,
        num_heads=2, mlp_dim=64, distilled=True,
    ),
}

DETECTOR_PRESETS: dict[str, DetectorConfig] = {
    # reference train config: 5 queries, 6-layer decoder, 8 heads, ffn 2048
    "deit_detector_ref": DetectorConfig(
        backbone=PRESETS["deit_ref_400_16_224"],
        # torch's TransformerDecoderLayer passes its dropout to the
        # attention probs too (train.py:701-708), hence attn_dropout=0.1
        head=DetrHeadConfig(num_classes=6, num_queries=5, depth=6,
                            num_heads=8, ffn_dim=2048, dropout=0.1,
                            attn_dropout=0.1),
    ),
    # reference eval-script config: ViT-B backbone, 100 queries
    # (evaluation.py:527-534)
    "vit_base_detector": DetectorConfig(
        backbone=PRESETS["vit_base_16_224"],
        head=DetrHeadConfig(num_classes=6, num_queries=100, depth=6,
                            num_heads=8, ffn_dim=2048),
    ),
    "detector_test": DetectorConfig(
        backbone=PRESETS["deit_test_8_32"],
        head=DetrHeadConfig(num_classes=6, num_queries=5, depth=2,
                            num_heads=2, ffn_dim=64),
    ),
    # mid-size demo detector for the generalization run (val mAP > 0 on
    # synthetic COCO — benchmarks/detection_generalization_demo.py)
    "detector_demo_96": DetectorConfig(
        backbone=BackboneConfig(
            image_size=96, patch_size=8, embed_dim=192, depth=6,
            num_heads=3, mlp_dim=768,
        ),
        head=DetrHeadConfig(num_classes=6, num_queries=10, depth=3,
                            num_heads=4, ffn_dim=512),
    ),
}


def get_preset(name: str) -> BackboneConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name]


def get_detector_preset(name: str) -> DetectorConfig:
    if name not in DETECTOR_PRESETS:
        raise KeyError(
            f"unknown detector preset {name!r}; have {sorted(DETECTOR_PRESETS)}"
        )
    return DETECTOR_PRESETS[name]
