from arsvt_tpu.models.vit import (
    BackboneConfig,
    init_backbone,
    apply_backbone,
)
from arsvt_tpu.models.heads import (
    ClassifierConfig,
    init_classifier,
    apply_classifier,
    DetrHeadConfig,
    init_detr_head,
    apply_detr_head,
)
from arsvt_tpu.models.classifier import (
    init_image_classifier,
    apply_image_classifier,
)
from arsvt_tpu.models.detector import (
    DetectorConfig,
    init_detector,
    apply_detector,
)
from arsvt_tpu.models.registry import PRESETS, get_preset
