from arsvt_tpu.data.taxonomy import RECYCLING_CLASSES, class_name, class_index
from arsvt_tpu.data.synthetic import (
    synthetic_classification_batches,
    make_synthetic_coco,
)
