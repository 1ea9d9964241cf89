from arsvt_tpu.objectives.classification import (
    softmax_cross_entropy,
    mixup,
    accuracy_top1,
)
