from arsvt_tpu.evaluation.classify import (
    evaluate_classifier,
    StreamingClassifier,
)
