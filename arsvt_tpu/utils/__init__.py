from arsvt_tpu.utils.logging import MetricLogger
