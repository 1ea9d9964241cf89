from arsvt_tpu.core.dtypes import Policy, DEFAULT_POLICY, FP32_POLICY
from arsvt_tpu.core.prng import KeySeq, fold_host
