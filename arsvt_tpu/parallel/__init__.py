from arsvt_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    MeshConfig,
    make_mesh,
)
from arsvt_tpu.parallel.sharding import (
    batch_sharding,
    param_sharding_rules,
    replicated,
    shard_batch,
    shard_params,
)
