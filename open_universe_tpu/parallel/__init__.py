from .mesh import make_mesh, default_mesh
from .sharding import (
    batch_sharding,
    make_parallel_train_step,
    param_sharding_rules,
    replicated,
    shard_batch,
)
