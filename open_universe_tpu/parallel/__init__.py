from .mesh import make_mesh, default_mesh
from .sharding import batch_sharding, replicated, shard_batch, make_parallel_train_step
