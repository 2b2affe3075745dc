from .mesh import make_mesh, shard_batched_data  # noqa: F401
from .sharded import make_sharded_solver  # noqa: F401
