from .mesh import make_mesh, items_sharding, replicated_sharding  # noqa: F401
from .distributed import (  # noqa: F401
    sharded_compute_taumode_lambdas,
    distributed_lambda_aware_topk,
    distributed_index_step,
)
