from vlm_fo1_tpu.parallel.multihost import (  # noqa: F401
    create_hybrid_mesh,
    initialize_distributed,
)
from vlm_fo1_tpu.parallel.sharding import (  # noqa: F401
    create_mesh,
    param_shardings,
    shard_params,
)
