from vlm_fo1_tpu.parallel.sharding import (  # noqa: F401
    create_mesh,
    param_shardings,
    shard_params,
)
