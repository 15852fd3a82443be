from ml_mdm_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    infer_param_sharding,
    replicated,
    shard_batch,
)
