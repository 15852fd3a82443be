from ml_mdm_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_data_mesh_for_batch,
    create_mesh,
    infer_param_sharding,
    make_data_parallel_sampler,
    replicated,
    sample_data_parallel,
    shard_batch,
)
