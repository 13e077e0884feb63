from sie_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, shard_params, shard_state, params_partition_specs,
)
