from otter_tpu.parallel.mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    TENSOR_AXIS,
    batch_sharding,
    create_mesh,
    local_mesh_for_testing,
    shard_batch,
)
