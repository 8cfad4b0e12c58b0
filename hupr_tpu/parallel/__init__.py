from hupr_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate_state,
    batch_sharding,
)
