from avr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    batch_sharding,
    ray_sharding,
    shard_train_inputs,
)
from avr_tpu.parallel.sharded_step import (  # noqa: F401
    make_sharded_train_step,
    make_shardmap_train_step,
)
