from avr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    batch_sharding,
    ray_sharding,
    shard_train_inputs,
)
from avr_tpu.parallel.sharded_step import make_sharded_train_step  # noqa: F401
