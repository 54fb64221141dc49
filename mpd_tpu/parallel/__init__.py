from mpd_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    sharded_train_step,
    sharded_sampler,
)
