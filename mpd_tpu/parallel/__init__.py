from mpd_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    sharded_train_step,
    sharded_sampler,
)
from mpd_tpu.parallel.distributed import (
    initialize,
    shard_contexts,
    all_reduce_metrics,
    global_best_trajectory,
)
