from mpd_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    shard_batch,
    replicate,
    constrain_batch,
)
from mpd_tpu.parallel.distributed import (
    initialize,
    shard_contexts,
    all_reduce_metrics,
    global_best_trajectory,
)
