"""Multi-host orchestration: initialization, context sharding, metric psums.

The reference's only multi-machine mechanism is SLURM job fan-out with the
filesystem as the communication channel (SURVEY sections 2.3, 5.8). The
TPU-native equivalents:

- `initialize()` — `jax.distributed.initialize` per host; the global mesh
  then spans ICI within a slice and DCN across hosts.
- `shard_contexts()` — datagen work division: each host owns a contiguous
  shard of context ids (contexts are independent; the dataset loader
  ignores missing dirs, so partial results compose exactly like the
  reference's per-context SLURM jobs).
- `all_reduce_metrics()` — cross-host mean of a host-local scalar pytree
  (one process_allgather over DCN; identity mean single-process).
- `global_best_trajectory()` — the cross-device argmin + gather that ends a
  sharded planning query: each device scores its candidate shard, the
  globally best plan is selected with one small collective.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op for single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_contexts(
    n_contexts: int,
    process_id: Optional[int] = None,
    num_processes: Optional[int] = None,
) -> range:
    """The contiguous range of datagen context ids this host owns."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    per = -(-n_contexts // n)  # ceil
    return range(pid * per, min((pid + 1) * per, n_contexts))


def all_reduce_metrics(metrics: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    """Mean-reduce host-local scalar metrics across every process.

    Each host computes metrics over its own shard of the work (e.g. its
    datagen contexts or eval queries); the cross-host mean rides one
    `process_allgather` per call — DCN traffic is num_processes scalars per
    metric. Single-process it degenerates to the identity mean, so callers
    need no host-count branch.
    """
    if jax.process_count() == 1:
        return {k: float(jnp.mean(jnp.asarray(v))) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        {k: jnp.mean(jnp.asarray(v)) for k, v in metrics.items()}
    )
    return {k: float(np.mean(v)) for k, v in gathered.items()}


def global_best_trajectory(
    trajs: jnp.ndarray,  # [B, H, D], candidate axis possibly sharded
    costs: jnp.ndarray,  # [B], +inf for invalid candidates
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(best_traj [H, D], best_cost, best_index) via on-device argmin.

    Under a sharded candidate axis XLA lowers this to one all-reduce of
    (cost, index) pairs plus a reduce of the one-hot-selected row — the only
    cross-device communication a planning query needs. (A dynamic-slice
    gather on the sharded axis is not supported; the one-hot contraction
    is, and is equally cheap at these sizes.)
    """
    idx = jnp.argmin(costs)
    onehot = (jnp.arange(costs.shape[0]) == idx).astype(trajs.dtype)
    best = jnp.einsum("b,bhd->hd", onehot, trajs)
    return best, jnp.min(costs), idx
