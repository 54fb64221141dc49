"""Device-mesh scale-out: shard the candidate/sample batch, replicate params.

The reference has no distributed execution at all (SURVEY section 2.3); the
TPU-native scale-out axis for MPD is the *sample batch*: candidate
trajectories are embarrassingly parallel through the eps-model, the guide and
hard conditioning, with cross-device communication only for (a) gradient
psum in data-parallel training (inserted automatically by XLA from the
shardings) and (b) final metric reductions / global best-plan argmin.

The model is ~1-4 M params -> replicate params, shard batch (no TP/PP/SP
needed; that is a property of the workload, not a shortcut). The mesh is 1-D
('data',) over ICI; multi-host extends the same axis over DCN via
jax.distributed.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (axis_name,), devices=devices)


def shard_batch(mesh: Mesh, x, axis_name: str = "data"):
    """Place a [B, ...] pytree with B sharded across the mesh."""
    def _shard(a):
        spec = P(axis_name, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(_shard, x)


def replicate(mesh: Mesh, x):
    """Replicate a pytree (e.g. params) on every device of the mesh."""
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), x
    )


def sharded_train_step(train_step_fn, mesh: Mesh, axis_name: str = "data"):
    """Wrap a per-batch train step for data-parallel execution.

    train_step_fn(state, key) gathers its batch internally from on-device
    data; for DP we instead take the batch explicitly:
    fn(state, batch, key) -> (state, loss). Shardings: state replicated,
    batch split on axis 0; XLA inserts the grad psum.
    """
    batch_sharding = NamedSharding(mesh, P(axis_name, None, None))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        train_step_fn,
        in_shardings=(repl, batch_sharding, repl),
        out_shardings=(repl, repl),
    )


def sharded_sampler(sample_fn, mesh: Mesh, axis_name: str = "data"):
    """Wrap a sampling query fn(key, hard_conds)->outputs for batch sharding.

    hard_conds values are [B, D] (one row per candidate); the candidate axis
    is sharded across the mesh, the PRNG key replicated. Call the wrapper
    with hard_conds already placed via `shard_batch` — jit then propagates
    the shardings through the whole chain, keeping every candidate's denoise
    and guide computation device-local.
    """
    del mesh, axis_name  # shardings propagate from the placed operands
    return jax.jit(sample_fn)
