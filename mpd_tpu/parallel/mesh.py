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

These helpers are the placement vocabulary used by the production classes:
`Trainer(mesh=...)` (mpd_tpu/train/trainer.py) runs its scan-fused step
data-parallel, and `MotionPlanner(mesh=...)` (mpd_tpu/planner/inference.py)
shards the candidate axis of the guided query and selects the best plan
on-device via `parallel.global_best_trajectory`.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    # Auto axis type: shardings flow via propagation + with_sharding_constraint
    # (this jax's make_mesh defaults to Explicit, which rejects constraints)
    return jax.make_mesh(
        (len(devices),), (axis_name,), devices=devices,
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    """NamedSharding splitting axis 0 of an ndim-rank array across the mesh."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, x, axis_name: str = "data"):
    """Place a [B, ...] pytree with B sharded across the mesh."""
    return jax.tree.map(
        lambda a: jax.device_put(a, batch_sharding(mesh, a.ndim, axis_name)), x
    )


def replicate(mesh: Mesh, x):
    """Replicate a pytree (e.g. params) on every device of the mesh."""
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), x
    )


def shard_map_batch0(fn, mesh: Mesh, axis_name: str = "data"):
    """Wrap a per-sample-parallel fn ([B, ...] -> [B, ...] same rank) in
    `jax.shard_map` splitting axis 0 across the mesh.

    This is how the Pallas guide megakernels run under a mesh: a pallas_call
    does not partition under GSPMD propagation, but the kernels are
    embarrassingly parallel over the candidate axis, so manual sharding over
    'data' runs one per-device kernel instance on the local candidate shard
    with zero collectives. Leading dims are flattened to one batch axis and
    padded to a device-count multiple inside the traced program (the pad
    rows compute garbage and are sliced off)."""
    from functools import wraps

    import jax.numpy as jnp

    n = mesh.shape[axis_name]

    @wraps(fn)
    def apply(q):
        lead, tail = q.shape[:-2], q.shape[-2:]
        q2 = q.reshape((-1,) + tail)
        B = q2.shape[0]
        Bp = -(-B // n) * n
        if Bp != B:
            q2 = jnp.concatenate(
                [q2, jnp.zeros((Bp - B,) + tail, q2.dtype)], axis=0
            )
        spec = P(axis_name, *([None] * len(tail)))
        out = jax.shard_map(
            fn, mesh=mesh, in_specs=spec, out_specs=spec,
            # pallas_call's out_shape carries no varying-manual-axes info;
            # the kernel touches only its local shard, so rep-checking is
            # vacuously satisfied
            check_vma=False,
        )(q2)
        return out[:B].reshape(lead + tail)

    return apply


def constrain_batch(mesh: Optional[Mesh], x, axis_name: str = "data"):
    """Inside-jit sharding constraint: axis 0 of every leaf split across the
    mesh. No-op when mesh is None, so single-device code paths are untouched."""
    if mesh is None:
        return x
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(
            a, batch_sharding(mesh, a.ndim, axis_name)
        ),
        x,
    )
