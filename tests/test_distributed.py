"""Distributed-helpers tests on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from mpd_tpu.parallel import (
    global_best_trajectory,
    make_mesh,
    shard_batch,
    shard_contexts,
)


def test_shard_contexts_partition():
    ranges = [shard_contexts(500, process_id=p, num_processes=8) for p in range(8)]
    all_ids = sorted(i for r in ranges for i in r)
    assert all_ids == list(range(500))
    # contiguous, disjoint
    for r in ranges:
        assert list(r) == list(range(r.start, r.stop))


def test_global_best_trajectory_sharded_matches_host():
    mesh = make_mesh(8)
    B, H, D = 32, 8, 4
    rng = np.random.RandomState(0)
    trajs = jnp.asarray(rng.randn(B, H, D), jnp.float32)
    costs = jnp.asarray(rng.rand(B), jnp.float32)
    costs = costs.at[17].set(0.001)  # known winner

    fn = jax.jit(global_best_trajectory)
    t_host, c_host, i_host = fn(trajs, costs)
    sharded = shard_batch(mesh, {"t": trajs, "c": costs})
    t_sh, c_sh, i_sh = fn(sharded["t"], sharded["c"])
    assert int(i_host) == int(i_sh) == 17
    np.testing.assert_allclose(np.asarray(t_host), np.asarray(t_sh), atol=0)
    assert float(c_host) == float(c_sh)


def test_masked_best_with_infeasible_candidates():
    trajs = jnp.zeros((4, 8, 2))
    costs = jnp.asarray([jnp.inf, 2.0, jnp.inf, 3.0])
    _, c, i = global_best_trajectory(trajs, costs)
    assert int(i) == 1 and float(c) == 2.0
