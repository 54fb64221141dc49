"""End-to-end planner tests on tiny shapes (both state conventions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpd_tpu.data import TrajectoryDataset
from mpd_tpu.diffusion import make_schedule
from mpd_tpu.nets.temporal_unet import TemporalUnet
from mpd_tpu.planner import MotionPlanner, PlannerConfig


def _toy_trajs(n=24, H=16):
    rng = np.random.RandomState(0)
    u = np.linspace(0, 1, H)[None, :, None]
    a = rng.uniform(-0.9, -0.5, (n, 1, 2))
    b = rng.uniform(0.5, 0.9, (n, 1, 2))
    pos = a * (1 - u) + b * u
    vel = np.gradient(pos, 5.0 / H, axis=1)
    return np.concatenate([pos, vel], axis=-1).astype(np.float32)


@pytest.mark.parametrize("include_velocity", [True, False])
def test_planner_runs_both_state_conventions(include_velocity):
    ds = TrajectoryDataset(
        base_dir="unused",
        trajectories=_toy_trajs(),
        env_id="EnvSimple2D",
        robot_id="RobotPointMass",
        include_velocity=include_velocity,
    )
    D = ds.state_dim
    assert D == (4 if include_velocity else 2)
    net = TemporalUnet(state_dim=D, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, D)), jnp.zeros((2,), jnp.int32))
    planner = MotionPlanner(
        ds, make_schedule("exponential", 25),
        lambda x, t: net.apply(params, x, t),
        PlannerConfig(n_samples=4),
    )
    tr0 = np.asarray(ds.trajs[0])
    res = planner.plan(jax.random.PRNGKey(1), jnp.asarray(tr0[0, :2]), jnp.asarray(tr0[-1, :2]))
    assert res.trajs_final.shape == (4, 16, D)
    assert np.isfinite(res.trajs_final).all()


def test_planner_ddim_variant():
    ds = TrajectoryDataset(
        base_dir="unused",
        trajectories=_toy_trajs(),
        env_id="EnvSimple2D",
        robot_id="RobotPointMass",
        include_velocity=True,
    )
    net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 4)), jnp.zeros((2,), jnp.int32))
    planner = MotionPlanner(
        ds, make_schedule("exponential", 25),
        lambda x, t: net.apply(params, x, t),
        PlannerConfig(n_samples=4, use_ddim=True),
    )
    tr0 = np.asarray(ds.trajs[0])
    res = planner.plan(jax.random.PRNGKey(1), jnp.asarray(tr0[0, :2]), jnp.asarray(tr0[-1, :2]))
    assert np.isfinite(res.trajs_final).all()


def test_guide_weight_sweep_shares_one_compile():
    """Guide weights are traced arguments of the compiled query: changing
    w_coll must change the result WITHOUT a recompile (weight sweeps /
    per-task tuning, ref README.md:84-88, reuse one program)."""
    ds = TrajectoryDataset(
        base_dir="unused",
        trajectories=_toy_trajs(),
        env_id="EnvSimple2D",
        robot_id="RobotPointMass",
        include_velocity=True,
    )
    net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 4)), jnp.zeros((2,), jnp.int32))
    planner = MotionPlanner(
        ds, make_schedule("exponential", 25),
        lambda p, x, t: net.apply(p, x, t),
        PlannerConfig(n_samples=4), params=params,
    )
    tr0 = np.asarray(ds.trajs[0])
    start, goal = jnp.asarray(tr0[0, :2]), jnp.asarray(tr0[-1, :2])

    r1 = planner.plan(jax.random.PRNGKey(1), start, goal)
    n_compiles = planner._query._cache_size()
    r2 = planner.plan(jax.random.PRNGKey(1), start, goal, guide_weights=[5e-2, 1e-7])
    r3 = planner.plan(jax.random.PRNGKey(1), start, goal, guide_weights=[0.0, 0.0])

    assert planner._query._cache_size() == n_compiles  # no retrace
    assert not np.allclose(r1.trajs_final, r2.trajs_final)
    # zero weights == unguided prior chain: guide contributes nothing
    r_prior = MotionPlanner(
        ds, make_schedule("exponential", 25),
        lambda p, x, t: net.apply(p, x, t),
        PlannerConfig(n_samples=4, planner_alg="diffusion_prior"), params=params,
    ).plan(jax.random.PRNGKey(1), start, goal)
    np.testing.assert_allclose(r3.trajs_final, r_prior.trajs_final, rtol=1e-4, atol=1e-5)
