"""Cost + guide semantic tests, including an independent float64
rederivation of the guide's clipping/zeroing/sign pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpd_tpu.costs import (
    CostCollision,
    CostComposite,
    CostGPTrajectory,
    GuideTrajectoriesWithVelocity,
    gp_const_vel_trajectory,
)
from mpd_tpu.data.normalization import LimitsNormalizer
from mpd_tpu.world import get_env, get_robot
from mpd_tpu.world.task import interpolate_points


@pytest.fixture(scope="module")
def world():
    env = get_env("EnvSimple2D")
    robot = get_robot("RobotPointMass")
    return env, robot


def test_gp_cost_matches_dense_quadratic(world):
    """GP cost equals the explicit 0.5 r^T Q^{-1} r sum computed in float64."""
    _, robot = world
    H, dt, sg = 8, 0.1, 0.7
    cost = CostGPTrajectory(robot, H, dt, sigma_gp=sg)
    rng = np.random.RandomState(0)
    trajs = rng.randn(3, H, 4).astype(np.float32)
    got = np.asarray(cost(jnp.asarray(trajs)))

    Qi = np.array([[12 / dt**3, -6 / dt**2], [-6 / dt**2, 4 / dt]]) / sg**2
    expected = np.zeros(3)
    for b in range(3):
        for t in range(H - 1):
            for d in range(2):
                q0, q1 = trajs[b, t, d], trajs[b, t + 1, d]
                v0, v1 = trajs[b, t, 2 + d], trajs[b, t + 1, 2 + d]
                r = np.array([q1 - q0 - v0 * dt, v1 - v0], dtype=np.float64)
                expected[b] += 0.5 * r @ Qi @ r
    np.testing.assert_allclose(got, expected, rtol=2e-4)


def test_collision_cost_zero_far_from_obstacles(world):
    env, robot = world
    cost = CostCollision(robot, 8, field=env.objects, cutoff_margin=0.03)
    # corner region is free in EnvSimple2D
    trajs = jnp.full((2, 8, 4), 0.93)
    assert np.allclose(np.asarray(cost(trajs)), 0.0)


def test_collision_cost_positive_inside(world):
    env, robot = world
    cost = CostCollision(robot, 8, field=env.objects, cutoff_margin=0.03)
    trajs = jnp.zeros((1, 8, 4))  # center: inside the r=0.22 obstacle
    assert float(cost(trajs)[0]) > 0


def test_guide_matches_independent_rederivation(world):
    """The guide output must equal:
    -sum_i w_i * zero_ends(clip_norm(d cost_i / d x_phys))
    with clip_norm using ||grad + 1e-6|| over the last dim."""
    env, robot = world
    H = 8
    dt = 5.0 / H
    norm = LimitsNormalizer(
        mins=jnp.asarray([-1.0, -1.0, -2.0, -2.0]),
        maxs=jnp.asarray([1.0, 1.0, 2.0, 2.0]),
    )
    c_coll = CostCollision(robot, H, field=env.objects, cutoff_margin=0.03)
    c_gp = CostGPTrajectory(robot, H, dt, sigma_gp=1.0)
    comp = CostComposite(robot, H, [c_coll, c_gp], weights_cost_l=[1e-2, 1e-7])
    guide = GuideTrajectoriesWithVelocity(
        unnormalize_fn=norm.unnormalize, cost=comp, clip_grad=True,
        interpolate_trajectories_for_collision=True,
        num_interpolated_points_for_collision=16,
    )

    x_norm = jnp.asarray(np.random.RandomState(1).uniform(-0.9, 0.9, (2, H, 4)), jnp.float32)
    got = np.asarray(guide(x_norm))

    # independent rederivation with jax.grad but explicit numpy clipping
    def term(x_phys, c):
        xi = interpolate_points(x_phys, 16)
        return jnp.sum(c(x_phys, xi))

    x_phys = norm.unnormalize(x_norm)
    expected = np.zeros_like(got)
    for c, w in ((c_coll, 1e-2), (c_gp, 1e-7)):
        g = np.asarray(jax.grad(lambda xp: term(xp, c))(x_phys), dtype=np.float64)
        gn = np.linalg.norm(g + 1e-6, axis=-1, keepdims=True)
        g = np.clip(gn, 0.0, 1.0) / gn * g
        g[:, 0, :] = 0.0
        g[:, -1, :] = 0.0
        expected += w * g
    expected = -expected
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-8)


def test_guide_zero_at_endpoints(world):
    env, robot = world
    H = 8
    norm = LimitsNormalizer(mins=jnp.full((4,), -1.0), maxs=jnp.ones((4,)))
    comp = CostComposite(robot, H, [CostCollision(robot, H, field=env.objects)],
                         weights_cost_l=[1.0])
    guide = GuideTrajectoriesWithVelocity(unnormalize_fn=norm.unnormalize, cost=comp)
    out = np.asarray(guide(jnp.zeros((3, H, 4))))
    assert np.all(out[:, 0, :] == 0) and np.all(out[:, -1, :] == 0)


def test_const_vel_trajectory_shape_and_endpoints():
    start = jnp.asarray([0.0, 0.0])
    goal = jnp.asarray([1.0, 2.0])
    tr = gp_const_vel_trajectory(start, goal, 16, dt=0.1)
    assert tr.shape == (16, 4)
    np.testing.assert_allclose(np.asarray(tr[0, :2]), [0, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(tr[-1, :2]), [1, 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr[0, 2:]), 0.0)  # zeroed endpoint vel
    # interior velocity = (goal-start)/((H-1)dt)
    np.testing.assert_allclose(np.asarray(tr[5, 2:]), np.asarray([1.0, 2.0]) / 1.5, rtol=1e-5)


def test_position_only_guide(world):
    from mpd_tpu.costs import GuideTrajectoriesPositionOnly

    env, robot = world
    H = 8
    norm = LimitsNormalizer(mins=jnp.full((2,), -1.0), maxs=jnp.ones((2,)))
    comp = CostComposite(
        robot, H,
        [CostCollision(robot, H, field=env.objects, cutoff_margin=0.03),
         CostGPTrajectory(robot, H, 5.0 / H)],
        weights_cost_l=[1e-2, 1e-7],
    )
    guide = GuideTrajectoriesPositionOnly(
        unnormalize_fn=norm.unnormalize, cost=comp, clip_grad=True,
        interpolate_trajectories_for_collision=True,
        num_interpolated_points_for_collision=16, dt=5.0 / H,
    )
    x = jnp.asarray(np.random.RandomState(0).uniform(-0.9, 0.9, (3, H, 2)), jnp.float32)
    out = jax.jit(guide.__call__)(x)
    assert out.shape == (3, H, 2)
    assert np.isfinite(np.asarray(out)).all()
    assert np.all(np.asarray(out[:, 0]) == 0) and np.all(np.asarray(out[:, -1]) == 0)


def test_gp_analytic_gradient_matches_autodiff(world):
    _, robot = world
    H, dt = 12, 0.08
    cost = CostGPTrajectory(robot, H, dt, sigma_gp=0.6)
    x = jnp.asarray(np.random.RandomState(2).randn(3, H, 4), jnp.float32)
    g_auto = jax.grad(lambda xx: jnp.sum(cost(xx)))(x)
    g_analytic = cost.gradient(x)
    np.testing.assert_allclose(np.asarray(g_analytic), np.asarray(g_auto),
                               rtol=1e-4, atol=1e-4)


def test_position_only_guide_never_builds_fused_kernels(world):
    """The fused collision kernels differentiate w.r.t. the full [q, dq]
    state; position-only guidance flows its gradient through the
    finite-difference velocity reconstruction, which the kernels do not
    model — the knob must silently stay on the jax.grad path."""
    from mpd_tpu.costs import GuideTrajectoriesPositionOnly

    env, robot = world
    H = 8
    norm = LimitsNormalizer(mins=jnp.full((2,), -1.0), maxs=jnp.ones((2,)))
    comp = CostComposite(
        robot, H,
        [CostCollision(robot, H, field=env.objects, cutoff_margin=0.03)],
        weights_cost_l=[1e-2],
    )
    guide = GuideTrajectoriesPositionOnly(
        unnormalize_fn=norm.unnormalize, cost=comp,
        interpolate_trajectories_for_collision=True,
        num_interpolated_points_for_collision=16, dt=5.0 / H,
        fused_collision="interpret",  # would force the kernel if honored
    )
    assert guide._fused_grads == {}


def test_fused_on_forces_past_min_batch_gate(world):
    """fused_collision='on'/'interpret' must force the kernel below its
    measured B=128 crossover (the A/B-forcing contract); 'auto' keeps the
    gate. Verified structurally via the builder's min_batch plumbing."""
    env, robot = world
    term = CostCollision(robot, 8, field=env.objects, cutoff_margin=0.03)
    forced = term.make_fused_interp_gradient(16, interpret=True, min_batch=1)
    gated = term.make_fused_interp_gradient(16, interpret=True, min_batch=None)
    if forced is None:
        pytest.skip("kernel outside coverage on this backend")
    x = jnp.asarray(
        np.random.RandomState(0).uniform(-0.9, 0.9, (2, 8, 4)), jnp.float32
    )
    g_forced = np.asarray(forced(x))
    g_gated = np.asarray(gated(x))  # B=2 < 128: autodiff fallback
    assert np.isfinite(g_forced).all()
    # both paths compute the same gradient (parity), so forcing is only
    # observable structurally — but it must at least agree numerically
    np.testing.assert_allclose(g_forced, g_gated, rtol=1e-4, atol=1e-5)
