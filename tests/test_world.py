"""World-model tests: analytic SDF values, env registry, Panda FK sanity,
task validity/metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpd_tpu.world import (
    get_env,
    get_robot,
    PlanningTask,
)
from mpd_tpu.world.primitives import (
    make_object_set,
    sdf_object_set,
    sdf_object_set_np,
)
from mpd_tpu.world.task import interpolate_points, compute_path_length, compute_smoothness


def test_sdf_sphere_analytic():
    objs = make_object_set(spheres=[((0.0, 0.0), 0.5)], ws_dim=2)
    pts = jnp.asarray([[1.0, 0.0], [0.0, 0.0], [0.5, 0.0], [3.0, 4.0]])
    d = sdf_object_set(pts, objs)
    np.testing.assert_allclose(np.asarray(d), [0.5, -0.5, 0.0, 4.5], atol=1e-6)


def test_sdf_box_analytic():
    objs = make_object_set(boxes=[((0.0, 0.0), (1.0, 0.5))], ws_dim=2)
    pts = jnp.asarray([[2.0, 0.0], [0.0, 0.0], [0.0, 1.5], [2.0, 1.5]])
    d = sdf_object_set(pts, objs)
    expected = [1.0, -0.5, 1.0, np.sqrt(1.0 + 1.0)]
    np.testing.assert_allclose(np.asarray(d), expected, atol=1e-6)


def test_sdf_min_over_mixed_objects_and_numpy_mirror():
    objs = make_object_set(
        spheres=[((0.5, 0.5), 0.1)], boxes=[((-0.5, -0.5), (0.1, 0.1))], ws_dim=2
    )
    pts = np.random.RandomState(0).uniform(-1, 1, size=(64, 2)).astype(np.float32)
    d_jax = np.asarray(sdf_object_set(jnp.asarray(pts), objs))
    d_np = sdf_object_set_np(pts, objs)
    np.testing.assert_allclose(d_jax, d_np, atol=1e-5)


def test_env_registry_and_extra_objects():
    env = get_env("EnvDense2D")
    env_extra = get_env("EnvDense2DExtraObjects")
    assert env_extra.objects.n_objects > env.objects.n_objects
    assert env.ws_dim == 2
    env3d = get_env("EnvSpheres3D")
    assert env3d.ws_dim == 3


def test_panda_fk_known_poses():
    robot = get_robot("RobotPanda")
    q_zero = jnp.zeros(7)
    origins = robot.frame_origins(q_zero)
    assert origins.shape == (9, 3)
    # base at origin; frame1 at z=0.333
    np.testing.assert_allclose(np.asarray(origins[0]), [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(origins[1]), [0, 0, 0.333], atol=1e-6)
    # At q=0 the Panda flange sits at x = a4+a7 offsets pattern; verify the
    # closed-form height: d1 + d3 + d5 = 0.333+0.316+0.384 = 1.033 plus the
    # flange d=0.107 pointing DOWN via the alpha chain at q=0.
    ee = np.asarray(origins[-1])
    # independent closed-form from the same public DH spec, computed by
    # composing the 8 transforms in float64 numpy
    import numpy as onp

    def dh_T(a, d, alpha, theta):
        ct, st = onp.cos(theta), onp.sin(theta)
        ca, sa = onp.cos(alpha), onp.sin(alpha)
        return onp.array(
            [
                [ct, -st, 0, a],
                [st * ca, ct * ca, -sa, -d * sa],
                [st * sa, ct * sa, ca, d * ca],
                [0, 0, 0, 1],
            ]
        )

    params = [
        (0, 0.333, 0),
        (0, 0, -onp.pi / 2),
        (0, 0.316, onp.pi / 2),
        (0.0825, 0, onp.pi / 2),
        (-0.0825, 0.384, -onp.pi / 2),
        (0, 0, onp.pi / 2),
        (0.088, 0, onp.pi / 2),
        (0, 0.107, 0),
    ]
    T = onp.eye(4)
    for i, (a, d, alpha) in enumerate(params):
        T = T @ dh_T(a, d, alpha, 0.0)
    np.testing.assert_allclose(ee, T[:3, 3], atol=1e-5)


def test_panda_fk_batched_and_differentiable():
    robot = get_robot("RobotPanda")
    q = jax.random.uniform(jax.random.PRNGKey(0), (5, 7), minval=-1.0, maxval=1.0)
    centers = robot.collision_sphere_positions(q)
    assert centers.shape == (5, 15, 3)
    # numpy mirror agrees
    centers_np = robot.collision_sphere_positions(np.asarray(q), xp=np)
    np.testing.assert_allclose(np.asarray(centers), centers_np, atol=1e-5)
    # differentiable
    g = jax.grad(lambda qq: jnp.sum(robot.collision_sphere_positions(qq)))(q)
    assert g.shape == q.shape
    assert np.all(np.isfinite(np.asarray(g)))


def test_interpolate_points_endpoints_and_midpoint():
    x = jnp.asarray([[[0.0, 0.0], [1.0, 2.0]]])  # [1, 2, 2]
    xi = interpolate_points(x, 5)
    assert xi.shape == (1, 5, 2)
    np.testing.assert_allclose(np.asarray(xi[0, 0]), [0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(xi[0, -1]), [1, 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(xi[0, 2]), [0.5, 1.0], atol=1e-6)


def test_task_validity_and_metrics():
    env = get_env("EnvSimple2D")
    robot = get_robot("RobotPointMass")
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.02)

    # point inside the central obstacle (circle r=0.22 at origin) collides
    assert bool(task.config_in_collision(jnp.asarray([0.0, 0.0])))
    assert not bool(task.config_in_collision(jnp.asarray([0.9, 0.9])))
    # out of limits
    assert bool(task.config_in_collision(jnp.asarray([1.5, 0.0])))

    q_free = task.random_coll_free_q(jax.random.PRNGKey(0), n_samples=4)
    assert q_free.shape == (4, 2)
    assert not np.any(np.asarray(task.config_in_collision(q_free)))

    # straight trajectory through the central obstacle: in collision
    H = 16
    line = jnp.linspace(jnp.asarray([-0.9, -0.9]), jnp.asarray([0.9, 0.9]), H)
    traj = jnp.concatenate([line, jnp.zeros_like(line)], axis=-1)[None]
    assert float(task.compute_fraction_free_trajs(traj)) == 0.0
    assert int(task.compute_success_free_trajs(traj)) == 0
    assert float(task.compute_collision_intensity_trajs(traj)) > 0.0

    # trajectory hugging the free border: collision-free
    edge = jnp.stack([jnp.linspace(-0.9, 0.9, H), jnp.full((H,), -0.92)], axis=-1)
    traj2 = jnp.concatenate([edge, jnp.zeros_like(edge)], axis=-1)[None]
    assert float(task.compute_fraction_free_trajs(traj2)) == 1.0

    pl = compute_path_length(traj2, robot)
    np.testing.assert_allclose(np.asarray(pl), [1.8], atol=1e-5)


def test_panda_sphere_density_option():
    """RobotPanda(n_spheres_per_segment=3): 22 spheres, centers on the
    segment chords at fractions (i+0.5)/3, custom VJP matches autodiff."""
    from mpd_tpu.world.robots import (
        RobotPanda,
        _panda_centers_from_origins,
        _panda_frame_origins,
    )

    robot = RobotPanda(n_spheres_per_segment=3)
    assert robot.segment_fractions == (0.5 / 3, 1.5 / 3, 2.5 / 3)
    assert robot.collision_sphere_radii.shape == (22,)

    q = jax.random.uniform(jax.random.PRNGKey(0), (4, 7),
                           minval=robot.q_min, maxval=robot.q_max)
    c_fast = robot.collision_sphere_positions(q)
    assert c_fast.shape == (4, 22, 3)
    c_ref = _panda_centers_from_origins(
        _panda_frame_origins(q, jnp), jnp, robot.segment_fractions
    )
    np.testing.assert_allclose(np.asarray(c_fast), np.asarray(c_ref), atol=1e-6)
    # numpy path agrees too
    c_np = robot.collision_sphere_positions(np.asarray(q), xp=np)
    np.testing.assert_allclose(np.asarray(c_fast), c_np, atol=1e-5)

    w = jax.random.normal(jax.random.PRNGKey(1), c_ref.shape)
    g_fast = jax.grad(
        lambda qq: jnp.sum(jnp.sin(robot.collision_sphere_positions(qq)) * w)
    )(q)
    g_auto = jax.grad(
        lambda qq: jnp.sum(jnp.sin(_panda_centers_from_origins(
            _panda_frame_origins(qq, jnp), jnp, robot.segment_fractions)) * w)
    )(q)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_auto),
                               rtol=1e-4, atol=1e-6)


def test_panda_analytic_jacobian_matches_autodiff():
    """The custom-VJP fast path (revolute-joint rule z_i x (c - o_i)) must
    reproduce autodiff through the FK chain."""
    from mpd_tpu.world.robots import (
        RobotPanda,
        _panda_centers_from_origins,
        _panda_frame_origins,
        panda_sphere_positions_fast,
    )

    robot = RobotPanda()
    q = jax.random.uniform(jax.random.PRNGKey(0), (5, 7),
                           minval=robot.q_min, maxval=robot.q_max)
    c_fast = panda_sphere_positions_fast(q)
    c_ref = _panda_centers_from_origins(_panda_frame_origins(q, jnp))
    np.testing.assert_allclose(np.asarray(c_fast), np.asarray(c_ref), atol=1e-6)

    w = jax.random.normal(jax.random.PRNGKey(1), c_ref.shape)
    g_fast = jax.grad(lambda qq: jnp.sum(jnp.sin(panda_sphere_positions_fast(qq)) * w))(q)
    g_auto = jax.grad(
        lambda qq: jnp.sum(jnp.sin(_panda_centers_from_origins(_panda_frame_origins(qq, jnp))) * w)
    )(q)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_auto), rtol=1e-4, atol=1e-6)
