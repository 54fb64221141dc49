"""Native C++ RRT/collision parity + performance sanity tests."""

import time

import numpy as np
import jax
import pytest

from mpd_tpu.native import NativeRRTConnect, native_available, native_collision_fn
from mpd_tpu.world import PlanningTask, get_env, get_robot
from mpd_tpu.data.datagen.generate import make_host_collision_fn

pytestmark = pytest.mark.skipif(not native_available(), reason="no g++ toolchain")


def test_collision_parity_point_mass():
    env = get_env("EnvDense2D")
    robot = get_robot("RobotPointMass")
    c_native = native_collision_fn(robot, env.objects, margin=0.02)
    c_py = make_host_collision_fn(env, robot, margin=0.02)
    q = np.random.RandomState(0).uniform(-1.1, 1.1, (2000, 2))
    np.testing.assert_array_equal(c_native(q), c_py(q))


def test_collision_parity_panda():
    env = get_env("EnvSpheres3D")
    robot = get_robot("RobotPanda")
    c_native = native_collision_fn(robot, env.objects, margin=0.03)
    c_py = make_host_collision_fn(env, robot, margin=0.03)
    q = np.random.RandomState(1).uniform(
        np.asarray(robot.q_min), np.asarray(robot.q_max), (500, 7)
    )
    a, b = c_native(q), c_py(q)
    # FK float64 in both; identical decisions expected except razor-edge cases
    assert (a != b).mean() < 0.002, f"disagreement {(a != b).mean():.4f}"


def test_native_rrt_finds_valid_path():
    env = get_env("EnvDense2D")
    robot = get_robot("RobotPointMass")
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.02)
    c_py = make_host_collision_fn(env, robot, margin=0.02)
    qs = np.asarray(task.random_coll_free_q(jax.random.PRNGKey(0), n_samples=2))
    planner = NativeRRTConnect(robot, env.objects, margin=0.02, step_size=0.05,
                               max_time=30.0, seed=3)
    path = planner.plan(qs[0], qs[1])
    assert path is not None and len(path) >= 2
    np.testing.assert_allclose(path[0], qs[0], atol=1e-9)
    np.testing.assert_allclose(path[-1], qs[1], atol=1e-9)
    # every densified edge point must be collision-free per the Python oracle
    for a, b in zip(path[:-1], path[1:]):
        pts = a + np.linspace(0, 1, 32)[:, None] * (b - a)
        assert not c_py(pts).any()


def test_native_rrt_panda_speed():
    env = get_env("EnvSpheres3D")
    robot = get_robot("RobotPanda")
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)
    qs = np.asarray(task.random_coll_free_q(jax.random.PRNGKey(1), n_samples=4))
    planner = NativeRRTConnect(robot, env.objects, margin=0.03, step_size=0.15,
                               max_time=20.0, seed=5)
    t0 = time.time()
    path = planner.plan(qs[0], qs[1])
    elapsed = time.time() - t0
    assert path is not None
    assert elapsed < 10.0, f"native 7-DoF RRT took {elapsed:.1f}s"
