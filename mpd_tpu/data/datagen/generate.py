"""Per-context expert-trajectory generation: RRT-Connect seeds + GPMP2 smoothing.

Counterpart of the reference's data-generation pipeline
(reference: scripts/generate_data/generate_trajectories.py:20-169):
rejection-sample a start/goal pair, run RRT-Connect for seed paths, smooth
all seeds simultaneously with batched GPMP2, split collision/free, save
trajs-free.npy / trajs-collision.npy + args.yaml/metadata.yaml (the config
round-trip contract the dataset loader reads, SURVEY section 5.6).
Contexts are independent — shard them across hosts/processes by context id
(the reference used one SLURM job per context).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import yaml

from mpd_tpu.data.datagen.gpmp2 import GPMP2
from mpd_tpu.data.datagen.rrt_connect import RRTConnect, resample_path
from mpd_tpu.world.envs import get_env
from mpd_tpu.world.primitives import sdf_object_set_np
from mpd_tpu.world.robots import get_robot
from mpd_tpu.world.task import PlanningTask


_GPMP2_CACHE = {}


def make_host_collision_fn(env, robot, margin: float):
    """NumPy q [N, dof] -> in-collision bool [N] for the host-side RRT."""
    radii = np.asarray(robot.collision_sphere_radii, dtype=np.float64)
    q_min = np.asarray(robot.q_min, dtype=np.float64)
    q_max = np.asarray(robot.q_max, dtype=np.float64)

    def collision_fn(q: np.ndarray) -> np.ndarray:
        centers = robot.collision_sphere_positions(q, xp=np)  # [N, S, ws]
        d = sdf_object_set_np(centers, env.objects) - radii
        in_obs = np.min(d, axis=-1) <= margin
        oob = np.any((q < q_min) | (q > q_max), axis=-1)
        return in_obs | oob

    return collision_fn


def seeds_from_paths(paths, H: int, dt: float) -> np.ndarray:
    """Resample RRT paths to H support points and attach finite-difference
    velocities (zeroed at the endpoints). Returns [B, H, 2q]."""
    out = []
    for path in paths:
        pos = resample_path(np.asarray(path), H)  # [H, q]
        vel = np.gradient(pos, dt, axis=0)
        vel[0] = 0.0
        vel[-1] = 0.0
        out.append(np.concatenate([pos, vel], axis=-1))
    return np.stack(out, axis=0)


def generate_context(
    env_id: str,
    robot_id: str,
    seed: int,
    results_dir: Optional[str] = None,
    num_trajectories: int = 20,
    n_support_points: int = 64,
    duration: float = 5.0,
    threshold_start_goal_pos: float = 1.0,
    obstacle_cutoff_margin: float = 0.02,
    rrt_max_time: float = 120.0,
    gpmp_opt_iters: int = 300,
    max_workers: int = -1,
    debug: bool = False,
) -> Dict:
    """Generate one context's worth of expert trajectories.

    Defaults mirror the reference script's knobs
    (generate_trajectories.py:26-33, 182-190).
    """
    env = get_env(env_id)
    robot = get_robot(robot_id)
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=obstacle_cutoff_margin)
    dt = duration / n_support_points

    collision_fn = make_host_collision_fn(env, robot, margin=obstacle_cutoff_margin)

    # ---- rejection-sample start/goal (ref generate_trajectories.py:53-65)
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    start, goal = None, None
    for _ in range(1000):
        key, sub = jax.random.split(key)
        qs = np.asarray(task.random_coll_free_q(sub, n_samples=2))
        if np.linalg.norm(qs[0] - qs[1]) > threshold_start_goal_pos:
            start, goal = qs[0], qs[1]
            break
    if start is None:
        raise ValueError("could not sample a valid start/goal pair")

    # ---- RRT-Connect seeds (ref :71-89); native C++ planner when available.
    # Seed fan-out runs on a thread pool (ref MultiSampleBasedPlanner
    # max_processes=-1, generate_trajectories.py:84-89): the C++ planner's
    # ctypes call releases the GIL, so threads give real core-parallelism
    # without the reference's fork/pickle overhead. max_workers=-1 -> one
    # thread per seed (capped at cpu count); 1 -> sequential.
    rrt_params = env.get_rrt_connect_params(robot)
    rrt_params["max_time"] = rrt_max_time
    from mpd_tpu.native import NativeRRTConnect, native_available

    def _plan_seed(i: int):
        if native_available():
            planner = NativeRRTConnect(
                robot,
                env.objects,
                margin=obstacle_cutoff_margin,
                step_size=rrt_params["step_size"],
                n_iters=rrt_params["n_iters"],
                max_time=rrt_params["max_time"],
                seed=seed * 1000 + i,
            )
        else:
            planner = RRTConnect(
                collision_fn,
                np.asarray(robot.q_min),
                np.asarray(robot.q_max),
                step_size=rrt_params["step_size"],
                n_iters=rrt_params["n_iters"],
                max_time=rrt_params["max_time"],
                seed=seed * 1000 + i,
            )
        return planner.plan(start, goal)

    if max_workers in (0, 1):  # 0 and 1 both mean "no parallelism"
        results = [_plan_seed(i) for i in range(num_trajectories)]
    else:
        n_workers = (
            min(num_trajectories, os.cpu_count() or 1)
            if max_workers < 0
            else max_workers
        )
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=n_workers) as pool:
            results = list(pool.map(_plan_seed, range(num_trajectories)))
    paths = [p for p in results if p is not None]
    if not paths:
        raise RuntimeError("RRT-Connect found no path for this context")

    # ---- batched GPMP2 smoothing (ref :92-119). Pad the seed batch to a
    # fixed size by cycling found paths: one static [num_trajectories, H, 2q]
    # shape means GPMP2 compiles once across all contexts (the duplicated
    # seeds diversify through the obstacle gradients anyway).
    n_found = len(paths)
    while len(paths) < num_trajectories:
        paths.append(paths[len(paths) % n_found])
    theta0 = seeds_from_paths(paths, n_support_points, dt)
    gpmp_params = env.get_gpmp2_params(robot)
    gpmp_params["opt_iters"] = gpmp_opt_iters
    # cache the GPMP2 instance (and its jitted optimizer) across contexts of
    # the same task — with padded seed batches this compiles exactly once
    cache_key = (env_id, robot_id, n_support_points, round(dt, 9),
                 tuple(sorted(gpmp_params.items())), obstacle_cutoff_margin)
    gpmp = _GPMP2_CACHE.get(cache_key)
    if gpmp is None:
        gpmp = GPMP2(robot, task, n_support_points=n_support_points, dt=dt, **gpmp_params)
        _GPMP2_CACHE[cache_key] = gpmp
    trajs = np.asarray(gpmp.optimize(theta0))

    # ---- split free / collision (ref :128-135)
    free_mask = np.asarray(task.trajs_free_mask(jnp.asarray(trajs)))
    trajs_free = trajs[free_mask]
    trajs_coll = trajs[~free_mask]

    stats = {
        "n_trajs": int(len(trajs)),
        "n_free": int(len(trajs_free)),
        "fraction_free": float(free_mask.mean()),
        "collision_intensity": float(task.compute_collision_intensity_trajs(jnp.asarray(trajs))),
        "success": int(len(trajs_free) > 0),
    }

    if results_dir is not None:
        ctx_dir = os.path.join(results_dir, str(seed))
        os.makedirs(ctx_dir, exist_ok=True)
        np.save(os.path.join(ctx_dir, "trajs-free.npy"), trajs_free.astype(np.float32))
        np.save(os.path.join(ctx_dir, "trajs-collision.npy"), trajs_coll.astype(np.float32))
        args = dict(
            env_id=env_id,
            robot_id=robot_id,
            num_trajectories=num_trajectories,
            n_support_points=n_support_points,
            duration=duration,
            threshold_start_goal_pos=threshold_start_goal_pos,
            obstacle_cutoff_margin=obstacle_cutoff_margin,
            seed=seed,
        )
        with open(os.path.join(ctx_dir, "args.yaml"), "w") as f:
            yaml.safe_dump(args, f)
        with open(os.path.join(ctx_dir, "metadata.yaml"), "w") as f:
            yaml.safe_dump(
                dict(env_id=env_id, robot_id=robot_id, num_trajectories=num_trajectories), f
            )

    if debug:
        print(f"[datagen ctx {seed}] {stats}")
    return stats
