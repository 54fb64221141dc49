"""RRT-Connect sampling-based planner (host-side NumPy).

Counterpart of mp_baselines' RRTConnect (consumed at reference
scripts/generate_data/generate_trajectories.py:74-89). RRT is inherently
sequential and branchy, so — mirroring the reference's CPU datagen
(launch_generate_trajectories.py:27) — it runs on the host in NumPy against
the NumPy SDF/FK mirrors; the TPU does the batched GPMP2 smoothing.
Edge collision checks are vectorized over all interpolated points.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional

import numpy as np


class _Tree:
    def __init__(self, root: np.ndarray, capacity: int):
        self.nodes = np.empty((capacity, root.shape[-1]), dtype=np.float64)
        self.parents = np.full(capacity, -1, dtype=np.int64)
        self.nodes[0] = root
        self.size = 1

    def add(self, q: np.ndarray, parent: int) -> int:
        i = self.size
        self.nodes[i] = q
        self.parents[i] = parent
        self.size += 1
        return i

    def nearest(self, q: np.ndarray) -> int:
        d = np.linalg.norm(self.nodes[: self.size] - q, axis=-1)
        return int(np.argmin(d))

    def path_to_root(self, idx: int) -> List[np.ndarray]:
        path = []
        while idx >= 0:
            path.append(self.nodes[idx].copy())
            idx = int(self.parents[idx])
        return path


class RRTConnect:
    """Bidirectional RRT with greedy connect.

    collision_fn: q [N, dof] -> bool [N] (True = in collision).
    """

    def __init__(
        self,
        collision_fn: Callable[[np.ndarray], np.ndarray],
        q_min: np.ndarray,
        q_max: np.ndarray,
        step_size: float = 0.05,
        n_iters: int = 30000,
        max_time: float = 120.0,
        n_collision_points_per_edge: int = 8,
        seed: int = 0,
    ):
        self.collision_fn = collision_fn
        self.q_min = np.asarray(q_min, dtype=np.float64)
        self.q_max = np.asarray(q_max, dtype=np.float64)
        self.step_size = step_size
        self.n_iters = n_iters
        self.max_time = max_time
        self.n_edge_pts = n_collision_points_per_edge
        self.rng = np.random.RandomState(seed)

    def _edge_free(self, q0: np.ndarray, q1: np.ndarray) -> bool:
        pts = q0 + np.linspace(0.0, 1.0, self.n_edge_pts)[:, None] * (q1 - q0)
        return not bool(np.any(self.collision_fn(pts)))

    def _extend(self, tree: _Tree, q_target: np.ndarray):
        """One steer step from nearest node toward q_target.
        Returns (status, new_idx): status in {'trapped','advanced','reached'}."""
        near_idx = tree.nearest(q_target)
        q_near = tree.nodes[near_idx]
        diff = q_target - q_near
        dist = np.linalg.norm(diff)
        if dist < 1e-9:
            return "reached", near_idx
        q_new = q_target if dist <= self.step_size else q_near + diff / dist * self.step_size
        if not self._edge_free(q_near, q_new):
            return "trapped", -1
        new_idx = tree.add(q_new, near_idx)
        reached = np.linalg.norm(q_target - q_new) < 1e-9
        return ("reached" if reached else "advanced"), new_idx

    def _connect(self, tree: _Tree, q_target: np.ndarray):
        status = "advanced"
        idx = -1
        while status == "advanced":
            status, idx = self._extend(tree, q_target)
        return status, idx

    def plan(self, start: np.ndarray, goal: np.ndarray) -> Optional[np.ndarray]:
        start = np.asarray(start, dtype=np.float64)
        goal = np.asarray(goal, dtype=np.float64)
        if bool(self.collision_fn(start[None])[0]) or bool(self.collision_fn(goal[None])[0]):
            return None

        cap = self.n_iters + 2
        tree_a, tree_b = _Tree(start, cap), _Tree(goal, cap)
        a_is_start = True
        t0 = time.time()

        for _ in range(self.n_iters):
            if time.time() - t0 > self.max_time:
                return None
            q_rand = self.rng.uniform(self.q_min, self.q_max)
            status, new_idx = self._extend(tree_a, q_rand)
            if status != "trapped":
                q_new = tree_a.nodes[new_idx]
                status_b, idx_b = self._connect(tree_b, q_new)
                if status_b == "reached":
                    # join: path root..q_new in tree_a, q_new..root in tree_b
                    path_a = tree_a.path_to_root(new_idx)[::-1]
                    path_b = tree_b.path_to_root(idx_b)
                    path = path_a + path_b
                    if not a_is_start:
                        path = path[::-1]
                    return np.asarray(self._shortcut(path))
            tree_a, tree_b = tree_b, tree_a
            a_is_start = not a_is_start
        return None

    def _shortcut(self, path: List[np.ndarray], n_rounds: int = 80) -> List[np.ndarray]:
        """Randomized shortcutting: try replacing subpaths with free straight
        edges (checked at the same edge resolution per unit step length)."""
        path = [np.asarray(p) for p in path]
        for _ in range(n_rounds):
            if len(path) <= 2:
                break
            i, j = sorted(self.rng.choice(len(path), size=2, replace=False))
            if j - i < 2:
                continue
            q0, q1 = path[i], path[j]
            seg_len = np.linalg.norm(q1 - q0)
            n_pts = max(self.n_edge_pts, int(seg_len / self.step_size * self.n_edge_pts))
            pts = q0 + np.linspace(0.0, 1.0, n_pts)[:, None] * (q1 - q0)
            if not np.any(self.collision_fn(pts)):
                path = path[: i + 1] + path[j:]
        return path


def resample_path(path: np.ndarray, n_points: int) -> np.ndarray:
    """Arc-length-uniform resampling of a waypoint path [M, dof] to n_points."""
    seg = np.linalg.norm(np.diff(path, axis=0), axis=-1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = s[-1]
    if total < 1e-12:
        return np.repeat(path[:1], n_points, axis=0)
    s_new = np.linspace(0.0, total, n_points)
    out = np.empty((n_points, path.shape[-1]))
    for d in range(path.shape[-1]):
        out[:, d] = np.interp(s_new, s, path[:, d])
    return out
