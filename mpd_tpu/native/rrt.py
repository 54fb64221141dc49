"""ctypes wrapper for the native RRT-Connect + collision checker.

Robot geometry (DH table, collision-sphere fractions/radii) is marshalled
from the Python world model — mpd_tpu/world/robots.py stays the single
source of truth; parity is asserted in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from mpd_tpu.native.build import load_library
from mpd_tpu.world.primitives import ObjectSet
from mpd_tpu.world.robots import (
    RobotBase,
    RobotPanda,
    RobotPointMass,
    _ARM_SPHERE_RADIUS,
    _HAND_SPHERE_RADIUS,
    _PANDA_DH,
)

_D = ctypes.POINTER(ctypes.c_double)


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(_D)


class _Marshalled:
    """Pre-marshalled obstacle + robot arrays for the C ABI."""

    def __init__(self, robot: RobotBase, objects: ObjectSet, margin: float):
        self.sph_c = np.ascontiguousarray(np.asarray(objects.sphere_centers), np.float64)
        self.sph_r = np.ascontiguousarray(np.asarray(objects.sphere_radii), np.float64)
        self.box_c = np.ascontiguousarray(np.asarray(objects.box_centers), np.float64)
        self.box_h = np.ascontiguousarray(np.asarray(objects.box_half_extents), np.float64)
        self.ws = self.sph_c.shape[1]
        self.q_min = np.ascontiguousarray(np.asarray(robot.q_min), np.float64)
        self.q_max = np.ascontiguousarray(np.asarray(robot.q_max), np.float64)
        self.q_dim = robot.q_dim
        self.margin = float(margin)

        if isinstance(robot, RobotPointMass):
            self.robot_type = 0
            self.point_radius = float(robot.radius)
            self.dh = np.zeros((1, 3), np.float64)
            self.fractions = np.zeros((1,), np.float64)
            self.arm_r = 0.0
            self.hand_r = 0.0
        elif isinstance(robot, RobotPanda):
            self.robot_type = 1
            self.point_radius = 0.0
            self.dh = np.ascontiguousarray(_PANDA_DH, np.float64)
            self.fractions = np.ascontiguousarray(
                np.asarray(robot.segment_fractions), np.float64
            )
            self.arm_r = float(_ARM_SPHERE_RADIUS)
            self.hand_r = float(_HAND_SPHERE_RADIUS)
        else:
            raise NotImplementedError(f"no native model for {type(robot).__name__}")

    def common_args(self):
        return (
            _dptr(self.sph_c), _dptr(self.sph_r), len(self.sph_r),
            _dptr(self.box_c), _dptr(self.box_h), len(self.box_c), self.ws,
            self.robot_type, self.point_radius,
            _dptr(self.dh), len(self.dh),
            _dptr(self.fractions), len(self.fractions),
            self.arm_r, self.hand_r,
        )


def native_collision_fn(robot: RobotBase, objects: ObjectSet, margin: float):
    """q [N, q_dim] -> in-collision bool [N], running in C++."""
    lib = load_library()
    if lib is None:
        return None
    m = _Marshalled(robot, objects, margin)

    def collision_fn(q: np.ndarray) -> np.ndarray:
        q = np.ascontiguousarray(q, np.float64)
        n = q.shape[0]
        out = np.zeros((n,), np.uint8)
        lib.collision_check_batch(
            _dptr(q), n, m.q_dim, _dptr(m.q_min), _dptr(m.q_max),
            *m.common_args(), m.margin,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out.astype(bool)

    return collision_fn


class NativeRRTConnect:
    """Drop-in replacement for datagen's RRTConnect, running fully in C++."""

    def __init__(
        self,
        robot: RobotBase,
        objects: ObjectSet,
        margin: float,
        step_size: float = 0.05,
        n_iters: int = 30000,
        max_time: float = 120.0,
        n_collision_points_per_edge: int = 8,
        shortcut_rounds: int = 80,
        seed: int = 0,
        max_path_len: int = 100000,
    ):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self.lib = lib
        self.m = _Marshalled(robot, objects, margin)
        self.step_size = float(step_size)
        self.n_iters = int(n_iters)
        self.max_time = float(max_time)
        self.n_edge_pts = int(n_collision_points_per_edge)
        self.shortcut_rounds = int(shortcut_rounds)
        self.seed = int(seed)
        self.max_path_len = int(max_path_len)

    def plan(self, start: np.ndarray, goal: np.ndarray) -> Optional[np.ndarray]:
        m = self.m
        start = np.ascontiguousarray(start, np.float64)
        goal = np.ascontiguousarray(goal, np.float64)
        out = np.zeros((self.max_path_len, m.q_dim), np.float64)
        out_len = ctypes.c_int(0)
        ok = self.lib.rrt_connect_plan(
            _dptr(start), _dptr(goal), m.q_dim,
            _dptr(m.q_min), _dptr(m.q_max),
            *m.common_args(), m.margin,
            self.step_size, self.n_iters, self.max_time,
            self.n_edge_pts, self.seed, self.shortcut_rounds,
            _dptr(out), self.max_path_len, ctypes.byref(out_len),
        )
        if not ok:
            return None
        return out[: out_len.value].copy()
