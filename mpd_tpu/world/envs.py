"""Planning environments: obstacle layouts + workspace limits.

Counterparts of the reference's four tasks' environments
(consumed at reference mpd/datasets/trajectories.py:44-47 and
scripts/generate_data/generate_trajectories.py:37-38; the torch_robotics
dependency holding the layouts is an empty submodule in the snapshot, so the
concrete obstacle placements here are clean-room layouts with the same
character: a sparse 2D scene, a dense 2D scene, a dense scene with a narrow
passage, and a 3D sphere field for the Panda). Each env also exposes
`ExtraObjects` variants — held-out obstacles added only at inference time to
test generalization — and per-env default planner hyperparameters
(contract of env.get_rrt_connect_params / get_gpmp2_params, reference
scripts/generate_data/generate_trajectories.py:71-95).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from mpd_tpu.world.primitives import ObjectSet, concat_object_sets, make_object_set


class EnvBase:
    """An environment = workspace limits + a padded obstacle set.

    Not a pytree: env geometry is static per planning problem; the jitted
    code closes over the ObjectSet arrays as constants.
    """

    name: str = "EnvBase"
    ws_dim: int = 2

    def __init__(self, use_extra_objects: bool = False):
        self.use_extra_objects = use_extra_objects
        self.limits = jnp.asarray(self._limits(), dtype=jnp.float32)  # [2, ws_dim]
        base = self._objects()
        extra = self._extra_objects()
        self.objects = concat_object_sets(base, extra) if use_extra_objects else base
        self.extra_objects = extra

    # --- subclass hooks -------------------------------------------------
    def _limits(self):
        return [[-1.0] * self.ws_dim, [1.0] * self.ws_dim]

    def _objects(self) -> ObjectSet:
        raise NotImplementedError

    def _extra_objects(self) -> ObjectSet:
        return make_object_set(ws_dim=self.ws_dim)

    # --- planner hyperparameter defaults (per-env, per-robot) -----------
    def get_rrt_connect_params(self, robot) -> Dict:
        return dict(step_size=0.05, n_iters=30000, n_pre_samples=10000, max_time=120.0)

    def get_gpmp2_params(self, robot) -> Dict:
        return dict(
            opt_iters=300,
            num_interpolated_points=128,
            sigma_start=1e-3,
            sigma_goal=1e-3,
            sigma_gp=0.2,
            sigma_obst=0.005,
            step_size=0.2,
            obstacle_cutoff_margin=0.05,
        )


class EnvSimple2D(EnvBase):
    """Sparse 2D scene: a few large round/box obstacles."""

    name = "EnvSimple2D"
    ws_dim = 2

    def _objects(self) -> ObjectSet:
        return make_object_set(
            spheres=[
                ((-0.45, 0.50), 0.20),
                ((0.50, 0.50), 0.20),
                ((0.00, 0.00), 0.22),
                ((-0.50, -0.45), 0.20),
                ((0.50, -0.50), 0.20),
            ],
            boxes=[
                ((0.0, 0.72), (0.12, 0.10)),
                ((0.0, -0.72), (0.12, 0.10)),
            ],
            ws_dim=2,
        )

    def _extra_objects(self) -> ObjectSet:
        return make_object_set(
            spheres=[
                ((-0.25, -0.18), 0.08),
                ((0.25, 0.20), 0.08),
            ],
            boxes=[((-0.15, 0.32), (0.07, 0.07))],
            ws_dim=2,
        )


class EnvDense2D(EnvBase):
    """Dense 2D scene: many small circles + boxes."""

    name = "EnvDense2D"
    ws_dim = 2

    def _objects(self) -> ObjectSet:
        return make_object_set(
            spheres=[
                ((-0.70, 0.70), 0.12),
                ((-0.15, 0.70), 0.12),
                ((0.45, 0.72), 0.12),
                ((-0.45, 0.30), 0.12),
                ((0.12, 0.32), 0.12),
                ((0.70, 0.28), 0.12),
                ((-0.70, -0.10), 0.12),
                ((-0.12, -0.12), 0.12),
                ((0.45, -0.15), 0.12),
                ((-0.45, -0.52), 0.12),
                ((0.12, -0.55), 0.12),
                ((0.70, -0.58), 0.12),
            ],
            boxes=[
                ((0.78, 0.75), (0.10, 0.10)),
                ((-0.40, 0.75), (0.09, 0.09)),
                ((0.15, 0.72), (0.09, 0.09)),
                ((-0.15, 0.30), (0.09, 0.09)),
                ((0.42, 0.30), (0.09, 0.09)),
                ((-0.42, -0.12), (0.09, 0.09)),
                ((0.15, -0.14), (0.09, 0.09)),
                ((0.72, -0.16), (0.09, 0.09)),
                ((-0.15, -0.55), (0.09, 0.09)),
                ((0.42, -0.58), (0.09, 0.09)),
                ((-0.72, -0.70), (0.10, 0.10)),
            ],
            ws_dim=2,
        )

    def _extra_objects(self) -> ObjectSet:
        return make_object_set(
            spheres=[
                ((-0.30, 0.52), 0.07),
                ((0.30, 0.05), 0.07),
                ((-0.30, -0.32), 0.07),
            ],
            boxes=[((0.58, 0.55), (0.06, 0.06)), ((-0.58, 0.10), (0.06, 0.06))],
            ws_dim=2,
        )


class EnvNarrowPassageDense2D(EnvBase):
    """Dense scene split by walls with one narrow passage through the middle."""

    name = "EnvNarrowPassageDense2D"
    ws_dim = 2

    def _objects(self) -> ObjectSet:
        return make_object_set(
            spheres=[
                ((-0.62, 0.62), 0.13),
                ((0.10, 0.65), 0.13),
                ((0.70, 0.62), 0.13),
                ((-0.35, 0.40), 0.12),
                ((0.42, 0.38), 0.12),
                ((-0.62, -0.58), 0.13),
                ((0.10, -0.62), 0.13),
                ((0.70, -0.60), 0.13),
                ((-0.35, -0.38), 0.12),
                ((0.42, -0.38), 0.12),
            ],
            boxes=[
                # Horizontal wall at y=0 with a narrow gap around x in (-0.09, 0.09)
                ((-0.585, 0.0), (0.495, 0.05)),
                ((0.585, 0.0), (0.495, 0.05)),
                ((-0.80, 0.78), (0.08, 0.08)),
                ((0.85, 0.82), (0.08, 0.08)),
                ((-0.82, -0.80), (0.08, 0.08)),
                ((0.85, -0.80), (0.08, 0.08)),
            ],
            ws_dim=2,
        )

    def _extra_objects(self) -> ObjectSet:
        return make_object_set(
            spheres=[((-0.15, 0.62), 0.07), ((0.62, -0.25), 0.07)],
            boxes=[((-0.62, 0.22), (0.06, 0.06))],
            ws_dim=2,
        )


class EnvSpheres3D(EnvBase):
    """3D sphere field around the Panda workspace (robot base at origin)."""

    name = "EnvSpheres3D"
    ws_dim = 3

    def _limits(self):
        return [[-1.0, -1.0, 0.0], [1.0, 1.0, 1.5]]

    def _objects(self) -> ObjectSet:
        return make_object_set(
            spheres=[
                ((0.55, 0.00, 0.30), 0.11),
                ((0.40, 0.40, 0.25), 0.11),
                ((0.00, 0.55, 0.35), 0.11),
                ((-0.40, 0.40, 0.30), 0.11),
                ((-0.55, 0.00, 0.40), 0.11),
                ((0.40, -0.40, 0.35), 0.11),
                ((0.00, -0.55, 0.30), 0.11),
                ((0.45, 0.10, 0.75), 0.11),
                ((0.05, 0.45, 0.80), 0.11),
                ((-0.40, -0.10, 0.80), 0.11),
                ((0.05, -0.45, 0.75), 0.11),
                ((0.30, 0.30, 1.00), 0.11),
                ((-0.25, 0.35, 1.05), 0.11),
                ((0.00, 0.00, 1.20), 0.11),
            ],
            ws_dim=3,
        )

    def _extra_objects(self) -> ObjectSet:
        return make_object_set(
            spheres=[
                ((0.55, 0.25, 0.55), 0.08),
                ((-0.30, 0.50, 0.60), 0.08),
                ((0.20, -0.50, 0.55), 0.08),
            ],
            ws_dim=3,
        )

    def get_rrt_connect_params(self, robot) -> Dict:
        return dict(step_size=0.15, n_iters=30000, n_pre_samples=10000, max_time=300.0)

    def get_gpmp2_params(self, robot) -> Dict:
        p = super().get_gpmp2_params(robot)
        p.update(sigma_gp=0.3, sigma_obst=0.008, obstacle_cutoff_margin=0.03)
        return p


ENVS = {
    "EnvSimple2D": EnvSimple2D,
    "EnvDense2D": EnvDense2D,
    "EnvNarrowPassageDense2D": EnvNarrowPassageDense2D,
    "EnvSpheres3D": EnvSpheres3D,
}


def get_env(env_id: str, use_extra_objects: bool = False) -> EnvBase:
    """Registry lookup by id; `use_extra_objects` mirrors the reference's
    `<EnvId>ExtraObjects` class-name convention."""
    if env_id.endswith("ExtraObjects"):
        env_id = env_id[: -len("ExtraObjects")]
        use_extra_objects = True
    if env_id not in ENVS:
        raise ValueError(f"unknown env {env_id!r}; available: {sorted(ENVS)}")
    return ENVS[env_id](use_extra_objects=use_extra_objects)
