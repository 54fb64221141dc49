"""Robots: point-mass and 7-DoF Panda with differentiable batched FK.

Counterparts of the reference's RobotPointMass / RobotPanda (contract observed
at reference mpd/datasets/trajectories.py:50-51,100 and
scripts/inference/inference.py:123,364,383-384; the torch_robotics dep is an
empty submodule, so FK and the collision-sphere model are clean-room builds).

State convention: a trajectory state is [q, dq] (positions then velocities),
so `get_position` / `get_velocity` are static slices. FK is written against
an array-namespace argument so the same math runs as jnp (differentiable,
vmapped, on-TPU) and as NumPy (host-side RRT collision checks).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class RobotBase:
    name: str = "RobotBase"
    q_dim: int = 0
    ws_dim: int = 0

    def __init__(self, dt: float = 5.0 / 64):
        self.dt = dt
        self.q_min = jnp.asarray(self._q_limits()[0], dtype=jnp.float32)
        self.q_max = jnp.asarray(self._q_limits()[1], dtype=jnp.float32)

    def _q_limits(self):
        raise NotImplementedError

    @property
    def state_dim(self) -> int:
        return 2 * self.q_dim

    def get_position(self, traj):
        """[..., 2q] or [..., H, 2q] -> positions [..., q]."""
        return traj[..., : self.q_dim]

    def get_velocity(self, traj):
        return traj[..., self.q_dim : 2 * self.q_dim]

    def collision_sphere_positions(self, q, xp=jnp):
        """q [..., q_dim] -> workspace sphere centers [..., S, ws_dim]."""
        raise NotImplementedError

    @property
    def collision_sphere_radii(self) -> np.ndarray:
        raise NotImplementedError


class RobotPointMass(RobotBase):
    """Holonomic point robot; configuration space == workspace."""

    name = "RobotPointMass"
    q_dim = 2
    ws_dim = 2
    radius = 0.01

    def _q_limits(self):
        return [-1.0, -1.0], [1.0, 1.0]

    def collision_sphere_positions(self, q, xp=jnp):
        return q[..., None, :]

    @property
    def collision_sphere_radii(self) -> np.ndarray:
        return np.array([self.radius], dtype=np.float32)


# ---------------------------------------------------------------------------
# Panda
# ---------------------------------------------------------------------------

# Franka Emika Panda modified-DH parameters (public spec):
# rows: (a_{i-1}, d_i, alpha_{i-1}) for joints 1..7 plus the fixed flange.
_PANDA_DH = np.array(
    [
        # a        d       alpha
        [0.0,      0.333,  0.0],
        [0.0,      0.0,   -np.pi / 2],
        [0.0,      0.316,  np.pi / 2],
        [0.0825,   0.0,    np.pi / 2],
        [-0.0825,  0.384, -np.pi / 2],
        [0.0,      0.0,    np.pi / 2],
        [0.088,    0.0,    np.pi / 2],
        [0.0,      0.107,  0.0],  # flange (theta = 0)
    ],
    dtype=np.float64,
)

_PANDA_Q_MIN = np.array(
    [-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973], dtype=np.float64
)
_PANDA_Q_MAX = np.array(
    [2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973], dtype=np.float64
)

# Collision-sphere model: spheres are placed along the kinematic chain at
# fixed interpolation fractions between consecutive frame origins (2 per
# segment) plus a larger hand sphere at the flange. This tracks the arm's
# swept volume closely while keeping a static sphere count.
_SEGMENT_FRACTIONS = (0.25, 0.75)
_ARM_SPHERE_RADIUS = 0.06
_HAND_SPHERE_RADIUS = 0.09


def _panda_frame_origins(q, xp):
    """Frame origins along the chain for configurations q [..., 7].

    Returns [..., 9, 3]: base origin + origins of frames 1..7 + flange.
    Modified-DH transform: T = RotX(alpha) TransX(a) RotZ(theta) TransZ(d).
    """
    batch_shape = q.shape[:-1]
    dtype = q.dtype

    # Running rotation R [..., 3, 3] and translation p [..., 3]
    R = xp.broadcast_to(xp.eye(3, dtype=dtype), batch_shape + (3, 3))
    p = xp.zeros(batch_shape + (3,), dtype=dtype)
    origins = [p]

    for i in range(8):
        a, d, alpha = _PANDA_DH[i]
        theta = q[..., i] if i < 7 else xp.zeros(batch_shape, dtype=dtype)
        ct, st = xp.cos(theta), xp.sin(theta)
        ca, sa = float(np.cos(alpha)), float(np.sin(alpha))

        zeros = xp.zeros_like(ct)
        ones = xp.ones_like(ct)
        # Local rotation (modified DH), rows stacked then moved to [..., 3, 3]
        R_loc = xp.stack(
            [
                xp.stack([ct, -st, zeros], axis=-1),
                xp.stack([st * ca, ct * ca, -sa * ones], axis=-1),
                xp.stack([st * sa, ct * sa, ca * ones], axis=-1),
            ],
            axis=-2,
        )
        t_loc = xp.stack(
            [a * ones, -d * sa * ones, d * ca * ones], axis=-1
        )

        # FK needs true f32 products: on TPU, default einsum would route these
        # tiny 3x3 contractions through bf16 MXU passes (~1e-3 error).
        if xp is np:
            p = p + np.einsum("...ij,...j->...i", R, t_loc)
            R = np.einsum("...ij,...jk->...ik", R, R_loc)
        else:
            import jax

            p = p + xp.einsum("...ij,...j->...i", R, t_loc, precision=jax.lax.Precision.HIGHEST)
            R = xp.einsum("...ij,...jk->...ik", R, R_loc, precision=jax.lax.Precision.HIGHEST)
        origins.append(p)

    return xp.stack(origins, axis=-2)


def _panda_fk_with_axes(q):
    """FK forward pass that also exposes the joint axes for the analytic
    Jacobian: returns (origins [..., 9, 3], axes z_i [..., 7, 3],
    axis_points o_i [..., 7, 3]) — joint i's world rotation axis and a point
    on it. jnp-only (the backward fast path)."""
    import jax

    batch_shape = q.shape[:-1]
    dtype = q.dtype
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    p = jnp.zeros(batch_shape + (3,), dtype=dtype)
    origins = [p]
    axes = []
    axis_pts = []
    hi = jax.lax.Precision.HIGHEST

    for i in range(8):
        a, d, alpha = _PANDA_DH[i]
        theta = q[..., i] if i < 7 else jnp.zeros(batch_shape, dtype=dtype)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        ca, sa = float(np.cos(alpha)), float(np.sin(alpha))
        zeros = jnp.zeros_like(ct)
        ones = jnp.ones_like(ct)

        if i < 7:
            # joint i rotates about z of the post-RotX intermediate frame:
            # axis = R @ [0, -sa, ca]; it passes through p + R @ [a, 0, 0]
            z_loc = jnp.asarray([0.0, -sa, ca], dtype)
            axes.append(jnp.einsum("...ij,j->...i", R, z_loc, precision=hi))
            x_loc = jnp.asarray([a, 0.0, 0.0], dtype)
            axis_pts.append(p + jnp.einsum("...ij,j->...i", R, x_loc, precision=hi))

        R_loc = jnp.stack(
            [
                jnp.stack([ct, -st, zeros], axis=-1),
                jnp.stack([st * ca, ct * ca, -sa * ones], axis=-1),
                jnp.stack([st * sa, ct * sa, ca * ones], axis=-1),
            ],
            axis=-2,
        )
        t_loc = jnp.stack([a * ones, -d * sa * ones, d * ca * ones], axis=-1)
        p = p + jnp.einsum("...ij,...j->...i", R, t_loc, precision=hi)
        R = jnp.einsum("...ij,...jk->...ik", R, R_loc, precision=hi)
        origins.append(p)

    return (
        jnp.stack(origins, axis=-2),
        jnp.stack(axes, axis=-2),
        jnp.stack(axis_pts, axis=-2),
    )


def _panda_centers_from_origins(origins, xp=jnp):
    starts = origins[..., 1:-1, :]
    ends = origins[..., 2:, :]
    centers = [starts + u * (ends - starts) for u in _SEGMENT_FRACTIONS]
    centers = xp.concatenate(centers, axis=-2)
    return xp.concatenate([centers, origins[..., -1:, :]], axis=-2)


def _panda_sphere_joint_mask() -> np.ndarray:
    """[S, 7] mask: sphere s depends on joint i iff i <= segment(s) (the
    hand sphere depends on all joints). Exactness: each frame origin lies on
    its parent joint's axis, so z_i x (c - o_i) vanishes for the upstream
    endpoint of a segment and the naive formula is the true Jacobian."""
    n_seg = 7
    segs = list(range(n_seg)) * len(_SEGMENT_FRACTIONS) + [6]
    mask = np.zeros((len(segs), 7), np.float32)
    for s, j in enumerate(segs):
        mask[s, : j + 1] = 1.0
    return mask


_PANDA_JOINT_MASK = _panda_sphere_joint_mask()


def _make_panda_sphere_positions_vjp():
    import jax

    @jax.custom_vjp
    def sphere_positions(q):
        origins = _panda_frame_origins(q, jnp)
        return _panda_centers_from_origins(origins)

    def fwd(q):
        origins, axes, axis_pts = _panda_fk_with_axes(q)
        centers = _panda_centers_from_origins(origins)
        return centers, (axes, axis_pts, centers)

    def bwd(res, g):
        # g: [..., S, 3] cotangent on sphere centers.
        # J[s, i] = mask * z_i x (c_s - o_i)  (revolute-joint rule)
        axes, axis_pts, centers = res
        rel = centers[..., :, None, :] - axis_pts[..., None, :, :]  # [.., S, 7, 3]
        J = jnp.cross(axes[..., None, :, :], rel)
        J = J * jnp.asarray(_PANDA_JOINT_MASK)[:, :, None]
        grad_q = jnp.einsum("...sd,...sjd->...j", g, J)
        return (grad_q,)

    sphere_positions.defvjp(fwd, bwd)
    return sphere_positions


_panda_sphere_positions_fast = None


def panda_sphere_positions_fast(q):
    """Sphere centers with an analytic-Jacobian backward pass.

    The autodiff reverse sweep through the 8-step FK chain is ~100 tiny
    sequential ops and dominates guide-gradient cost on the Panda (measured:
    the guide is ~97% of a Panda planning query). The custom VJP replaces it
    with one cross product + one einsum."""
    global _panda_sphere_positions_fast
    if _panda_sphere_positions_fast is None:
        _panda_sphere_positions_fast = _make_panda_sphere_positions_vjp()
    return _panda_sphere_positions_fast(q)


class RobotPanda(RobotBase):
    name = "RobotPanda"
    q_dim = 7
    ws_dim = 3

    def _q_limits(self):
        return _PANDA_Q_MIN.tolist(), _PANDA_Q_MAX.tolist()

    def frame_origins(self, q, xp=jnp):
        return _panda_frame_origins(q, xp)

    def fk_ee(self, q, xp=jnp):
        """End-effector (flange) position [..., 3]."""
        return _panda_frame_origins(q, xp)[..., -1, :]

    def collision_sphere_positions(self, q, xp=jnp):
        """q [..., 7] -> sphere centers [..., S, 3].

        Segments between consecutive frame origins (skipping the base->frame1
        column, which cannot reach workspace obstacles) carry
        len(_SEGMENT_FRACTIONS) spheres each; the flange carries one.
        The jnp path uses the analytic-Jacobian custom VJP (see
        panda_sphere_positions_fast).
        """
        if xp is jnp:
            return panda_sphere_positions_fast(q)
        origins = _panda_frame_origins(q, xp)  # [..., 9, 3]
        return _panda_centers_from_origins(origins, xp)

    @property
    def collision_sphere_radii(self) -> np.ndarray:
        n_seg_spheres = 7 * len(_SEGMENT_FRACTIONS)
        radii = np.full((n_seg_spheres + 1,), _ARM_SPHERE_RADIUS, dtype=np.float32)
        radii[-1] = _HAND_SPHERE_RADIUS
        return radii


ROBOTS = {
    "RobotPointMass": RobotPointMass,
    "RobotPanda": RobotPanda,
}


def get_robot(robot_id: str, **kwargs) -> RobotBase:
    if robot_id not in ROBOTS:
        raise ValueError(f"unknown robot {robot_id!r}; available: {sorted(ROBOTS)}")
    return ROBOTS[robot_id](**kwargs)
