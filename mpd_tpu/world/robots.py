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
# segment by default) plus a larger hand sphere at the flange. This tracks
# the arm's swept volume closely while keeping a static sphere count.
# RobotPanda(n_spheres_per_segment=n) places n spheres per segment at
# fractions (i + 0.5)/n — denser models tighten the validity oracle (the
# default 2-sphere model leaves ~7 cm of uncovered chord on the longest
# links; 3 per segment closes it) at a linear cost in guide/oracle FLOPs.
_SEGMENT_FRACTIONS = (0.25, 0.75)


def _segment_fractions(n: int):
    return tuple((i + 0.5) / n for i in range(int(n)))
_ARM_SPHERE_RADIUS = 0.06
_HAND_SPHERE_RADIUS = 0.09


def _snap(v: float) -> float:
    """Snap near-zero/±1 trig constants so scalar folding can drop terms."""
    for target in (0.0, 1.0, -1.0):
        if abs(v - target) < 1e-12:
            return target
    return v


def _m(a, b):
    """Multiply with trace-time folding of float 0/1 factors."""
    if isinstance(a, float):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
    if isinstance(b, float):
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
    return a * b


def _add(*terms):
    """Sum, dropping trace-time float zeros."""
    live = [t for t in terms if not (isinstance(t, float) and t == 0.0)]
    if not live:
        return 0.0
    out = live[0]
    for t in live[1:]:
        out = out + t
    return out


def _fk_scalar_chain(q, xp, want_axes: bool = False):
    """Unrolled scalar-form FK over the Panda chain.

    The rotation is kept as 9 separate batch arrays and the DH products are
    written out termwise (modified DH: T = RotX(alpha) TransX(a) RotZ(theta)
    TransZ(d)), so the whole chain is pure elementwise math — no stacked
    3x3 intermediates, no einsum. On TPU this is what XLA fuses into a
    handful of VPU kernels; the previous stack+einsum(HIGHEST) form paid
    layout shuffles and multi-pass f32 MXU ops per joint (measured: the
    guide around this FK was ~97% of a Panda planning query). Identity/zero
    entries fold away at trace time (most DH constants are 0/±1).

    `q` is either an array [..., 7] or a list/tuple of 7 per-joint batch
    arrays (the list form lets the Pallas guide megakernel reuse this exact
    chain on structure-of-arrays registers — see kernels/panda_guide.py).

    Returns (origins, axes, axis_pts): lists of [3]-lists of batch arrays
    (or float 0.0/1.0 for entries that fold to constants); axes/axis_pts
    are None unless want_axes.
    """
    # R row-major as scalar entries; p as 3 entries
    R = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    p = [0.0, 0.0, 0.0]
    origins = [list(p)]
    axes = [] if want_axes else None
    axis_pts = [] if want_axes else None

    for i in range(8):
        a, d, alpha = (float(v) for v in _PANDA_DH[i])
        ca, sa = _snap(float(np.cos(alpha))), _snap(float(np.sin(alpha)))
        if i < 7:
            theta = q[i] if isinstance(q, (list, tuple)) else q[..., i]
            ct, st = xp.cos(theta), xp.sin(theta)
        else:
            ct, st = 1.0, 0.0

        if want_axes and i < 7:
            # joint i rotates about z of the post-RotX frame:
            # axis = R @ [0, -sa, ca]; it passes through p + R @ [a, 0, 0]
            axes.append(
                [
                    _add(_m(R[k * 3 + 1], -sa), _m(R[k * 3 + 2], ca))
                    for k in range(3)
                ]
            )
            axis_pts.append([_add(p[k], _m(R[k * 3], a)) for k in range(3)])

        # p += R @ [a, -d*sa, d*ca]
        t0, t1, t2 = a, -d * sa, d * ca
        p = [
            _add(
                p[k],
                _m(R[k * 3 + 0], t0),
                _m(R[k * 3 + 1], t1),
                _m(R[k * 3 + 2], t2),
            )
            for k in range(3)
        ]
        # R = R @ R_loc with R_loc = [[ct,-st,0],[st*ca,ct*ca,-sa],[st*sa,ct*sa,ca]]
        sc, ss = _m(st, ca), _m(st, sa)  # st*ca, st*sa
        cc, cs = _m(ct, ca), _m(ct, sa)
        newR = []
        for k in range(3):
            r0, r1, r2 = R[k * 3], R[k * 3 + 1], R[k * 3 + 2]
            newR.extend(
                [
                    _add(_m(r0, ct), _m(r1, sc), _m(r2, ss)),
                    _add(_m(r0, -st), _m(r1, cc), _m(r2, cs)),
                    _add(_m(r1, -sa), _m(r2, ca)),
                ]
            )
        R = newR
        origins.append(list(p))

    return origins, axes, axis_pts


def _stack_scalar_vectors(vecs, q, xp):
    """[[3]-lists of scalar entries] -> array [..., len(vecs), 3]."""
    zero = xp.zeros_like(q[..., 0])
    rows = []
    for v in vecs:
        comps = [c + zero if isinstance(c, float) else c for c in v]
        rows.append(xp.stack(comps, axis=-1))
    return xp.stack(rows, axis=-2)


def _panda_frame_origins(q, xp):
    """Frame origins along the chain for configurations q [..., 7].

    Returns [..., 9, 3]: base origin + origins of frames 1..7 + flange.
    Modified-DH transform: T = RotX(alpha) TransX(a) RotZ(theta) TransZ(d).
    """
    origins, _, _ = _fk_scalar_chain(q, xp)
    return _stack_scalar_vectors(origins, q, xp)


def _sub(x, y):
    """Subtract with trace-time folding of float zeros."""
    if isinstance(y, float) and y == 0.0:
        return x
    if isinstance(x, float) and x == 0.0:
        return -y
    return x - y


def _cross(a, b):
    """Cross product of scalar-entry triples."""
    return [
        _sub(_m(a[1], b[2]), _m(a[2], b[1])),
        _sub(_m(a[2], b[0]), _m(a[0], b[2])),
        _sub(_m(a[0], b[1]), _m(a[1], b[0])),
    ]


def _dot3(a, b):
    return _add(_m(a[0], b[0]), _m(a[1], b[1]), _m(a[2], b[2]))


def _centers_scalar(origins, fractions=_SEGMENT_FRACTIONS):
    """Scalar-form sphere centers from scalar-form frame origins.

    Same layout as _panda_centers_from_origins: all segments at fraction
    u_0, then all at u_1, ..., then the hand sphere at the flange.
    """
    cs = []
    for u in fractions:
        for seg in range(7):
            s_, e_ = origins[seg + 1], origins[seg + 2]
            cs.append(
                [_add(_m(s_[k], 1.0 - u), _m(e_[k], u)) for k in range(3)]
            )
    cs.append(list(origins[8]))
    return cs


def _panda_centers_from_origins(origins, xp=jnp, fractions=_SEGMENT_FRACTIONS):
    starts = origins[..., 1:-1, :]
    ends = origins[..., 2:, :]
    centers = [starts + u * (ends - starts) for u in fractions]
    centers = xp.concatenate(centers, axis=-2)
    return xp.concatenate([centers, origins[..., -1:, :]], axis=-2)


def _fk_spheres_backward_scalar(axes, axis_pts, cs, g_list):
    """Scalar-form backward: cotangents on sphere centers -> joint grads.

    g_list: list of S [3]-lists of batch arrays (cotangent per center),
    in _centers_scalar layout (7 segments per fraction block, hand last —
    the per-segment fraction count is recovered from len(g_list)).
    Sphere s depends on joint i iff i <= segment(s); exactness: each frame
    origin lies on its parent joint's axis, so z_i x (c - o_i) vanishes for
    the upstream endpoint of a segment and the revolute rule
    J[s, i] = z_i x (c_s - o_i) is the true Jacobian. Instead of
    materializing J, use g_s . (z_i x (c_s - o_i)) = z_i . (c_s x g_s)
    - z_i . (o_i x G) and the chain structure (joint i affects spheres on
    segments >= i): accumulate per-segment sums of (c x g) and g, then
    suffix-sum from the wrist down — O(S + 7) elementwise triples, no
    [S, 7, 3] tensor. Returns a list of 7 batch arrays (or trace-time 0.0).
    Shared by the custom VJP below and the Pallas guide megakernel."""
    n_frac = (len(g_list) - 1) // 7
    segs = list(range(7)) * n_frac + [6]
    seg_cg = [[0.0, 0.0, 0.0] for _ in range(7)]
    seg_g = [[0.0, 0.0, 0.0] for _ in range(7)]
    for s, seg in enumerate(segs):
        gs = g_list[s]
        cg = _cross(cs[s], gs)
        seg_cg[seg] = [_add(seg_cg[seg][k], cg[k]) for k in range(3)]
        seg_g[seg] = [_add(seg_g[seg][k], gs[k]) for k in range(3)]
    grad_comps = [0.0] * 7
    cx = [0.0, 0.0, 0.0]
    gsum = [0.0, 0.0, 0.0]
    for j in range(6, -1, -1):
        cx = [_add(cx[k], seg_cg[j][k]) for k in range(3)]
        gsum = [_add(gsum[k], seg_g[j][k]) for k in range(3)]
        grad_comps[j] = _sub(
            _dot3(axes[j], cx), _dot3(axes[j], _cross(axis_pts[j], gsum))
        )
    return grad_comps


def _make_panda_sphere_positions_vjp(fractions=_SEGMENT_FRACTIONS):
    import jax

    @jax.custom_vjp
    def sphere_positions(q):
        origins, _, _ = _fk_scalar_chain(q, jnp)
        return _stack_scalar_vectors(_centers_scalar(origins, fractions), q, jnp)

    def fwd(q):
        origins, axes, axis_pts = _fk_scalar_chain(q, jnp, want_axes=True)
        cs = _centers_scalar(origins, fractions)
        centers = _stack_scalar_vectors(cs, q, jnp)
        return centers, (axes, axis_pts, cs)

    def bwd(res, g):
        axes, axis_pts, cs = res
        n_spheres = 7 * len(fractions) + 1
        g_list = [[g[..., s, k] for k in range(3)] for s in range(n_spheres)]
        grad_comps = _fk_spheres_backward_scalar(axes, axis_pts, cs, g_list)
        zero = jnp.zeros_like(g[..., 0, 0])
        comps = [c + zero if isinstance(c, float) else c for c in grad_comps]
        return (jnp.stack(comps, axis=-1),)

    sphere_positions.defvjp(fwd, bwd)
    return sphere_positions


_panda_sphere_positions_cache = {}


def panda_sphere_positions_fast(q, fractions=_SEGMENT_FRACTIONS):
    """Sphere centers with an analytic-Jacobian backward pass.

    The autodiff reverse sweep through the 8-step FK chain is ~100 tiny
    sequential ops and dominates guide-gradient cost on the Panda (measured:
    the guide is ~97% of a Panda planning query). The custom VJP replaces it
    with one cross product + one einsum. Cached per fraction tuple so jit
    sees one stable callable per collision-sphere density."""
    fractions = tuple(fractions)
    fn = _panda_sphere_positions_cache.get(fractions)
    if fn is None:
        fn = _panda_sphere_positions_cache[fractions] = (
            _make_panda_sphere_positions_vjp(fractions)
        )
    return fn(q)


class RobotPanda(RobotBase):
    name = "RobotPanda"
    q_dim = 7
    ws_dim = 3

    def __init__(self, dt: float = 5.0 / 64, n_spheres_per_segment: int = 2):
        """`n_spheres_per_segment` sets the collision-model density:
        n spheres per kinematic segment at fractions (i + 0.5)/n (default 2
        -> the historical (0.25, 0.75) model). Denser models cover more of
        each link's chord (max uncovered gap = L/n - 2r per segment of
        length L), tightening the validity oracle and the guide gradient at
        a linear cost in FK/SDF work."""
        if n_spheres_per_segment < 1:
            raise ValueError("n_spheres_per_segment must be >= 1")
        self.segment_fractions = _segment_fractions(n_spheres_per_segment)
        super().__init__(dt=dt)

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
        len(self.segment_fractions) spheres each; the flange carries one.
        The jnp path uses the analytic-Jacobian custom VJP (see
        panda_sphere_positions_fast).
        """
        if xp is jnp:
            return panda_sphere_positions_fast(q, self.segment_fractions)
        origins = _panda_frame_origins(q, xp)  # [..., 9, 3]
        return _panda_centers_from_origins(origins, xp, self.segment_fractions)

    @property
    def collision_sphere_radii(self) -> np.ndarray:
        n_seg_spheres = 7 * len(self.segment_fractions)
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
