"""Pallas megakernel for the 2D point-mass collision-guide gradient.

The 2D analogue of kernels/panda_guide.py (see its module docstring for the
motivation): d(sum_b cost_coll(interp(x_b)))/dq in ONE Pallas program. At
the large-batch bench operating point (B=4096 on EnvDense2D+extra: 524k
interpolated points x 28 obstacles) the guide is ~30% of device time and
XLA's gather/where/broadcast chain for the padded SDF sets round-trips
[B,N,n_obj]-shaped intermediates through HBM; here the obstacle loop is
unrolled over compile-time floats with everything resident in VMEM.

Semantics match the autodiff path through costs/cost_functions.CostCollision
+ world/primitives.sdf_object_set (parity test in tests/test_kernels.py):
- linear interpolation to `num_interp` points as a pair of static-matrix
  MXU matmuls, with the gradient flowing back through the transpose;
- sphere SDF: d = |p - c| - r, unit-vector gradient;
- axis-aligned-box SDF: q = |p - c| - h, d = ‖max(q,0)‖ + min(max_i q, 0);
  outside-gradient (max(q,0)/‖·‖)·sign(p - c) with the zero subgradient at
  the interior (primitives._safe_norm contract), interior-gradient sign on
  the argmax dimension only;
- min over obstacles backpropagates to the argmin object only (ties, a
  measure-zero event, differ from autodiff's equal split);
- hinge: err = max(margin + r_robot - sdf, 0), cost = sum err / (2 sigma^2)
  (squared=False, the guidance form).

Obstacle data is baked in as python floats — environments are static
closures framework-wide. Supports the point robot (FK = identity) in 2D
sphere/box fields, i.e. all three 2D tasks incl. ExtraObjects variants.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mpd_tpu.world.primitives import ObjectSet
from mpd_tpu.world.robots import RobotPointMass

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _active_obstacles(field: ObjectSet):
    sc = np.asarray(field.sphere_centers, np.float64)
    sr = np.asarray(field.sphere_radii, np.float64)
    bc = np.asarray(field.box_centers, np.float64)
    bh = np.asarray(field.box_half_extents, np.float64)
    spheres = [
        (float(c[0]), float(c[1]), float(r))
        for c, r in zip(sc, sr)
        if r >= 0
    ]
    boxes = [
        (float(c[0]), float(c[1]), float(h[0]), float(h[1]))
        for c, h in zip(bc, bh)
        if h[0] >= 0
    ]
    return spheres, boxes


def supported(robot, field: ObjectSet) -> bool:
    """Kernel covers: point robot, 2D sphere/box obstacle fields."""
    if not (_HAS_PALLAS and isinstance(robot, RobotPointMass) and field.ws_dim == 2):
        return False
    spheres, boxes = _active_obstacles(field)
    return len(spheres) + len(boxes) > 0


_MM_KW = dict(
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)


def _collision_point_grads(px, py, spheres, boxes, margin, r_robot,
                           inv_two_sigma2):
    """d(cost_coll)/d(point) for [bb, N] point tiles -> (gx, gy).

    SDF min restructured like the Panda kernel (VERDICT r3 #2): pairwise
    TREE merges (issue-parallel leaves, log2 merge depth) instead of a
    serial running-best scan, with the sphere min run on SQUARED distances
    per radius group — argmin(dist - r) == argmin(d2) within a group — so
    the per-sphere sqrt disappears (one sqrt per group) and, since
    ‖offset‖ == dist of the winning sphere, that same sqrt normalizes the
    group's gradient: every candidate entering the final merge carries a
    FINISHED gradient. Shared by the collision-only kernel and the full
    guide-update kernel."""

    def tree_min(cands):
        # ties keep the earliest entry WITHIN a group/merge order; an exact
        # distance tie across radius groups (or across the sphere/box
        # boundary) can pick a different argmin than the old flat serial
        # scan — a measure-zero, harmless divergence (ADVICE r4)
        while len(cands) > 1:
            nxt = [
                tuple(
                    jnp.where(cands[i + 1][0] < cands[i][0], b_, a_)
                    for a_, b_ in zip(cands[i], cands[i + 1])
                )
                for i in range(0, len(cands) - 1, 2)
            ]
            if len(cands) % 2:
                nxt.append(cands[-1])
            cands = nxt
        return cands[0]

    by_radius = {}
    for cx, cy, orad in spheres:
        by_radius.setdefault(orad, []).append((cx, cy))
    cands = []
    for orad, centers in by_radius.items():
        leaves = []
        for cx, cy in centers:
            dx = px - cx
            dy = py - cy
            leaves.append((dx * dx + dy * dy, dx, dy))
        d2, bdx, bdy = tree_min(leaves)
        dist = jnp.sqrt(d2)
        inv = jnp.where(dist > 0.0, 1.0 / jnp.maximum(dist, 1e-30), 0.0)
        cands.append((dist - orad, bdx * inv, bdy * inv))
    for cx, cy, hx, hy in boxes:
        ux = px - cx
        uy = py - cy
        qx = jnp.abs(ux) - hx
        qy = jnp.abs(uy) - hy
        qax = jnp.maximum(qx, 0.0)
        qay = jnp.maximum(qy, 0.0)
        out2 = qax * qax + qay * qay
        pos = out2 > 0.0
        outside = jnp.where(pos, jnp.sqrt(jnp.where(pos, out2, 1.0)), 0.0)
        qmax = jnp.maximum(qx, qy)
        d_o = outside + jnp.minimum(qmax, 0.0)
        # outside gradient: (max(q,0)/‖·‖) sign(u); zero at the interior
        # (the _safe_norm zero-subgradient contract)
        inv_out = jnp.where(pos, 1.0 / jnp.maximum(outside, 1e-30), 0.0)
        gx = qax * inv_out * jnp.sign(ux)
        gy = qay * inv_out * jnp.sign(uy)
        # interior gradient: sign(u) on the argmax dim of q only
        interior = qmax < 0.0
        gx = gx + jnp.where(interior & (qx >= qy), jnp.sign(ux), 0.0)
        gy = gy + jnp.where(interior & (qy > qx), jnp.sign(uy), 0.0)
        cands.append((d_o, gx, gy))
    best_d, bgx, bgy = tree_min(cands)
    coef = jnp.where(
        margin + r_robot - best_d > 0.0, -inv_two_sigma2, 0.0
    )
    return coef * bgx, coef * bgy


def make_pointmass_collision_grad(
    robot: RobotPointMass,
    field: ObjectSet,
    margin: float,
    sigma: float,
    num_interp: int = 128,
    block_b: Optional[int] = None,
    interpret: bool = False,
) -> Optional[Callable[[jnp.ndarray], jnp.ndarray]]:
    """Build fn(q [..., H, 2]) -> d(sum cost_coll(interp))/dq [..., H, 2].

    Returns None when (robot, field) is outside coverage (caller keeps the
    jax.grad path). `block_b=None` picks the batch blocking from B at trace
    time (large blocks amortize per-program overhead at bench batch sizes).
    """
    if not supported(robot, field):
        return None
    from mpd_tpu.kernels.panda_guide import _interp_matrix

    spheres, boxes = _active_obstacles(field)
    r_robot = float(np.asarray(robot.collision_sphere_radii)[0])
    margin = float(margin)
    inv_two_sigma2 = 1.0 / (2.0 * float(sigma) ** 2)

    def kernel(q_ref, w_ref, wt_ref, out_ref):
        # q_ref: [2, bb, H]; w_ref: [H, N]; wt_ref: [N, H]; out_ref: [2, bb, H]
        W = w_ref[:]
        kw = _MM_KW
        px = jnp.dot(q_ref[0], W, **kw)  # [bb, N]
        py = jnp.dot(q_ref[1], W, **kw)
        gx_i, gy_i = _collision_point_grads(
            px, py, spheres, boxes, margin, r_robot, inv_two_sigma2
        )
        Wt = wt_ref[:]
        out_ref[0] = jnp.dot(gx_i, Wt, **kw)
        out_ref[1] = jnp.dot(gy_i, Wt, **kw)

    def apply(q: jnp.ndarray) -> jnp.ndarray:
        lead = q.shape[:-2]
        H = q.shape[-2]
        q2 = q.reshape((-1, H, 2))
        B = q2.shape[0]
        # On-chip sweep (scripts/tune_pointmass_block.py, B=4096, pipelined):
        # block 8/16/32/64/128/256 -> 1260/1236/1179/1185/1158/1177 us; 128
        # wins at the bench operating point (grid 32 amortizes per-program
        # overhead without spilling the [2, bb, 128] interp blocks).
        bb = block_b if block_b is not None else (
            128 if B >= 1024 else 32 if B >= 256 else 8
        )
        Bp = -(-B // bb) * bb
        if Bp != B:
            q2 = jnp.concatenate(
                [q2, jnp.zeros((Bp - B, H, 2), q2.dtype)], axis=0
            )
        qt = q2.astype(jnp.float32).transpose(2, 0, 1)  # [2, Bp, H]
        W = jnp.asarray(_interp_matrix(H, num_interp))

        out = pl.pallas_call(
            kernel,
            grid=(Bp // bb,),
            in_specs=[
                pl.BlockSpec(
                    (2, bb, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (H, num_interp), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (num_interp, H), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (2, bb, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((2, Bp, H), jnp.float32),
            interpret=interpret,
        )(qt, W, W.T)

        g = out.transpose(1, 2, 0)[:B].astype(q.dtype)  # [B, H, 2]
        return g.reshape(lead + (H, 2))

    # measured crossover vs the jax.grad path on the chip (see
    # CostCollision.make_fused_interp_gradient): kernel wins from B=128 up
    apply.min_batch = 128
    return apply


def make_pointmass_guide_update(
    robot: RobotPointMass,
    field: ObjectSet,
    margin: float,
    sigma: float,
    normalizer_mins,
    normalizer_maxs,
    dt: float,
    sigma_gp: float = 1.0,
    num_interp: int = 128,
    max_grad_norm: float = 1.0,
    block_b: Optional[int] = None,
    interpret: bool = False,
) -> Optional[Callable]:
    """FULL guide-step megakernel, 2D analogue of
    panda_guide.make_panda_guide_update (see its docstring for the exact
    semantics list — identical wrapper math, FK = identity):
    fn(x_norm [..., H, 4], weights [2]) -> guide update [..., H, 4] for
    the production point-mass composite (CostCollision + CostGPTrajectory,
    norm-clip, LimitsNormalizer) in ONE Pallas program."""
    if not supported(robot, field):
        return None
    from mpd_tpu.kernels.panda_guide import _interp_matrix, _shift_left_matrix

    spheres, boxes = _active_obstacles(field)
    r_robot = float(np.asarray(robot.collision_sphere_radii)[0])
    margin = float(margin)
    inv_two_sigma2 = 1.0 / (2.0 * float(sigma) ** 2)

    mins32 = np.asarray(normalizer_mins, np.float32)
    maxs32 = np.asarray(normalizer_maxs, np.float32)
    if mins32.shape != (4,) or maxs32.shape != (4,):
        return None
    mins = [float(v) for v in mins32]
    rng_half = [float(v) for v in (maxs32 - mins32)]

    dt = float(dt)
    q_inv = np.array(
        [[12.0 / dt**3, -6.0 / dt**2], [-6.0 / dt**2, 4.0 / dt]],
        np.float64,
    ) / (float(sigma_gp) ** 2)
    Q00 = float(np.float32(q_inv[0, 0]))
    Q01 = float(np.float32(q_inv[0, 1]))
    Q11 = float(np.float32(q_inv[1, 1]))
    max_gn = float(max_grad_norm)
    EPS = 1e-6

    def kernel(x_ref, w_ref, wt_ref, sl_ref, sr_ref, wts_ref, out_ref):
        # x_ref: [4, bb, H] normalized state; wts_ref: [2] SMEM weights
        W = w_ref[:]
        Wt = wt_ref[:]
        SL = sl_ref[:]
        SR = sr_ref[:]
        w_coll = wts_ref[0]
        w_gp = wts_ref[1]
        H = x_ref.shape[2]

        xs = []
        for j in range(4):
            x01 = (jnp.clip(x_ref[j], -1.0, 1.0) + 1.0) / 2.0
            xs.append(x01 * rng_half[j] + mins[j])
        zeros2 = xs[0] * 0.0  # [bb, H]

        # ---- collision gradient on interpolated points (position only)
        px = jnp.dot(xs[0], W, **_MM_KW)
        py = jnp.dot(xs[1], W, **_MM_KW)
        gx_i, gy_i = _collision_point_grads(
            px, py, spheres, boxes, margin, r_robot, inv_two_sigma2
        )
        gcoll = [jnp.dot(gx_i, Wt, **_MM_KW), jnp.dot(gy_i, Wt, **_MM_KW)]

        # ---- closed-form GP gradient, shifts as exact matmuls
        col = jax.lax.broadcasted_iota(jnp.int32, zeros2.shape, 1)
        m_lt = (col < H - 1).astype(jnp.float32)
        ggp = [None] * 4
        for j in range(2):
            q = xs[j]
            v = xs[j + 2]
            q_next = jnp.dot(q, SL, **_MM_KW)
            v_next = jnp.dot(v, SL, **_MM_KW)
            r_pos = (q_next - q - v * dt) * m_lt
            r_vel = (v_next - v) * m_lt
            s = Q00 * r_pos + Q01 * r_vel
            w = Q01 * r_pos + Q11 * r_vel
            s_prev = jnp.dot(s, SR, **_MM_KW)
            w_prev = jnp.dot(w, SR, **_MM_KW)
            ggp[j] = s_prev - s
            ggp[j + 2] = -dt * s - w + w_prev

        # ---- per-term clip-by-norm over the 4 state channels
        n2_coll = zeros2 + 2.0 * (EPS * EPS)  # the zero velocity half
        for j in range(2):
            gje = gcoll[j] + EPS
            n2_coll = n2_coll + gje * gje
        norm_coll = jnp.sqrt(n2_coll)
        sc_coll = jnp.minimum(norm_coll, max_gn) / norm_coll

        n2_gp = zeros2
        for j in range(4):
            gje = ggp[j] + EPS
            n2_gp = n2_gp + gje * gje
        norm_gp = jnp.sqrt(n2_gp)
        sc_gp = jnp.minimum(norm_gp, max_gn) / norm_gp

        interior = ((col > 0) & (col < H - 1)).astype(jnp.float32)
        for j in range(4):
            acc = w_gp * (sc_gp * ggp[j])
            if j < 2:
                acc = acc + w_coll * (sc_coll * gcoll[j])
            out_ref[j] = -interior * acc

    def apply(x_norm: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
        lead = x_norm.shape[:-2]
        H = x_norm.shape[-2]
        x2 = x_norm.reshape((-1, H, 4))
        B = x2.shape[0]
        bb = block_b if block_b is not None else (
            128 if B >= 1024 else 32 if B >= 256 else 8
        )
        Bp = -(-B // bb) * bb
        if Bp != B:
            x2 = jnp.concatenate(
                [x2, jnp.zeros((Bp - B, H, 4), x2.dtype)], axis=0
            )
        xt = x2.astype(jnp.float32).transpose(2, 0, 1)  # [4, Bp, H]
        W = jnp.asarray(_interp_matrix(H, num_interp))
        Wt = W.T
        SL = jnp.asarray(_shift_left_matrix(H))
        SR = SL.T
        wts = jnp.asarray(weights, jnp.float32).reshape((2,))

        out = pl.pallas_call(
            kernel,
            grid=(Bp // bb,),
            in_specs=[
                pl.BlockSpec(
                    (4, bb, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (H, num_interp), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (num_interp, H), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (H, H), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (H, H), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (4, bb, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((4, Bp, H), jnp.float32),
            interpret=interpret,
        )(xt, W, Wt, SL, SR, wts)

        g = out.transpose(1, 2, 0)[:B].astype(x_norm.dtype)
        return g.reshape(lead + (H, 4))

    # Unlike the bare-collision kernel (which loses below B=128 to
    # per-program overhead + layout transposes, RESULTS.md crossover
    # note), the FULL kernel wins at every batch size measured on-chip —
    # B=8/25/50 wall p50: 26.9/26.4/26.5 ms forced vs 27.7/28.2/28.5 ms
    # composed (r4) — because the fused wrapper saves more than the
    # per-program overhead costs. Always on.
    apply.min_batch = 1
    return apply
