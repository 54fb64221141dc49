"""Pallas megakernel for the Panda collision-guide gradient.

Why: the trace of a Panda guided query (B=100) shows 85% of device time in
the guide — 120 guide evals at ~0.25 ms each, where each eval is a chain of
~10 MFLOP of pure-VPU work (128-point interpolation -> scalar-form FK ->
sphere SDF -> hinge -> analytic FK backward) that XLA splits into dozens of
small fusions with stack/concat layout ops and HBM round-trips between them.
This kernel computes d(sum_b cost_coll(interp(x_b)))/dq in ONE Pallas
program, keeping every intermediate in VMEM registers in structure-of-arrays
(scalar) form — no [B,N,S,3] tensors are ever materialized.

Semantics match the guide's autodiff path exactly (parity test in
tests/test_kernels.py::test_panda_collision_grad_*):
- trajectories are linearly interpolated to `num_interp` points and
  gradients flow back through the interpolation (done here as a pair of
  static-matrix matmuls, MXU-friendly, instead of gather/scatter);
- FK forward/backward reuse the exact scalar-chain helpers from
  world/robots.py (`_fk_scalar_chain` / `_fk_spheres_backward_scalar`), so
  the kernel cannot drift from the custom-VJP math;
- the SDF min over obstacles backpropagates to the argmin sphere only
  (ties, a measure-zero event, differ from autodiff's equal split);
- hinge: err = max(margin + r_s - sdf, 0), cost = sum err / (2 sigma^2)
  (squared=False, the guidance form — ref mp_baselines CostCollision
  contract at reference scripts/inference/inference.py:186-204).

Obstacle data (sphere centers/radii) is baked into the kernel as python
floats — the environment is a static closure everywhere in this framework,
and per-env compilation is the existing contract. Only sphere-obstacle
fields are supported (the Panda envs); callers fall back to autodiff
otherwise (see `supported`).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mpd_tpu.world.primitives import ObjectSet
from mpd_tpu.world.robots import (
    _PANDA_DH,
    RobotPanda,
    _centers_scalar,
    _fk_scalar_chain,
    _fk_spheres_backward_scalar,
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_BIG = 1e6


def _active_spheres(field: ObjectSet):
    """Extract active sphere obstacles as a list of (x, y, z, r) floats."""
    sc = np.asarray(field.sphere_centers, np.float64)
    sr = np.asarray(field.sphere_radii, np.float64)
    return [
        (float(c[0]), float(c[1]), float(c[2]), float(r))
        for c, r in zip(sc, sr)
        if r >= 0
    ]


def _has_active_boxes(field: ObjectSet) -> bool:
    bh = np.asarray(field.box_half_extents, np.float64)
    return bool((bh[..., 0] >= 0).any())


def supported(robot, field: ObjectSet) -> bool:
    """Kernel covers: Panda robot, sphere-only obstacle fields, 3D."""
    return (
        _HAS_PALLAS
        and isinstance(robot, RobotPanda)
        and field.ws_dim == 3
        and not _has_active_boxes(field)
        and len(_active_spheres(field)) > 0
    )


def _interp_matrix(H: int, N: int) -> np.ndarray:
    """[H, N] linear-interpolation matrix: interp = q^T W (per channel).

    Matches world.task.interpolate_points: u = linspace(0, H-1, N),
    lerp between floor/ceil neighbors."""
    u = np.linspace(0.0, H - 1.0, N)
    lo = np.floor(u).astype(np.int64)
    hi = np.minimum(lo + 1, H - 1)
    w = u - lo
    W = np.zeros((H, N), np.float32)
    for n in range(N):
        W[lo[n], n] += 1.0 - w[n]
        W[hi[n], n] += w[n]
    return W


def make_panda_collision_grad(
    robot: RobotPanda,
    field: ObjectSet,
    margin: float,
    sigma: float,
    num_interp: int = 128,
    block_b: Optional[int] = None,
    interpret: bool = False,
) -> Optional[Callable[[jnp.ndarray], jnp.ndarray]]:
    """Build fn(q [..., H, 7]) -> d(sum cost_coll(interp))/dq [..., H, 7].

    Returns None when the (robot, field) pair is outside the kernel's
    coverage; the caller should then keep the jax.grad path."""
    if not supported(robot, field):
        return None

    obstacles = _active_spheres(field)
    radii = [float(r) for r in np.asarray(robot.collision_sphere_radii)]
    n_spheres = len(radii)
    margin = float(margin)
    inv_two_sigma2 = 1.0 / (2.0 * float(sigma) ** 2)

    # ---- EXACT static (sphere, obstacle) pruning (r4). A collision
    # sphere's center can never leave the ball of radius Rmax_s around the
    # base (Rmax from the triangle inequality over the DH translations —
    # a SOUND over-estimate of reach). If even at closest approach
    # ‖o‖ - Rmax_s the pair stays outside the hinge threshold
    # margin + r_s, the obstacle can never contribute gradient: either it
    # is not the argmin (dropping it changes nothing) or it is, in which
    # case best_d > margin + r_s zeroes the hinge — and any other argmin
    # after dropping is farther still, so its hinge is zero too. The
    # gradient is therefore IDENTICAL with the pair removed. On
    # EnvSpheres3D this removes ~27% of the 210 sphere-obstacle pairs and
    # eliminates the (constant-position) segment-0 shoulder spheres
    # entirely — their zero cotangent folds out of the FK backward at
    # trace time (_fk_spheres_backward_scalar handles float 0.0).
    trans = [float(np.hypot(a, d)) for a, d, _ in np.asarray(_PANDA_DH)]
    r_orig = [0.0]
    for t in trans:
        r_orig.append(r_orig[-1] + t)
    sphere_rmax = []
    for u in robot.segment_fractions:
        for seg in range(7):
            sphere_rmax.append(
                (1.0 - u) * r_orig[seg + 1] + u * r_orig[seg + 2]
            )
    sphere_rmax.append(r_orig[8])  # hand sphere at the flange
    assert len(sphere_rmax) == n_spheres
    active_obstacles = []
    for s in range(n_spheres):
        keep = []
        for ox, oy, oz, orad in obstacles:
            o_norm = float(np.sqrt(ox * ox + oy * oy + oz * oz))
            lower_bound = o_norm - sphere_rmax[s] - orad
            if lower_bound <= margin + radii[s] + 1e-6:
                keep.append((ox, oy, oz, orad))
        active_obstacles.append(keep)

    def kernel(q_ref, w_ref, wt_ref, out_ref):
        # q_ref: [7, bb, H]; w_ref: [H, N]; wt_ref: [N, H]; out_ref: [7, bb, H]
        W = w_ref[:]
        # ---- interpolate support points to N collision points (MXU)
        # HIGHEST precision: the TPU MXU's default bf16 multiplies lose
        # ~3 digits on joint angles (|q| up to ~3), visibly perturbing the
        # hinge mask and normals vs the exact gather+lerp reference path
        qi = [
            jnp.dot(
                q_ref[j], W,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            for j in range(7)
        ]  # 7 x [bb, N]
        zeros = qi[0] * 0.0

        # ---- FK forward (scalar chain, shared with the custom VJP)
        origins, axes, axis_pts = _fk_scalar_chain(qi, jnp, want_axes=True)
        # n_spheres x [3]-lists, at the robot's collision-sphere density
        cs = _centers_scalar(origins, robot.segment_fractions)

        # ---- per-sphere SDF min over obstacles + hinge backward.
        # Track the argmin obstacle's (unnormalized) offset and normalize
        # ONCE after the reduction — saves the per-obstacle inverse and
        # three multiplies. Constant center components (base-pillar spheres)
        # are broadcast to full tiles first so every op stays a 2D VPU op.
        #
        # Two restructurings of the original running-best scan (VERDICT r3
        # next-step 2 — the scan's 14-deep (cmp + 4x where) dependence
        # chain per sphere starved VPU issue at ~40% of peak):
        # 1. SQUARED-distance min per radius GROUP: within a group of
        #    obstacles sharing one radius, argmin(dist - r) == argmin(d2),
        #    so the leaves are 3 sub + 3 fma with NO per-obstacle sqrt
        #    (14 sqrts -> 1 per sphere for the uniform-radius Panda envs),
        #    and the post-reduction |offset| recompute collapses into the
        #    same sqrt (dist_b = sqrt(best_d2)).
        # 2. PAIRWISE TREE merges instead of a serial scan: all leaves are
        #    issue-parallel; the merge depth is ceil(log2(14)) = 4
        #    dependent levels instead of 14.
        g_list = []
        for s in range(n_spheres):
            if not active_obstacles[s]:
                # statically unreachable sphere: exact-zero cotangent,
                # folded out of the FK backward at trace time
                g_list.append([0.0, 0.0, 0.0])
                continue
            c = [
                (comp + zeros) if isinstance(comp, float) else comp
                for comp in cs[s]
            ]

            def tree_min(cands):
                # pairwise tree-min on key cands[i][0]; ties keep the
                # earliest entry, matching the serial scan's strict '<'
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
            for ox, oy, oz, orad in active_obstacles[s]:
                by_radius.setdefault(orad, []).append((ox, oy, oz))
            group_best = []
            for orad, centers in by_radius.items():
                cands = []
                for ox, oy, oz in centers:
                    dx = c[0] - ox
                    dy = c[1] - oy
                    dz = c[2] - oz
                    cands.append((dx * dx + dy * dy + dz * dz, dx, dy, dz))
                d2, bdx, bdy, bdz = tree_min(cands)
                dist = jnp.sqrt(d2)
                group_best.append((dist - orad, dist, bdx, bdy, bdz))
            best_d, dist_b, bdx, bdy, bdz = tree_min(group_best)
            inv = jnp.where(
                dist_b > 0.0, 1.0 / jnp.maximum(dist_b, 1e-30), 0.0
            )
            coef = jnp.where(
                margin + radii[s] - best_d > 0.0, -inv_two_sigma2 * inv, 0.0
            )
            g_list.append([coef * bdx, coef * bdy, coef * bdz])

        # ---- FK backward (scalar suffix-sum, shared with the custom VJP)
        grad_comps = _fk_spheres_backward_scalar(axes, axis_pts, cs, g_list)

        # ---- interpolation transpose back to support points (MXU)
        Wt = wt_ref[:]
        for j in range(7):
            gj = grad_comps[j]
            gj = (gj + zeros) if isinstance(gj, float) else gj
            out_ref[j] = jnp.dot(
                gj, Wt,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    def apply(q: jnp.ndarray) -> jnp.ndarray:
        lead = q.shape[:-2]
        H = q.shape[-2]
        q2 = q.reshape((-1, H, 7))
        B = q2.shape[0]
        # On-chip sweep (scripts/tune_panda_block.py, B=1024, pipelined):
        # block 8/16/32/64 -> 1499/1529/1482/1226 us; 64 wins at large
        # batch (fewer program instances amortize per-program overhead
        # without spilling the VMEM-resident FK chain). B=100 (the
        # single-query headline) was tuned at 8 in round 2.
        bb = block_b if block_b is not None else (64 if B >= 512 else 8)
        Bp = -(-B // bb) * bb
        if Bp != B:
            q2 = jnp.concatenate(
                [q2, jnp.zeros((Bp - B, H, 7), q2.dtype)], axis=0
            )
        qt = q2.astype(jnp.float32).transpose(2, 0, 1)  # [7, Bp, H]
        W = jnp.asarray(_interp_matrix(H, num_interp))
        Wt = W.T

        out = pl.pallas_call(
            kernel,
            grid=(Bp // bb,),
            in_specs=[
                pl.BlockSpec(
                    (7, bb, H),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (H, num_interp), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (num_interp, H), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (7, bb, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((7, Bp, H), jnp.float32),
            interpret=interpret,
        )(qt, W, Wt)

        g = out.transpose(1, 2, 0)[:B].astype(q.dtype)  # [B, H, 7]
        return g.reshape(lead + (H, 7))

    return apply
