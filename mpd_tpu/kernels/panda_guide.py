"""Pallas megakernels for the Panda guide: collision gradient + full step.

Two kernels share the FK/SDF core:
- `make_panda_collision_grad`: d(sum cost_coll(interp))/dq — the r2-r3
  kernel, used by the composed guide path (and any caller wanting just the
  collision gradient);
- `make_panda_guide_update` (r4): the ENTIRE guide step
  (unnormalize -> collision grad -> closed-form GP grad -> per-term
  norm-clip -> endpoint zeroing -> -sum(w*g)) in one program. At B=1024
  this cut the guide eval from ~344 us to ~160 us (the wrapper's
  HBM-bound elementwise passes all stay in VMEM), lifting the Panda
  DDPM-25 at-scale lane 11.9k -> 19.3k trajs/s.

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


def _prune_obstacles(robot: RobotPanda, field: ObjectSet, margin: float):
    """Per-sphere active-obstacle lists after EXACT static pruning.

    Returns (radii, active_obstacles) where radii is the robot's
    collision-sphere radius list and active_obstacles[s] the (x, y, z, r)
    obstacles that can possibly contribute gradient for sphere s."""
    obstacles = _active_spheres(field)
    radii = [float(r) for r in np.asarray(robot.collision_sphere_radii)]
    n_spheres = len(radii)

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
    return radii, active_obstacles


def _collision_grad_channels(
    qi, zeros, robot, radii, active_obstacles, margin, inv_two_sigma2
):
    """Collision-cost gradient w.r.t. the 7 interpolated joint channels.

    `qi`: 7 x [bb, N] interpolated joint tiles; returns grad_comps, a list
    of 7 [bb, N] arrays (or trace-time 0.0). Shared by the collision-only
    kernel and the full guide-update kernel."""
    n_spheres = len(radii)

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
            # earliest entry WITHIN a radius group/merge order — an exact
            # tie across groups can pick a different argmin than the old
            # flat serial scan (measure-zero, harmless; ADVICE r4)
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
    return _fk_spheres_backward_scalar(axes, axis_pts, cs, g_list)


# HIGHEST precision: the TPU MXU's default bf16 multiplies lose ~3 digits
# on joint angles (|q| up to ~3), visibly perturbing the hinge mask and
# normals vs the exact gather+lerp reference path. Applies to every matmul
# in these kernels (interp, its transpose, and the 0/1 shift matrices,
# which must select elements exactly).
_MATMUL_KW = dict(
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)


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

    margin = float(margin)
    inv_two_sigma2 = 1.0 / (2.0 * float(sigma) ** 2)
    radii, active_obstacles = _prune_obstacles(robot, field, margin)

    def kernel(q_ref, w_ref, wt_ref, out_ref):
        # q_ref: [7, bb, H]; w_ref: [H, N]; wt_ref: [N, H]; out_ref: [7, bb, H]
        W = w_ref[:]
        # ---- interpolate support points to N collision points (MXU)
        qi = [jnp.dot(q_ref[j], W, **_MATMUL_KW) for j in range(7)]
        zeros = qi[0] * 0.0
        grad_comps = _collision_grad_channels(
            qi, zeros, robot, radii, active_obstacles, margin, inv_two_sigma2
        )
        # ---- interpolation transpose back to support points (MXU)
        Wt = wt_ref[:]
        for j in range(7):
            gj = grad_comps[j]
            gj = (gj + zeros) if isinstance(gj, float) else gj
            out_ref[j] = jnp.dot(gj, Wt, **_MATMUL_KW)

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


def _shift_left_matrix(H: int) -> np.ndarray:
    """[H, H] 0/1 matrix: (x @ SL)[:, t] = x[:, t+1], last column 0.

    Lane-dimension shifts inside the kernel are done as MXU matmuls with
    this exact selector (HIGHEST precision keeps them bitwise) — no
    reliance on Mosaic roll/slice lowering along the lane axis."""
    SL = np.zeros((H, H), np.float32)
    for t in range(H - 1):
        SL[t + 1, t] = 1.0
    return SL


def make_panda_guide_update(
    robot: RobotPanda,
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
    pack: Optional[int] = None,
) -> Optional[Callable]:
    """FULL guide-step megakernel: fn(x_norm [..., H, 14], weights [2]) ->
    guide update [..., H, 14] — the entire
    `GuideTrajectoriesWithVelocity.__call__` for the production Panda
    composite (CostCollision + CostGPTrajectory, norm-clip, endpoint
    zeroing) in ONE Pallas program.

    `pack` (r5): lane-packing factor. The kernel's working tiles are
    [bb, num_interp] and [bb, H]; with num_interp = H = 64 both pad to
    the 128-wide VPU lane tile and HALF the vector issue slots do padding
    work — which is why the r5 interp-count sweep measured 64/96 points
    throughput-NEUTRAL (results_perf/tune_interp_r5.json). pack=2 packs
    TWO trajectories side-by-side in each 128-lane tile (block-diagonal
    interp/shift matrices, per-lane column masks via col mod H), so the
    whole FK/SDF/GP chain does 2x the trajectories per vector op —
    num_interp=64's work reduction actually realized. Requires
    pack * num_interp == pack * H == 128 lanes; None auto-selects
    (2 when H == num_interp == 64, else 1). Math is identical per
    trajectory (same tree-min order, same matmul row contents).

    Motivation (r4): at B=1024 the collision kernel is ~150-200 us of a
    ~350 us guide eval — the other half is the HBM-bound elementwise
    wrapper (unnormalize round-trip, closed-form GP gradient, two
    per-term norm-clips, masking, weighting), each pass streaming the
    [B, H, 14] state. Fusing the whole step keeps every intermediate in
    VMEM: the state is read once and the update written once.

    Exact semantics reproduced (parity test
    tests/test_kernels.py::test_panda_full_guide_matches_composed):
    - unnormalize = clip(x, -1, 1) then the LimitsNormalizer affine
      (ref normalization.py:156-167);
    - gradients w.r.t. the UNNORMALIZED trajectory, the update applied in
      normalized space without a chain rule through the normalizer (the
      reference quirk, guides.py:173-211);
    - per-term clip-by-norm over the state dim with the reference's
      grad+1e-6 epsilon placement (guides.py:224-230); the collision
      term's velocity half is exactly zero and still contributes the
      7 x (1e-6)^2 epsilon mass to its norm, as in the composed path;
    - endpoint rows zeroed AFTER clipping (guides.py:202-203);
    - result = -(w_coll * g_coll + w_gp * g_gp), weights as traced
      scalars (SMEM operand) so sweeps share the compile;
    - GP gradient in the closed form of CostGPTrajectory.gradient
      (cost_functions.py:175-197), with the time-shifts done as exact
      0/1-matrix MXU matmuls.
    """
    if not supported(robot, field):
        return None

    margin = float(margin)
    inv_two_sigma2 = 1.0 / (2.0 * float(sigma) ** 2)
    radii, active_obstacles = _prune_obstacles(robot, field, margin)

    # f32 arithmetic for the baked constants, matching the composed path's
    # jnp (f32) computation of maxs - mins bit for bit
    mins32 = np.asarray(normalizer_mins, np.float32)
    maxs32 = np.asarray(normalizer_maxs, np.float32)
    if mins32.shape != (14,) or maxs32.shape != (14,):
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

    def kernel(x_ref, w_ref, wt_ref, sl_ref, sr_ref, wts_ref, out_ref,
               *, n_sup):
        # x_ref: [14, bb, pack*H] normalized state (pack trajectories per
        # lane tile; pack=1 is the plain layout); wts_ref: [2] SMEM
        # weights; n_sup = H, the per-trajectory support-point count
        W = w_ref[:]
        Wt = wt_ref[:]
        SL = sl_ref[:]
        SR = sr_ref[:]
        w_coll = wts_ref[0]
        w_gp = wts_ref[1]

        # ---- unnormalize (clip + affine), reference op order preserved
        xs = []
        for j in range(14):
            x01 = (jnp.clip(x_ref[j], -1.0, 1.0) + 1.0) / 2.0
            xs.append(x01 * rng_half[j] + mins[j])
        zeros2 = xs[0] * 0.0  # [bb, H]

        # ---- collision gradient (position channels; vel half is zero)
        qi = [jnp.dot(xs[j], W, **_MATMUL_KW) for j in range(7)]
        zeros = qi[0] * 0.0
        grad_comps = _collision_grad_channels(
            qi, zeros, robot, radii, active_obstacles, margin, inv_two_sigma2
        )
        gcoll = []
        for j in range(7):
            gj = grad_comps[j]
            gj = (gj + zeros) if isinstance(gj, float) else gj
            gcoll.append(jnp.dot(gj, Wt, **_MATMUL_KW))  # [bb, H]

        # ---- closed-form GP gradient, shifts as exact matmuls
        # mask of columns t < H-1 (residuals exist for t = 0..H-2); under
        # pack>1 the lane index is col mod H within each packed trajectory
        col = jax.lax.broadcasted_iota(jnp.int32, zeros2.shape, 1)
        if zeros2.shape[1] != n_sup:
            col = (
                col & (n_sup - 1)
                if (n_sup & (n_sup - 1)) == 0
                else col % n_sup
            )
        m_lt = (col < n_sup - 1).astype(jnp.float32)
        ggp = [None] * 14
        for j in range(7):
            q = xs[j]
            v = xs[j + 7]
            q_next = jnp.dot(q, SL, **_MATMUL_KW)
            v_next = jnp.dot(v, SL, **_MATMUL_KW)
            r_pos = (q_next - q - v * dt) * m_lt
            r_vel = (v_next - v) * m_lt
            s = Q00 * r_pos + Q01 * r_vel
            w = Q01 * r_pos + Q11 * r_vel
            s_prev = jnp.dot(s, SR, **_MATMUL_KW)
            w_prev = jnp.dot(w, SR, **_MATMUL_KW)
            ggp[j] = s_prev - s
            ggp[j + 7] = -dt * s - w + w_prev

        # ---- per-term clip-by-norm over the 14 state channels
        n2_coll = zeros2 + 7.0 * (EPS * EPS)  # the zero velocity half
        for j in range(7):
            gje = gcoll[j] + EPS
            n2_coll = n2_coll + gje * gje
        norm_coll = jnp.sqrt(n2_coll)
        sc_coll = jnp.minimum(norm_coll, max_gn) / norm_coll

        n2_gp = zeros2
        for j in range(14):
            gje = ggp[j] + EPS
            n2_gp = n2_gp + gje * gje
        norm_gp = jnp.sqrt(n2_gp)
        sc_gp = jnp.minimum(norm_gp, max_gn) / norm_gp

        # ---- endpoint rows zeroed AFTER clipping; weighted sum, negated
        interior = ((col > 0) & (col < n_sup - 1)).astype(jnp.float32)
        for j in range(14):
            acc = w_gp * (sc_gp * ggp[j])
            if j < 7:
                acc = acc + w_coll * (sc_coll * gcoll[j])
            out_ref[j] = -interior * acc

    def apply(x_norm: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
        import functools

        def block_diag(*mats):
            n = sum(m.shape[0] for m in mats)
            k = sum(m.shape[1] for m in mats)
            out = np.zeros((n, k), np.float32)
            r = c = 0
            for m in mats:
                out[r : r + m.shape[0], c : c + m.shape[1]] = m
                r += m.shape[0]
                c += m.shape[1]
            return out

        lead = x_norm.shape[:-2]
        H = x_norm.shape[-2]
        p = pack
        if p is None:
            p = 2 if (H == 64 and num_interp == 64) else 1
        if p * H > 128 or p * num_interp > 128 or p < 1:
            p = 1
        x2 = x_norm.reshape((-1, H, 14))
        B = x2.shape[0]
        bb = block_b if block_b is not None else (64 if B >= 512 else 8)
        # Mosaic needs the block's sublane (second-to-last) dim divisible
        # by 8: the packed block is [14, bb/p, p*H], so bb must be a
        # multiple of 8*p (p=1 keeps the plain rule — bb is already 8/64)
        bb = -(-max(bb, 8 * p) // (8 * p)) * (8 * p)
        Bp = -(-B // bb) * bb
        if Bp != B:
            x2 = jnp.concatenate(
                [x2, jnp.zeros((Bp - B, H, 14), x2.dtype)], axis=0
            )
        xt = x2.astype(jnp.float32).transpose(2, 0, 1)  # [14, Bp, H]
        if p > 1:
            # p consecutive trajectories side by side per lane row:
            # (j, b, h) -> (j, b // p, (b % p) * H + h)
            xt = xt.reshape(14, Bp // p, p * H)
        W1 = _interp_matrix(H, num_interp)
        SL1 = _shift_left_matrix(H)
        W = jnp.asarray(block_diag(*([W1] * p)))
        Wt = W.T
        SL = jnp.asarray(block_diag(*([SL1] * p)))
        SR = SL.T
        wts = jnp.asarray(weights, jnp.float32).reshape((2,))

        bbp, Hp, Np = bb // p, p * H, p * num_interp
        out = pl.pallas_call(
            functools.partial(kernel, n_sup=H),
            grid=(Bp // bb,),
            in_specs=[
                pl.BlockSpec(
                    (14, bbp, Hp), lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (Hp, Np), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (Np, Hp), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (Hp, Hp), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (Hp, Hp), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (14, bbp, Hp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((14, Bp // p, Hp), jnp.float32),
            interpret=interpret,
        )(xt, W, Wt, SL, SR, wts)

        if p > 1:
            out = out.reshape(14, Bp, H)
        g = out.transpose(1, 2, 0)[:B].astype(x_norm.dtype)
        return g.reshape(lead + (H, 14))

    return apply
