"""Pallas fused-U-Net parity tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpd_tpu.nets.temporal_unet import TemporalUnet


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode on the CPU backend."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_fused_unet_matches_flax():
    from mpd_tpu.kernels import pallas_unet_apply

    B, H, D = 8, 32, 4
    mults = (1, 2)
    net = TemporalUnet(state_dim=D, n_support_points=H, unet_input_dim=16, dim_mults=mults)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, D))
    t = jnp.asarray(np.arange(B) % 25, jnp.int32)
    variables = net.init(jax.random.PRNGKey(1), x, t)

    ref = net.apply(variables, x, t)
    fused = pallas_unet_apply(variables, x, t, dim_mults=mults, block_b=4)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_fused_unet_matches_flax_full_size():
    from mpd_tpu.kernels import pallas_unet_apply

    B, H, D = 4, 64, 4
    mults = (1, 2, 4, 8)
    net = TemporalUnet(state_dim=D, n_support_points=H, unet_input_dim=32, dim_mults=mults)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, H, D))
    t = jnp.full((B,), 7, jnp.int32)
    variables = net.init(jax.random.PRNGKey(3), x, t)

    ref = net.apply(variables, x, t)
    fused = pallas_unet_apply(variables, x, t, dim_mults=mults, block_b=4)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# Panda collision-guide megakernel (kernels/panda_guide.py)
# ---------------------------------------------------------------------------

def _panda_collision_setup(num_interp=32, **robot_kwargs):
    from mpd_tpu.world.envs import get_env
    from mpd_tpu.world.robots import get_robot
    from mpd_tpu.costs.cost_functions import CostCollision

    env = get_env("EnvSpheres3D")
    robot = get_robot("RobotPanda", **robot_kwargs)
    H = 16
    cost = CostCollision(
        robot, H, field=env.objects, sigma_coll=1.0, cutoff_margin=0.03
    )
    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(
        key, (3, H, 7), minval=robot.q_min, maxval=robot.q_max
    )
    dq = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (3, H, 7))
    x_phys = jnp.concatenate([q, dq], axis=-1)
    return robot, cost, x_phys, num_interp


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_panda_collision_grad_matches_autodiff():
    from mpd_tpu.world.task import interpolate_points

    robot, cost, x_phys, num_interp = _panda_collision_setup()

    def total_cost(x):
        return jnp.sum(cost(x, interpolate_points(x, num_interp)))

    ref = jax.grad(total_cost)(x_phys)
    fused_fn = cost.make_fused_interp_gradient(num_interp, interpret=True)
    assert fused_fn is not None
    fused = fused_fn(x_phys)

    assert fused.shape == x_phys.shape
    # velocity slice of the collision gradient is exactly zero
    np.testing.assert_array_equal(np.asarray(fused[..., 7:]), 0.0)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-6
    )
    # the cost actually has active hinge terms (test isn't vacuously 0 == 0)
    assert float(jnp.abs(ref).max()) > 0


def test_panda_collision_grad_density3_matches_autodiff():
    """Kernel parity at the denser 3-spheres-per-segment collision model
    (RobotPanda(n_spheres_per_segment=3)): the scalar FK/backward helpers
    and the kernel must honor the robot's fraction tuple, not the default."""
    from mpd_tpu.world.task import interpolate_points

    robot, cost, x_phys, num_interp = _panda_collision_setup(
        n_spheres_per_segment=3
    )
    assert len(robot.collision_sphere_radii) == 3 * 7 + 1

    def total_cost(x):
        return jnp.sum(cost(x, interpolate_points(x, num_interp)))

    ref = jax.grad(total_cost)(x_phys)
    fused_fn = cost.make_fused_interp_gradient(num_interp, interpret=True)
    assert fused_fn is not None
    fused = fused_fn(x_phys)
    # atol looser than the density-2 test: 22 spheres accumulate ~2e-5 of
    # f32 roundoff against grads of magnitude ~3 (verified: identical math,
    # max |err| 1.7e-5 at 5e-6 relative)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=5e-5
    )
    assert float(jnp.abs(ref).max()) > 0


def test_guide_fused_collision_matches_autodiff_guide():
    """Full guide parity: fused_collision='interpret' vs 'off' (jax.grad),
    including per-term norm clipping, endpoint zeroing and GP term."""
    from mpd_tpu.costs.cost_functions import CostComposite, CostGPTrajectory
    from mpd_tpu.costs.guide import GuideTrajectoriesWithVelocity

    robot, cost_coll, x_phys, num_interp = _panda_collision_setup()
    H = x_phys.shape[-2]
    composite = CostComposite(
        robot, H,
        [cost_coll, CostGPTrajectory(robot, H, dt=5.0 / H)],
        weights_cost_l=[1e-2, 1e-7],
    )

    def make_guide(mode):
        return GuideTrajectoriesWithVelocity(
            unnormalize_fn=lambda x: x * 0.5 + 0.1,  # affine stand-in
            cost=composite,
            clip_grad=True,
            interpolate_trajectories_for_collision=True,
            num_interpolated_points_for_collision=num_interp,
            fused_collision=mode,
        )

    g_ref = make_guide("off")
    g_fused = make_guide("interpret")
    assert g_fused._fused_grads, "kernel path not built"

    x_norm = (x_phys - 0.1) / 0.5
    upd_ref = g_ref(x_norm)
    upd_fused = g_fused(x_norm)
    np.testing.assert_allclose(
        np.asarray(upd_fused), np.asarray(upd_ref), rtol=1e-4, atol=1e-6
    )


def test_pointmass_small_batch_gate_uses_autodiff_path():
    """Below min_batch the returned fn traces the jax.grad path (same
    values, no pallas_call in the jaxpr); at/above it, the kernel."""
    robot, cost, x_phys, num_interp = _pointmass_collision_setup("EnvDense2D")
    fn = cost.make_fused_interp_gradient(num_interp, interpret=True)
    jaxpr_small = str(jax.make_jaxpr(fn)(x_phys))
    assert "pallas_call" not in jaxpr_small  # B=5 < 128 -> autodiff
    x_big = jnp.broadcast_to(x_phys[:1], (128,) + x_phys.shape[1:])
    jaxpr_big = str(jax.make_jaxpr(fn)(x_big))
    assert "pallas_call" in jaxpr_big


def test_fused_collision_unsupported_field_falls_back():
    """Panda in a 3D field with active boxes -> outside panda-kernel
    coverage (sphere-only) and outside pointmass coverage (robot/dim) ->
    make_fused_interp_gradient returns None and the guide silently keeps
    the autodiff path."""
    from mpd_tpu.world.robots import get_robot
    from mpd_tpu.world.primitives import make_object_set
    from mpd_tpu.costs.cost_functions import CostCollision

    robot = get_robot("RobotPanda")
    field = make_object_set(
        boxes=[((0.4, 0.0, 0.4), (0.1, 0.1, 0.1))], ws_dim=3
    )
    cost = CostCollision(robot, 16, field=field)
    assert cost.make_fused_interp_gradient(32, interpret=True) is None


# ---------------------------------------------------------------------------
# 2D point-mass collision-guide megakernel (kernels/pointmass_guide.py)
# ---------------------------------------------------------------------------

def _pointmass_collision_setup(env_name, num_interp=64):
    from mpd_tpu.world.envs import get_env
    from mpd_tpu.world.robots import get_robot
    from mpd_tpu.costs.cost_functions import CostCollision

    env = get_env(env_name, use_extra_objects=True)
    robot = get_robot("RobotPointMass")
    H = 16
    cost = CostCollision(
        robot, H, field=env.objects, sigma_coll=1.0, cutoff_margin=0.05
    )
    q = jax.random.uniform(
        jax.random.PRNGKey(0), (5, H, 2), minval=-1.0, maxval=1.0
    )
    dq = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (5, H, 2))
    x_phys = jnp.concatenate([q, dq], axis=-1)
    return robot, cost, x_phys, num_interp


@pytest.mark.parametrize(
    "env_name", ["EnvSimple2D", "EnvDense2D", "EnvNarrowPassageDense2D"]
)
def test_pointmass_collision_grad_matches_autodiff(env_name):
    """Sphere + box SDF gradients (incl. box-interior subgradients) vs
    jax.grad through sdf_object_set on all three 2D tasks."""
    from mpd_tpu.world.task import interpolate_points

    robot, cost, x_phys, num_interp = _pointmass_collision_setup(env_name)

    def total_cost(x):
        return jnp.sum(cost(x, interpolate_points(x, num_interp)))

    ref = jax.grad(total_cost)(x_phys)
    # min_batch=1: force the kernel past its small-batch gate (B=5 here)
    fused_fn = cost.make_fused_interp_gradient(
        num_interp, interpret=True, min_batch=1
    )
    assert fused_fn is not None
    fused = fused_fn(x_phys)

    assert fused.shape == x_phys.shape
    np.testing.assert_array_equal(np.asarray(fused[..., 2:]), 0.0)
    # matmul-form interpolation vs gather+lerp: f32 accumulation-order
    # noise up to ~2e-5 on O(0.01-1) gradients
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-3, atol=2e-5
    )
    assert float(jnp.abs(ref).max()) > 0


def test_pointmass_box_interior_gradient():
    """Points inside a box: outside-term zero subgradient + interior
    argmax-dim sign gradient, vs autodiff."""
    from mpd_tpu.world.robots import get_robot
    from mpd_tpu.world.primitives import make_object_set
    from mpd_tpu.costs.cost_functions import CostCollision
    from mpd_tpu.world.task import interpolate_points

    robot = get_robot("RobotPointMass")
    field = make_object_set(boxes=[((0.0, 0.0), (0.3, 0.2))], ws_dim=2)
    H, N = 16, 32
    cost = CostCollision(robot, H, field=field, cutoff_margin=0.05)
    # trajectories crossing straight through the box interior
    q = jnp.stack(
        [
            jnp.linspace(-0.8, 0.8, H)[:, None] * jnp.ones((H, 2)) * 0.5,
            jnp.stack(
                [jnp.linspace(-0.25, 0.25, H), jnp.linspace(0.15, -0.15, H)],
                axis=-1,
            ),
        ]
    )
    x = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)

    def total_cost(xx):
        return jnp.sum(cost(xx, interpolate_points(xx, N)))

    ref = jax.grad(total_cost)(x)
    fused = cost.make_fused_interp_gradient(N, interpret=True, min_batch=1)(x)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-6
    )
    assert float(jnp.abs(ref).max()) > 0


def test_panda_prune_reach_bound_is_sound():
    """The kernel's static (sphere, obstacle) pruning rests on the
    triangle-inequality reach bound Rmax_s >= max_q ||center_s(q)||
    (kernels/panda_guide.py r4). Sample the joint box densely and assert
    no sphere center ever exceeds its bound; also check the bound's
    derivation quantities stay in sync with the robot's sphere layout."""
    from mpd_tpu.world.robots import _PANDA_DH, RobotPanda

    robot = RobotPanda()
    trans = [float(np.hypot(a, d)) for a, d, _ in np.asarray(_PANDA_DH)]
    r_orig = [0.0]
    for t in trans:
        r_orig.append(r_orig[-1] + t)
    rmax = []
    for u in robot.segment_fractions:
        for seg in range(7):
            rmax.append((1.0 - u) * r_orig[seg + 1] + u * r_orig[seg + 2])
    rmax.append(r_orig[8])
    rmax = np.asarray(rmax)
    assert rmax.shape == (len(robot.collision_sphere_radii),)

    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(
        key, (4096, 7),
        minval=jnp.asarray(robot.q_min), maxval=jnp.asarray(robot.q_max),
    )
    centers = np.asarray(robot.collision_sphere_positions(q))  # [B, S, 3]
    norms = np.linalg.norm(centers, axis=-1)  # [B, S]
    assert (norms.max(axis=0) <= rmax + 1e-5).all(), (
        norms.max(axis=0), rmax
    )


def test_panda_prune_keeps_gradient_exact_near_threshold():
    """Pruned kernel vs autodiff on configurations biased toward the
    workspace boundary (outstretched arm), where a too-tight reach bound
    would show up as a missing hinge contribution."""
    from mpd_tpu.costs.cost_functions import CostCollision
    from mpd_tpu.world import get_env, get_robot
    from mpd_tpu.world.task import interpolate_points

    env = get_env("EnvSpheres3D")
    robot = get_robot("RobotPanda")
    cost = CostCollision(robot, 16, field=env.objects, sigma_coll=1.0,
                         cutoff_margin=0.05)
    # near-zero q2/q4/q6 stretches the arm toward max reach
    rng = np.random.RandomState(1)
    q = rng.uniform(-0.15, 0.15, (24, 16, 7)).astype(np.float32)
    q[..., 1] += 1.2  # shoulder forward, EE sweeping the outer shell
    q = np.clip(q, np.asarray(robot.q_min) + 1e-3,
                np.asarray(robot.q_max) - 1e-3)
    x = jnp.concatenate(
        [jnp.asarray(q), jnp.zeros((24, 16, 7), jnp.float32)], axis=-1
    )

    def total_cost(xx):
        return jnp.sum(cost(xx, interpolate_points(xx, 64)))

    ref = jax.grad(total_cost)(x)
    fused_fn = cost.make_fused_interp_gradient(64, interpret=True, min_batch=1)
    fused = fused_fn(x)
    assert float(jnp.abs(ref).max()) > 0
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)


def test_panda_full_guide_matches_composed():
    """The full guide-step megakernel (make_panda_guide_update via
    GuideTrajectoriesWithVelocity(normalizer=...)) must reproduce the
    composed path — unnormalize -> collision+GP grads -> per-term
    norm-clip -> endpoint zeroing -> -sum(w*g) — on the production Panda
    composite, including traced weight overrides."""
    from mpd_tpu.costs.cost_functions import (
        CostCollision,
        CostComposite,
        CostGPTrajectory,
    )
    from mpd_tpu.costs.guide import GuideTrajectoriesWithVelocity
    from mpd_tpu.data.normalization import LimitsNormalizer
    from mpd_tpu.world import get_env, get_robot

    env = get_env("EnvSpheres3D")
    robot = get_robot("RobotPanda")
    H = 16
    dt = 5.0 / H
    vlim = 2.5 * np.ones(7)
    norm = LimitsNormalizer(
        mins=jnp.asarray(np.concatenate([np.asarray(robot.q_min), -vlim]),
                         jnp.float32),
        maxs=jnp.asarray(np.concatenate([np.asarray(robot.q_max), vlim]),
                         jnp.float32),
    )
    cost = CostComposite(
        robot, H,
        [
            CostCollision(robot, H, field=env.objects, sigma_coll=1.0,
                          cutoff_margin=0.05),
            CostGPTrajectory(robot, H, dt, sigma_gp=1.0),
        ],
        weights_cost_l=[5e-2, 1e-7],
    )
    kw = dict(
        unnormalize_fn=norm.unnormalize, cost=cost, clip_grad=True,
        interpolate_trajectories_for_collision=True,
        num_interpolated_points_for_collision=64,
    )
    g_full = GuideTrajectoriesWithVelocity(
        **kw, fused_collision="interpret", normalizer=norm
    )
    assert g_full._full_guide is not None
    # composed path with the collision KERNEL (the production TPU chain
    # before r4) — the tight-parity reference
    g_comp = GuideTrajectoriesWithVelocity(**kw, fused_collision="interpret")
    assert g_comp._full_guide is None and 0 in g_comp._fused_grads
    # composed path on pure autodiff — looser: the collision kernel's
    # known argmin-tie / hinge-boundary deltas vs autodiff pass through
    g_auto = GuideTrajectoriesWithVelocity(**kw, fused_collision="off")

    x = jax.random.uniform(jax.random.PRNGKey(3), (12, H, 14),
                           minval=-1.1, maxval=1.1)  # incl. out-of-range
    out_full = np.asarray(g_full(x))
    out_comp = np.asarray(g_comp(x))
    assert float(np.abs(out_comp).max()) > 0
    np.testing.assert_allclose(out_full, out_comp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_full, np.asarray(g_auto(x)),
                               rtol=1e-3, atol=1e-4)
    # endpoint rows exactly zero
    np.testing.assert_array_equal(out_full[:, 0], 0.0)
    np.testing.assert_array_equal(out_full[:, -1], 0.0)

    # traced weight override rides through the SMEM operand
    w2 = jnp.asarray([3e-2, 1e-6])
    np.testing.assert_allclose(
        np.asarray(g_full(x, weights=w2)),
        np.asarray(g_comp(x, weights=w2)), rtol=1e-4, atol=1e-5,
    )


def test_panda_full_guide_shard_mapped_matches_single():
    """The full guide megakernel composes with the mesh exactly like the
    collision kernel: shard_mapped over the candidate axis, per-device
    instances, same values as the unsharded call."""
    from mpd_tpu.costs.cost_functions import (
        CostCollision,
        CostComposite,
        CostGPTrajectory,
    )
    from mpd_tpu.costs.guide import GuideTrajectoriesWithVelocity
    from mpd_tpu.data.normalization import LimitsNormalizer
    from mpd_tpu.parallel import make_mesh
    from mpd_tpu.world import get_env, get_robot

    env = get_env("EnvSpheres3D")
    robot = get_robot("RobotPanda")
    H = 16
    vlim = 2.5 * np.ones(7)
    norm = LimitsNormalizer(
        mins=jnp.asarray(np.concatenate([np.asarray(robot.q_min), -vlim]),
                         jnp.float32),
        maxs=jnp.asarray(np.concatenate([np.asarray(robot.q_max), vlim]),
                         jnp.float32),
    )
    cost = CostComposite(
        robot, H,
        [
            CostCollision(robot, H, field=env.objects, sigma_coll=1.0,
                          cutoff_margin=0.05),
            CostGPTrajectory(robot, H, 5.0 / H, sigma_gp=1.0),
        ],
        weights_cost_l=[5e-2, 1e-7],
    )
    kw = dict(
        unnormalize_fn=norm.unnormalize, cost=cost, clip_grad=True,
        interpolate_trajectories_for_collision=True,
        num_interpolated_points_for_collision=32,
        fused_collision="interpret", normalizer=norm,
    )
    g1 = GuideTrajectoriesWithVelocity(**kw)
    gm = GuideTrajectoriesWithVelocity(**kw, mesh=make_mesh(8))
    assert g1._full_guide is not None and gm._full_guide is not None
    x = jax.random.uniform(jax.random.PRNGKey(5), (16, H, 14),
                           minval=-1.0, maxval=1.0)
    np.testing.assert_allclose(
        np.asarray(gm(x)), np.asarray(g1(x)), rtol=1e-5, atol=1e-7
    )


def test_pointmass_full_guide_matches_composed():
    """2D analogue of test_panda_full_guide_matches_composed: the full
    guide-step megakernel vs the composed path (collision kernel + XLA
    wrapper) and vs pure autodiff, on the Dense2D sphere+box field."""
    from mpd_tpu.costs.cost_functions import (
        CostCollision,
        CostComposite,
        CostGPTrajectory,
    )
    from mpd_tpu.costs.guide import GuideTrajectoriesWithVelocity
    from mpd_tpu.data.normalization import LimitsNormalizer
    from mpd_tpu.world import get_env, get_robot

    env = get_env("EnvDense2D", use_extra_objects=True)
    robot = get_robot("RobotPointMass")
    H = 16
    norm = LimitsNormalizer(
        mins=jnp.asarray([-1.0, -1.0, -2.5, -2.5]),
        maxs=jnp.asarray([1.0, 1.0, 2.5, 2.5]),
    )
    cost = CostComposite(
        robot, H,
        [
            CostCollision(robot, H, field=env.objects, sigma_coll=1.0,
                          cutoff_margin=0.05),
            CostGPTrajectory(robot, H, 5.0 / H, sigma_gp=1.0),
        ],
        weights_cost_l=[3e-2, 1e-7],
    )
    kw = dict(
        unnormalize_fn=norm.unnormalize, cost=cost, clip_grad=True,
        interpolate_trajectories_for_collision=True,
        num_interpolated_points_for_collision=64,
    )
    g_full = GuideTrajectoriesWithVelocity(
        **kw, fused_collision="interpret", normalizer=norm
    )
    assert g_full._full_guide is not None
    g_comp = GuideTrajectoriesWithVelocity(**kw, fused_collision="interpret")
    g_auto = GuideTrajectoriesWithVelocity(**kw, fused_collision="off")

    x = jax.random.uniform(jax.random.PRNGKey(9), (12, H, 4),
                           minval=-1.1, maxval=1.1)
    out_full = np.asarray(g_full(x))
    out_comp = np.asarray(g_comp(x))
    assert float(np.abs(out_comp).max()) > 0
    np.testing.assert_allclose(out_full, out_comp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_full, np.asarray(g_auto(x)),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(out_full[:, 0], 0.0)
    np.testing.assert_array_equal(out_full[:, -1], 0.0)


def test_pointmass_full_guide_always_on():
    """The 2D FULL guide kernel has no small-batch gate (min_batch 1):
    on-chip it beats the composed path at every measured batch size
    (B=8/25/50, r4) — the fused wrapper outweighs the per-program
    overhead that gates the bare-collision kernel at B=128."""
    from mpd_tpu.kernels.pointmass_guide import make_pointmass_guide_update
    from mpd_tpu.world import get_env, get_robot

    env = get_env("EnvDense2D")
    robot = get_robot("RobotPointMass")
    fn = make_pointmass_guide_update(
        robot, env.objects, margin=0.05, sigma=1.0,
        normalizer_mins=np.asarray([-1.0, -1.0, -2.5, -2.5], np.float32),
        normalizer_maxs=np.asarray([1.0, 1.0, 2.5, 2.5], np.float32),
        dt=5.0 / 16, interpret=True,
    )
    assert fn is not None and fn.min_batch == 1


def test_panda_full_guide_pack2_bitwise_matches_pack1():
    """The r5 lane-packed full-guide kernel (pack=2: two trajectories per
    128-lane VPU tile at H = num_interp = 64 — the layout that makes the
    interp-64 work reduction real instead of lane padding) must be
    BITWISE identical to the plain layout: same per-trajectory math, same
    tree-min merge order, block-diagonal matmuls whose rows contain the
    same nonzeros. Covers even/odd batch sizes (padding) and traced
    weight values."""
    from mpd_tpu.kernels.panda_guide import make_panda_guide_update
    from mpd_tpu.world import get_env, get_robot

    env = get_env("EnvSpheres3D")
    robot = get_robot("RobotPanda")
    vlim = 2.5 * np.ones(7)
    mins = np.concatenate([np.asarray(robot.q_min), -vlim]).astype(np.float32)
    maxs = np.concatenate([np.asarray(robot.q_max), vlim]).astype(np.float32)
    kw = dict(margin=0.05, sigma=1.0, normalizer_mins=mins,
              normalizer_maxs=maxs, dt=5.0 / 64, sigma_gp=1.0,
              num_interp=64, interpret=True)
    f1 = make_panda_guide_update(robot, env.objects, pack=1, **kw)
    f2 = make_panda_guide_update(robot, env.objects, pack=2, **kw)
    # auto rule: H == num_interp == 64 -> pack 2 (exercised via pack=None)
    f_auto = make_panda_guide_update(robot, env.objects, **kw)
    w = jnp.asarray([5e-2, 1e-7])
    for B in (24, 7):
        x = jax.random.uniform(jax.random.PRNGKey(B), (B, 64, 14),
                               minval=-1.0, maxval=1.0)
        a = np.asarray(f1(x, w))
        np.testing.assert_array_equal(a, np.asarray(f2(x, w)))
        np.testing.assert_array_equal(a, np.asarray(f_auto(x, w)))
    # a different traced weight setting stays exact too
    w2 = jnp.asarray([3e-2, 2e-7])
    x = jax.random.uniform(jax.random.PRNGKey(3), (8, 64, 14),
                           minval=-1.0, maxval=1.0)
    np.testing.assert_array_equal(
        np.asarray(f1(x, w2)), np.asarray(f2(x, w2))
    )
