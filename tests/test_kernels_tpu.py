"""Real-TPU Pallas regression: compile pallas_unet_apply through Mosaic on
the chip and assert parity with the flax forward (VERDICT r1 item 9 — the
CPU suite runs the kernels only in interpret mode, which hides lowering
breaks).

Run with: MPD_TPU_REAL=1 python -m pytest tests/test_kernels_tpu.py -q
(conftest.py skips its CPU forcing under MPD_TPU_REAL; the tests self-skip
on any non-TPU backend, so they are no-ops in the default CPU suite)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

if jax.default_backend() != "tpu":  # pragma: no cover - CPU suite path
    pytest.skip("requires a real TPU backend (run with MPD_TPU_REAL=1)",
                allow_module_level=True)

import jax.numpy as jnp

from mpd_tpu.nets.temporal_unet import TemporalUnet


def test_fused_unet_compiles_through_mosaic_and_matches_flax():
    from mpd_tpu.kernels import pallas_unet_apply

    B, H, D = 8, 64, 4
    mults = (1, 2, 4, 8)
    net = TemporalUnet(state_dim=D, n_support_points=H, unet_input_dim=32, dim_mults=mults)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, D))
    t = jnp.asarray(np.arange(B) % 25, jnp.int32)
    variables = net.init(jax.random.PRNGKey(1), x, t)

    ref = jax.jit(lambda v, x_, t_: net.apply(v, x_, t_))(variables, x, t)
    fused = jax.jit(
        lambda v, x_, t_: pallas_unet_apply(v, x_, t_, dim_mults=mults, block_b=8)
    )(variables, x, t)
    # bf16 conv multiplies on the TPU MXU: compare at bf16-scale tolerance
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=3e-2, atol=3e-2
    )
    assert np.isfinite(np.asarray(fused)).all()


def test_panda_collision_grad_compiles_through_mosaic_and_matches():
    from mpd_tpu.world.envs import get_env
    from mpd_tpu.world.robots import get_robot
    from mpd_tpu.world.task import interpolate_points
    from mpd_tpu.costs.cost_functions import CostCollision

    env = get_env("EnvSpheres3D")
    robot = get_robot("RobotPanda")
    B, H, num_interp = 100, 64, 128
    cost = CostCollision(robot, H, field=env.objects, sigma_coll=1.0,
                         cutoff_margin=0.03)
    q = jax.random.uniform(jax.random.PRNGKey(0), (B, H, 7),
                           minval=robot.q_min, maxval=robot.q_max)
    x = jnp.concatenate(
        [q, 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, H, 7))], -1)

    def total_cost(xx):
        return jnp.sum(cost(xx, interpolate_points(xx, num_interp)))

    ref = jax.jit(jax.grad(total_cost))(x)
    fused_fn = cost.make_fused_interp_gradient(num_interp)
    fused = jax.jit(fused_fn)(x)
    # HIGHEST-precision MXU dots are ~f32 but not bit-identical to the
    # gather+lerp path; measured max abs diff 1.5e-4 on grads of O(0.1-1)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-3, atol=3e-4)
    assert float(jnp.abs(np.asarray(ref)).max()) > 0


def test_pointmass_collision_grad_compiles_through_mosaic_and_matches():
    from mpd_tpu.world.envs import get_env
    from mpd_tpu.world.robots import get_robot
    from mpd_tpu.world.task import interpolate_points
    from mpd_tpu.costs.cost_functions import CostCollision

    env = get_env("EnvDense2D", use_extra_objects=True)
    robot = get_robot("RobotPointMass")
    B, H, num_interp = 512, 64, 128
    cost = CostCollision(robot, H, field=env.objects, sigma_coll=1.0,
                         cutoff_margin=0.05)
    q = jax.random.uniform(jax.random.PRNGKey(0), (B, H, 2),
                           minval=-1.0, maxval=1.0)
    x = jnp.concatenate(
        [q, 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, H, 2))], -1)

    def total_cost(xx):
        return jnp.sum(cost(xx, interpolate_points(xx, num_interp)))

    ref = jax.jit(jax.grad(total_cost))(x)
    fused_fn = cost.make_fused_interp_gradient(num_interp)
    fused = jax.jit(fused_fn)(x)
    # HIGHEST-precision MXU interpolation matmuls vs gather+lerp: f32
    # accumulation-order noise only
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-3, atol=3e-4)
    assert float(jnp.abs(np.asarray(ref)).max()) > 0


def test_panda_full_guide_compiles_through_mosaic_and_matches():
    """Mosaic-lowering regression for the FULL guide-step megakernel (r4):
    compile make_panda_guide_update on the chip and assert parity with the
    composed guide path (collision kernel + XLA wrapper) on the same
    backend."""
    from mpd_tpu.costs.cost_functions import (
        CostCollision,
        CostComposite,
        CostGPTrajectory,
    )
    from mpd_tpu.costs.guide import GuideTrajectoriesWithVelocity
    from mpd_tpu.data.normalization import LimitsNormalizer
    from mpd_tpu.world.envs import get_env
    from mpd_tpu.world.robots import get_robot

    env = get_env("EnvSpheres3D")
    robot = get_robot("RobotPanda")
    B, H = 128, 64
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
        num_interpolated_points_for_collision=128,
    )
    g_full = GuideTrajectoriesWithVelocity(**kw, fused_collision="on",
                                           normalizer=norm)
    assert g_full._full_guide is not None
    g_comp = GuideTrajectoriesWithVelocity(**kw, fused_collision="on")
    assert g_comp._full_guide is None and 0 in g_comp._fused_grads

    x = jax.random.uniform(jax.random.PRNGKey(3), (B, H, 14),
                           minval=-1.0, maxval=1.0)
    out_full = np.asarray(jax.jit(g_full)(x))
    out_comp = np.asarray(jax.jit(g_comp)(x))
    assert np.isfinite(out_full).all()
    assert float(np.abs(out_comp).max()) > 0
    np.testing.assert_allclose(out_full, out_comp, rtol=1e-3, atol=1e-4)


def test_pointmass_full_guide_compiles_through_mosaic_and_matches():
    """2D full guide-step megakernel Mosaic regression (see the Panda
    variant above for the methodology)."""
    from mpd_tpu.costs.cost_functions import (
        CostCollision,
        CostComposite,
        CostGPTrajectory,
    )
    from mpd_tpu.costs.guide import GuideTrajectoriesWithVelocity
    from mpd_tpu.data.normalization import LimitsNormalizer
    from mpd_tpu.world.envs import get_env
    from mpd_tpu.world.robots import get_robot

    env = get_env("EnvDense2D", use_extra_objects=True)
    robot = get_robot("RobotPointMass")
    B, H = 256, 64
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
        num_interpolated_points_for_collision=128,
    )
    g_full = GuideTrajectoriesWithVelocity(**kw, fused_collision="on",
                                           normalizer=norm)
    assert g_full._full_guide is not None
    g_comp = GuideTrajectoriesWithVelocity(**kw, fused_collision="on")

    x = jax.random.uniform(jax.random.PRNGKey(4), (B, H, 4),
                           minval=-1.0, maxval=1.0)
    out_full = np.asarray(jax.jit(g_full)(x))
    out_comp = np.asarray(jax.jit(g_comp)(x))
    assert np.isfinite(out_full).all()
    assert float(np.abs(out_comp).max()) > 0
    np.testing.assert_allclose(out_full, out_comp, rtol=1e-3, atol=1e-4)
