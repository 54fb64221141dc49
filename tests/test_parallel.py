"""Sharding tests on the virtual 8-device CPU mesh, exercising the
PRODUCTION classes: Trainer(mesh=...) data-parallel training and
MotionPlanner(mesh=...) candidate-sharded planning must agree with their
single-device runs (SURVEY.md section 4 item 4, section 5.2
determinism-across-shardings)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpd_tpu.data import TrajectoryDataset
from mpd_tpu.diffusion import SamplerConfig, make_schedule, run_sampling
from mpd_tpu.nets.temporal_unet import TemporalUnet
from mpd_tpu.parallel import make_mesh, shard_batch
from mpd_tpu.planner import MotionPlanner, PlannerConfig
from mpd_tpu.train import TrainConfig, Trainer


def _toy_trajs(n=64, H=16):
    rng = np.random.RandomState(0)
    u = np.linspace(0, 1, H)[None, :, None]
    a = rng.uniform(-0.9, -0.5, (n, 1, 2))
    b = rng.uniform(0.5, 0.9, (n, 1, 2))
    pos = a * (1 - u) + b * u
    vel = np.gradient(pos, 5.0 / H, axis=1)
    return np.concatenate([pos, vel], axis=-1).astype(np.float32)


def _toy_dataset():
    return TrajectoryDataset(
        base_dir="unused",
        trajectories=_toy_trajs(),
        env_id="EnvSimple2D",
        robot_id="RobotPointMass",
        include_velocity=True,
    )


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    H, D = 16, 4
    net = TemporalUnet(state_dim=D, n_support_points=H, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, H, D)), jnp.zeros((2,), jnp.int32))
    sched = make_schedule("exponential", 25)
    return net, params, sched, H, D


def test_sharded_sampling_matches_single_device(setup):
    net, params, sched, H, D = setup
    B = 16
    eps_fn = lambda x, t: net.apply(params, x, t)
    conds_host = {
        0: jnp.tile(jnp.asarray([0.5, 0.5, 0.0, 0.0]), (B, 1)),
        H - 1: jnp.tile(jnp.asarray([-0.5, -0.5, 0.0, 0.0]), (B, 1)),
    }
    cfg = SamplerConfig(n_extra_steps=3, t_start_guide=-(10**9))

    def query(key, conds):
        return run_sampling(sched, eps_fn, key, (B, H, D), conds, cfg)

    x_single = jax.jit(query)(jax.random.PRNGKey(0), conds_host)

    mesh = make_mesh(8)
    conds_sharded = shard_batch(mesh, conds_host)
    x_sharded = jax.jit(query)(jax.random.PRNGKey(0), conds_sharded)

    # tiny fusion/reduction-order differences across shardings are expected
    np.testing.assert_allclose(
        np.asarray(x_single), np.asarray(x_sharded), rtol=2e-3, atol=1e-4
    )


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_trainer_dp_matches_single_device(setup):
    """The PRODUCTION Trainer's scan-fused step, run data-parallel on the
    mesh, must reproduce the single-device trajectory (same seeds, same
    batch indices — only the layout differs)."""
    trajs = _toy_trajs(n=64)
    cfg = TrainConfig(batch_size=16, lr=1e-3, steps_til_summary=10**9)

    def build(mesh):
        net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2))
        return Trainer(net, make_schedule("exponential", 25), trajs, cfg, seed=0, mesh=mesh)

    t_single = build(None)
    t_dp = build(make_mesh(8))

    h_single = t_single.fit(num_steps=30, key=jax.random.PRNGKey(3), steps_per_call=10, log_every=10)
    h_dp = t_dp.fit(num_steps=30, key=jax.random.PRNGKey(3), steps_per_call=10, log_every=10)

    assert h_single["train_loss"][-1] == pytest.approx(h_dp["train_loss"][-1], rel=2e-3)
    # Adam divides by sqrt(v): reduction-order noise in the psum'd grads gets
    # amplified near-zero — compare against the update scale (lr=1e-3)
    for a, b in zip(jax.tree.leaves(t_single.state.params), jax.tree.leaves(t_dp.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)
    # EMA stayed in sync too (hard-copy regime at these step counts)
    for a, b in zip(jax.tree.leaves(t_single.state.ema_params), jax.tree.leaves(t_dp.state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_motion_planner_sharded_matches_single_device(setup):
    """The PRODUCTION MotionPlanner with mesh= shards the candidate axis;
    results (trajectories, free mask, on-device best index) must match the
    single-device query."""
    net, _, sched, H, D = setup
    ds = _toy_dataset()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, H, D)), jnp.zeros((2,), jnp.int32))
    eps_fn = lambda p, x, t: net.apply(p, x, t)
    cfg = PlannerConfig(n_samples=16)

    plan_args = (jax.random.PRNGKey(1), jnp.asarray([-0.7, -0.7]), jnp.asarray([0.7, 0.7]))
    res_single = MotionPlanner(ds, sched, eps_fn, cfg, params=params).plan(*plan_args)
    res_shard = MotionPlanner(ds, sched, eps_fn, cfg, params=params, mesh=make_mesh(8)).plan(*plan_args)

    np.testing.assert_allclose(
        res_single.trajs_final, res_shard.trajs_final, rtol=2e-3, atol=1e-4
    )
    np.testing.assert_array_equal(res_single.free_mask, res_shard.free_mask)
    assert res_single.success == res_shard.success
    if res_single.success:
        assert res_single.idx_best == res_shard.idx_best
        assert res_single.cost_best == pytest.approx(res_shard.cost_best, rel=1e-3)
        assert res_single.variance_waypoints == pytest.approx(
            res_shard.variance_waypoints, rel=1e-3
        )


def test_shard_map_batch0_pads_non_divisible_batch(setup):
    """shard_map requires the mapped axis divisible by the mesh size;
    shard_map_batch0 pads inside the traced program and slices the pad
    rows off, so callers can pass any batch (and leading dims are
    flattened/restored)."""
    from mpd_tpu.parallel.mesh import shard_map_batch0

    mesh = make_mesh(8)
    fn = lambda x: 2.0 * x + 1.0  # per-row elementwise: pad rows harmless
    wrapped = shard_map_batch0(fn, mesh)
    for shape in ((10, 4, 3), (16, 4, 3), (2, 5, 4, 3)):
        x = jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(shape)
        out = jax.jit(wrapped)(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(fn(x)), rtol=1e-6)
        assert out.shape == shape


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_motion_planner_mesh_fused_guide_matches_autodiff(setup):
    """The Pallas guide megakernel composes with mesh sharding (VERDICT r2
    weak #1): under MotionPlanner(mesh=...) the kernel runs shard_mapped
    over the candidate axis (parallel.shard_map_batch0). The fused-guide
    mesh query must match both the autodiff-guide mesh query and the
    fused single-device query."""
    net, _, sched, H, D = setup
    ds = _toy_dataset()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, H, D)), jnp.zeros((2,), jnp.int32))
    eps_fn = lambda p, x, t: net.apply(p, x, t)
    plan_args = (jax.random.PRNGKey(7), jnp.asarray([-0.7, -0.7]), jnp.asarray([0.7, 0.7]))
    mesh = make_mesh(8)

    def run(fused, use_mesh):
        cfg = PlannerConfig(n_samples=16, fused_collision_guide=fused)
        return MotionPlanner(
            ds, sched, eps_fn, cfg, params=params,
            mesh=mesh if use_mesh else None,
        ).plan(*plan_args)

    res_fused_mesh = run("interpret", True)
    # the fused path must actually be live on the mesh (not silently off)
    cfg = PlannerConfig(n_samples=16, fused_collision_guide="interpret")
    pl_mesh = MotionPlanner(ds, sched, eps_fn, cfg, params=params, mesh=mesh)
    assert pl_mesh.guide._fused_grads, "fused guide disabled under mesh"

    res_auto_mesh = run("off", True)
    res_fused_single = run("interpret", False)
    for other in (res_auto_mesh, res_fused_single):
        np.testing.assert_allclose(
            res_fused_mesh.trajs_final, other.trajs_final, rtol=2e-3, atol=1e-4
        )
        np.testing.assert_array_equal(res_fused_mesh.free_mask, other.free_mask)
        assert res_fused_mesh.success == other.success


def test_ddim_sampler_runs_and_pins(setup):
    from mpd_tpu.diffusion import run_ddim_sampling

    net, params, sched, H, D = setup
    B = 4
    eps_fn = lambda x, t: net.apply(params, x, t)
    conds = {0: jnp.zeros((B, D)), H - 1: jnp.ones((B, D)) * 0.3}
    x, chain = jax.jit(
        lambda k: run_ddim_sampling(
            sched, eps_fn, k, (B, H, D), conds,
            SamplerConfig(t_start_guide=-(10**9)), return_chain=True,
        )
    )(jax.random.PRNGKey(0))
    assert x.shape == (B, H, D)
    assert chain.shape[0] == 7  # init + 5 pairs + final x0 step
    np.testing.assert_allclose(np.asarray(x[:, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x[:, -1]), 0.3, atol=1e-6)
    assert np.isfinite(np.asarray(x)).all()


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_ddim_extra_refine_steps_apply_guide(setup):
    """extra_refine_steps appends noiseless denoise+guide steps: the chain
    grows by that many entries, endpoints stay pinned, and a guide pulling
    toward a target brings the refined result strictly closer to it than
    the reference-faithful (0-step) DDIM output."""
    from mpd_tpu.diffusion import run_ddim_sampling

    net, params, sched, H, D = setup
    B = 4
    eps_fn = lambda x, t: net.apply(params, x, t)
    conds = {0: jnp.zeros((B, D)), H - 1: jnp.ones((B, D)) * 0.3}
    target = 0.2
    guide_fn = lambda x: -0.2 * (x - target)  # pull toward `target`
    cfg = SamplerConfig(n_guide_steps=3, t_start_guide=7)

    def run(k, refine):
        return run_ddim_sampling(
            sched, eps_fn, k, (B, H, D), conds, cfg, guide_fn=guide_fn,
            return_chain=True, extra_refine_steps=refine,
        )

    key = jax.random.PRNGKey(0)
    x0, chain0 = jax.jit(lambda k: run(k, 0))(key)
    x5, chain5 = jax.jit(lambda k: run(k, 5))(key)
    assert chain5.shape[0] == chain0.shape[0] + 5
    np.testing.assert_allclose(np.asarray(x5[:, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x5[:, -1]), 0.3, atol=1e-6)
    # same key => identical chains up to the refinement suffix
    np.testing.assert_allclose(
        np.asarray(chain5[: chain0.shape[0]]), np.asarray(chain0), atol=1e-6
    )
    interior = slice(1, H - 1)
    d0 = float(jnp.abs(x0[:, interior] - target).mean())
    d5 = float(jnp.abs(x5[:, interior] - target).mean())
    assert d5 < d0


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_ddim_chain_bounded_under_exponential_schedule(setup):
    """Regression: the production exponential schedule ends at beta=1.0, so
    alphas_cumprod[T-1] ~ 5e-10 and an unclamped predict_start_from_noise
    multiplies the first DDIM step by ~1/sqrt(acp) ~ 4e4 — the whole chain
    rides a divergent state (measured |x| ~ 1e2; guided == unguided ==
    garbage). clip_denoised (the default, as in the DDPM path's
    p_mean_variance) must keep every chain entry O(1);
    clip_denoised=False preserves the literal reference ddim_sample
    behavior (ref diffusion_model_base.py:184-259), divergent here."""
    from mpd_tpu.diffusion import run_ddim_sampling

    net, params, sched, H, D = setup
    B = 4
    eps_fn = lambda x, t: net.apply(params, x, t)
    conds = {0: jnp.zeros((B, D)), H - 1: jnp.ones((B, D)) * 0.3}

    def run(k, clip):
        return run_ddim_sampling(
            sched, eps_fn, k, (B, H, D), conds,
            SamplerConfig(t_start_guide=-(10**9), clip_denoised=clip),
            return_chain=True,
        )

    _, chain = jax.jit(lambda k: run(k, True))(jax.random.PRNGKey(0))
    # init entry is N(0,1) noise; every denoised entry must stay O(1)
    assert float(jnp.abs(chain[1:]).max()) < 3.0
    _, chain_ref = jax.jit(lambda k: run(k, False))(jax.random.PRNGKey(0))
    assert float(jnp.abs(chain_ref[1:]).max()) > 10.0  # documented divergence


def test_ddim_explicit_times_subsequence(setup):
    """ddim_times: an explicit (low-t-biased) timestep subsequence replaces
    the uniform linspace stride; 0 and T-1 are forced in, the chain has one
    entry per step pair plus the init, and endpoints stay pinned."""
    from mpd_tpu.diffusion import run_ddim_sampling

    net, params, sched, H, D = setup
    B = 4
    eps_fn = lambda x, t: net.apply(params, x, t)
    conds = {0: jnp.zeros((B, D)), H - 1: jnp.ones((B, D)) * 0.3}
    times = (1, 2, 4, 9)  # 0 and 24 forced in -> 6 times -> 6 pairs

    x, chain = jax.jit(
        lambda k: run_ddim_sampling(
            sched, eps_fn, k, (B, H, D), conds,
            SamplerConfig(t_start_guide=-(10**9)),
            return_chain=True, times=times,
        )
    )(jax.random.PRNGKey(0))
    assert chain.shape[0] == 7  # init + 6 pairs
    assert np.isfinite(np.asarray(x)).all()
    np.testing.assert_allclose(np.asarray(x[:, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x[:, -1]), 0.3, atol=1e-6)


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_ddim_eta_and_refine_noise(setup):
    """eta>0 adds DDPM-style posterior noise inside the DDIM steps, and
    refine_noise_std>0 adds exploration noise between the extra refine
    steps; both must change the output (vs their deterministic
    counterparts) while keeping it finite, bounded, and pinned."""
    from mpd_tpu.diffusion import run_ddim_sampling

    net, params, sched, H, D = setup
    B = 4
    eps_fn = lambda x, t: net.apply(params, x, t)
    conds = {0: jnp.zeros((B, D)), H - 1: jnp.ones((B, D)) * 0.3}
    cfg = SamplerConfig(t_start_guide=-(10**9))

    def run(k, eta=0.0, refine=0, rnoise=0.0):
        return run_ddim_sampling(
            sched, eps_fn, k, (B, H, D), conds, cfg,
            eta=eta, extra_refine_steps=refine, refine_noise_std=rnoise,
        )

    key = jax.random.PRNGKey(0)
    x_det = jax.jit(lambda k: run(k))(key)
    x_eta = jax.jit(lambda k: run(k, eta=1.0))(key)
    assert float(jnp.abs(x_eta - x_det).max()) > 1e-4
    x_r_det = jax.jit(lambda k: run(k, refine=3))(key)
    x_r_noise = jax.jit(lambda k: run(k, refine=3, rnoise=1.0))(key)
    assert float(jnp.abs(x_r_noise - x_r_det).max()) > 1e-6
    for x in (x_eta, x_r_noise):
        assert np.isfinite(np.asarray(x)).all()
        assert float(jnp.abs(x).max()) < 3.0
        np.testing.assert_allclose(np.asarray(x[:, 0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(x[:, -1]), 0.3, atol=1e-6)


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_ddim_refine_anneal_tail(setup):
    """refine_anneal_t>0: the tail re-noises to an annealed timestep and
    denoises there — output differs from the t=0-only tail, stays finite,
    bounded and pinned; two keys give different (exploring) outputs."""
    from mpd_tpu.diffusion import run_ddim_sampling

    net, params, sched, H, D = setup
    B = 4
    eps_fn = lambda x, t: net.apply(params, x, t)
    conds = {0: jnp.zeros((B, D)), H - 1: jnp.ones((B, D)) * 0.3}
    cfg = SamplerConfig(t_start_guide=-(10**9))

    def run(k, anneal):
        return run_ddim_sampling(
            sched, eps_fn, k, (B, H, D), conds, cfg,
            extra_refine_steps=4, refine_anneal_t=anneal,
        )

    key = jax.random.PRNGKey(0)
    x_plain = jax.jit(lambda k: run(k, 0))(key)
    x_ann = jax.jit(lambda k: run(k, 6))(key)
    assert float(jnp.abs(x_ann - x_plain).max()) > 1e-4
    x_ann2 = jax.jit(lambda k: run(k, 6))(jax.random.PRNGKey(1))
    assert float(jnp.abs(x_ann2 - x_ann).max()) > 1e-5
    for x in (x_ann, x_ann2):
        assert np.isfinite(np.asarray(x)).all()
        assert float(jnp.abs(x).max()) < 3.0
        np.testing.assert_allclose(np.asarray(x[:, 0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(x[:, -1]), 0.3, atol=1e-6)


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_plan_batch_sharded_matches_single_device(setup):
    """plan_batch (the multi-query serving path) under mesh=: the Q*B
    candidate axis is sharded, per-query argmin/take_along_axis must still
    agree with the unsharded program."""
    net, _, sched, H, D = setup
    ds = _toy_dataset()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, H, D)), jnp.zeros((2,), jnp.int32))
    eps_fn = lambda p, x, t: net.apply(p, x, t)
    cfg = PlannerConfig(n_samples=16)

    trs = np.asarray(ds.trajs)
    starts = jnp.asarray(trs[:2, 0, :2])
    goals = jnp.asarray(trs[:2, -1, :2])
    key = jax.random.PRNGKey(5)
    res_single = MotionPlanner(ds, sched, eps_fn, cfg, params=params).plan_batch(
        key, starts, goals
    )
    res_shard = MotionPlanner(
        ds, sched, eps_fn, cfg, params=params, mesh=make_mesh(8)
    ).plan_batch(key, starts, goals)

    for rs, rh in zip(res_single, res_shard):
        np.testing.assert_allclose(rs.trajs_final, rh.trajs_final, rtol=2e-3, atol=1e-4)
        np.testing.assert_array_equal(rs.free_mask, rh.free_mask)
        assert rs.success == rh.success
        if rs.success:
            assert rs.idx_best == rh.idx_best
            assert rs.cost_best == pytest.approx(rh.cost_best, rel=1e-3)
