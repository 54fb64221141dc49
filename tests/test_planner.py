"""End-to-end planner tests on tiny shapes (both state conventions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpd_tpu.data import TrajectoryDataset
from mpd_tpu.diffusion import make_schedule
from mpd_tpu.nets.temporal_unet import TemporalUnet
from mpd_tpu.planner import MotionPlanner, PlannerConfig


def _toy_trajs(n=24, H=16):
    rng = np.random.RandomState(0)
    u = np.linspace(0, 1, H)[None, :, None]
    a = rng.uniform(-0.9, -0.5, (n, 1, 2))
    b = rng.uniform(0.5, 0.9, (n, 1, 2))
    pos = a * (1 - u) + b * u
    vel = np.gradient(pos, 5.0 / H, axis=1)
    return np.concatenate([pos, vel], axis=-1).astype(np.float32)


@pytest.mark.parametrize("include_velocity", [True, False])
def test_planner_runs_both_state_conventions(include_velocity):
    ds = TrajectoryDataset(
        base_dir="unused",
        trajectories=_toy_trajs(),
        env_id="EnvSimple2D",
        robot_id="RobotPointMass",
        include_velocity=include_velocity,
    )
    D = ds.state_dim
    assert D == (4 if include_velocity else 2)
    net = TemporalUnet(state_dim=D, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, D)), jnp.zeros((2,), jnp.int32))
    planner = MotionPlanner(
        ds, make_schedule("exponential", 25),
        lambda x, t: net.apply(params, x, t),
        PlannerConfig(n_samples=4),
    )
    tr0 = np.asarray(ds.trajs[0])
    res = planner.plan(jax.random.PRNGKey(1), jnp.asarray(tr0[0, :2]), jnp.asarray(tr0[-1, :2]))
    assert res.trajs_final.shape == (4, 16, D)
    assert np.isfinite(res.trajs_final).all()


def test_planner_ddim_variant():
    ds = TrajectoryDataset(
        base_dir="unused",
        trajectories=_toy_trajs(),
        env_id="EnvSimple2D",
        robot_id="RobotPointMass",
        include_velocity=True,
    )
    net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 4)), jnp.zeros((2,), jnp.int32))
    planner = MotionPlanner(
        ds, make_schedule("exponential", 25),
        lambda x, t: net.apply(params, x, t),
        PlannerConfig(n_samples=4, use_ddim=True),
    )
    tr0 = np.asarray(ds.trajs[0])
    res = planner.plan(jax.random.PRNGKey(1), jnp.asarray(tr0[0, :2]), jnp.asarray(tr0[-1, :2]))
    assert np.isfinite(res.trajs_final).all()


def test_planner_mpd_hybrid_guide_tail():
    """'mpd' with n_post_guide_steps appends that many pure-guide steps
    after the guided chain (the hybrid between 'mpd' and
    'diffusion_prior_then_guide'; VERDICT r3 #5): same chain prefix, tail
    changes the result, endpoints stay pinned, chain grows by the tail."""
    ds = TrajectoryDataset(
        base_dir="unused",
        trajectories=_toy_trajs(),
        env_id="EnvSimple2D",
        robot_id="RobotPointMass",
        include_velocity=True,
    )
    net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 4)), jnp.zeros((2,), jnp.int32))

    def make(n_post):
        return MotionPlanner(
            ds, make_schedule("exponential", 25),
            lambda x, t: net.apply(params, x, t),
            PlannerConfig(n_samples=4, n_guide_steps=2,
                          n_post_guide_steps=n_post),
        )

    tr0 = np.asarray(ds.trajs[0])
    s, g = jnp.asarray(tr0[0, :2]), jnp.asarray(tr0[-1, :2])
    r0 = make(0).plan(jax.random.PRNGKey(1), s, g, return_chain=True)
    r3 = make(3).plan(jax.random.PRNGKey(1), s, g, return_chain=True)
    assert r3.trajs_chain.shape[0] == r0.trajs_chain.shape[0] + 3
    # identical guided chain prefix (same key schedule), tail refines
    np.testing.assert_allclose(
        r3.trajs_chain[: r0.trajs_chain.shape[0]], r0.trajs_chain, atol=1e-5
    )
    assert not np.allclose(r3.trajs_final, r0.trajs_final)
    assert np.isfinite(r3.trajs_final).all()
    # hard conditions pinned through the tail
    sn = np.asarray(r3.trajs_final[:, 0, :2])
    gn = np.asarray(r3.trajs_final[:, -1, :2])
    np.testing.assert_allclose(sn, np.broadcast_to(np.asarray(s), sn.shape), atol=1e-4)
    np.testing.assert_allclose(gn, np.broadcast_to(np.asarray(g), gn.shape), atol=1e-4)


def test_guide_weight_sweep_shares_one_compile():
    """Guide weights are traced arguments of the compiled query: changing
    w_coll must change the result WITHOUT a recompile (weight sweeps /
    per-task tuning, ref README.md:84-88, reuse one program)."""
    ds = TrajectoryDataset(
        base_dir="unused",
        trajectories=_toy_trajs(),
        env_id="EnvSimple2D",
        robot_id="RobotPointMass",
        include_velocity=True,
    )
    net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 4)), jnp.zeros((2,), jnp.int32))
    planner = MotionPlanner(
        ds, make_schedule("exponential", 25),
        lambda p, x, t: net.apply(p, x, t),
        PlannerConfig(n_samples=4), params=params,
    )
    tr0 = np.asarray(ds.trajs[0])
    start, goal = jnp.asarray(tr0[0, :2]), jnp.asarray(tr0[-1, :2])

    r1 = planner.plan(jax.random.PRNGKey(1), start, goal)
    n_compiles = planner._query._cache_size()
    r2 = planner.plan(jax.random.PRNGKey(1), start, goal, guide_weights=[5e-2, 1e-7])
    r3 = planner.plan(jax.random.PRNGKey(1), start, goal, guide_weights=[0.0, 0.0])

    assert planner._query._cache_size() == n_compiles  # no retrace
    assert not np.allclose(r1.trajs_final, r2.trajs_final)
    # zero weights == unguided prior chain: guide contributes nothing
    r_prior = MotionPlanner(
        ds, make_schedule("exponential", 25),
        lambda p, x, t: net.apply(p, x, t),
        PlannerConfig(n_samples=4, planner_alg="diffusion_prior"), params=params,
    ).plan(jax.random.PRNGKey(1), start, goal)
    np.testing.assert_allclose(r3.trajs_final, r_prior.trajs_final, rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # >=19 s compile-heavy (fast loop: -m 'not slow')
def test_plan_batch_matches_single_query_and_pins():
    """plan_batch (the one-dispatch multi-query serving path) must agree
    exactly with plan() at Q=1 (identical program modulo the chain output)
    and produce pinned, finite per-query results at Q=3."""
    ds = TrajectoryDataset(
        base_dir="unused",
        trajectories=_toy_trajs(),
        env_id="EnvSimple2D",
        robot_id="RobotPointMass",
        include_velocity=True,
    )
    net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 4)), jnp.zeros((2,), jnp.int32))
    planner = MotionPlanner(
        ds, make_schedule("exponential", 25),
        lambda p, x, t: net.apply(p, x, t), params=params,
        config=PlannerConfig(n_samples=4),
    )
    trs = np.asarray(ds.trajs)
    key = jax.random.PRNGKey(7)

    # Q=1 exact equivalence with plan()
    res1 = planner.plan(key, jnp.asarray(trs[0][0, :2]), jnp.asarray(trs[0][-1, :2]))
    [resb] = planner.plan_batch(
        key, jnp.asarray(trs[0][None, 0, :2]), jnp.asarray(trs[0][None, -1, :2])
    )
    np.testing.assert_allclose(resb.trajs_final, res1.trajs_final, atol=1e-6)
    assert resb.success == res1.success
    np.testing.assert_array_equal(resb.free_mask, res1.free_mask)
    assert resb.fraction_free == pytest.approx(res1.fraction_free)
    assert resb.collision_intensity == pytest.approx(res1.collision_intensity, abs=1e-6)
    if res1.success:
        assert resb.idx_best == res1.idx_best
        assert resb.cost_best == pytest.approx(res1.cost_best, rel=1e-5)
        assert resb.variance_waypoints == pytest.approx(res1.variance_waypoints, rel=1e-5)

    # Q=3: shapes, finiteness, endpoint pinning per query
    starts = jnp.asarray(trs[:3, 0, :2])
    goals = jnp.asarray(trs[:3, -1, :2])
    results = planner.plan_batch(jax.random.PRNGKey(8), starts, goals)
    assert len(results) == 3
    for qi, r in enumerate(results):
        assert r.trajs_final.shape == (4, 16, 4)
        assert np.isfinite(r.trajs_final).all()
        np.testing.assert_allclose(
            r.trajs_final[:, 0, :2],
            np.broadcast_to(np.asarray(starts[qi]), (4, 2)), atol=1e-5,
        )
        np.testing.assert_allclose(
            r.trajs_final[:, -1, :2],
            np.broadcast_to(np.asarray(goals[qi]), (4, 2)), atol=1e-5,
        )

    # best-only serving mode: skips the [Q,B,H,D] transfer; the returned
    # single trajectory must equal the full-mode best candidate and every
    # scalar metric must be unchanged (same compiled program, same key)
    results_best = planner.plan_batch(
        jax.random.PRNGKey(8), starts, goals, return_all_trajs=False
    )
    for r_full, r_best in zip(results, results_best):
        assert r_best.trajs_final.shape == (1, 16, 4)
        if r_full.success:
            np.testing.assert_allclose(
                r_best.trajs_final[0],
                r_full.trajs_final[r_full.idx_best], atol=1e-6,
            )
            assert r_best.idx_best == 0
            assert r_best.cost_best == pytest.approx(r_full.cost_best, rel=1e-6)
        assert r_best.success == r_full.success
        np.testing.assert_array_equal(r_best.free_mask, r_full.free_mask)


def test_planner_respaced_variant_pins_and_differs_across_keys():
    """use_respaced runs the stochastic subsequence chain: endpoints pinned,
    finite output, distinct keys give distinct candidate sets (the lane's
    point vs deterministic DDIM), and combining with use_ddim raises."""
    ds = TrajectoryDataset(
        base_dir="unused",
        trajectories=_toy_trajs(),
        env_id="EnvSimple2D",
        robot_id="RobotPointMass",
        include_velocity=True,
    )
    net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 4)), jnp.zeros((2,), jnp.int32))
    planner = MotionPlanner(
        ds, make_schedule("exponential", 25),
        lambda p, x, t: net.apply(p, x, t), params=params,
        config=PlannerConfig(n_samples=4, use_respaced=True),
    )
    # 10 subsequence times, 3 of them (0,3,6) inside the t<7 guide window
    assert planner._run_schedule.n_steps == 10
    assert planner.sampler_cfg.t_start_guide == 3
    tr0 = np.asarray(ds.trajs[0])
    start, goal = jnp.asarray(tr0[0, :2]), jnp.asarray(tr0[-1, :2])
    r1 = planner.plan(jax.random.PRNGKey(1), start, goal)
    r2 = planner.plan(jax.random.PRNGKey(2), start, goal)
    assert np.isfinite(r1.trajs_final).all()
    np.testing.assert_allclose(
        r1.trajs_final[:, 0, :2], np.broadcast_to(np.asarray(start), (4, 2)), atol=1e-5
    )
    np.testing.assert_allclose(
        r1.trajs_final[:, -1, :2], np.broadcast_to(np.asarray(goal), (4, 2)), atol=1e-5
    )
    assert np.abs(r1.trajs_final - r2.trajs_final).max() > 1e-3

    with pytest.raises(ValueError):
        MotionPlanner(
            ds, make_schedule("exponential", 25),
            lambda p, x, t: net.apply(p, x, t), params=params,
            config=PlannerConfig(n_samples=4, use_respaced=True, use_ddim=True),
        )

    # plan_batch under the respaced chain (the Panda serving-default lane in
    # bench.py): Q=1 agrees exactly with plan(), Q=2 pins per query
    [rb] = planner.plan_batch(jax.random.PRNGKey(1), start[None], goal[None])
    np.testing.assert_allclose(rb.trajs_final, r1.trajs_final, atol=1e-6)
    assert rb.success == r1.success
    trs = np.asarray(ds.trajs)
    starts = jnp.asarray(trs[:2, 0, :2])
    goals = jnp.asarray(trs[:2, -1, :2])
    for qi, r in enumerate(planner.plan_batch(jax.random.PRNGKey(9), starts, goals)):
        assert np.isfinite(r.trajs_final).all()
        np.testing.assert_allclose(
            r.trajs_final[:, 0, :2],
            np.broadcast_to(np.asarray(starts[qi]), (4, 2)), atol=1e-5,
        )
        np.testing.assert_allclose(
            r.trajs_final[:, -1, :2],
            np.broadcast_to(np.asarray(goals[qi]), (4, 2)), atol=1e-5,
        )


def _toy_planner(ds, net_params=None, **cfg_kw):
    net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16,
                       dim_mults=(1, 2))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 4)),
                      jnp.zeros((2,), jnp.int32))
    return MotionPlanner(
        ds, make_schedule("exponential", 25),
        lambda p, x, t: net.apply(p, x, t), params=params,
        config=PlannerConfig(n_samples=4, **cfg_kw),
    )


def _toy_ds(**kw):
    return TrajectoryDataset(
        base_dir="unused", trajectories=_toy_trajs(),
        env_id="EnvSimple2D", robot_id="RobotPointMass",
        include_velocity=True, **kw,
    )


def test_post_guide_steps_none_sentinel_and_explicit_zero():
    """ADVICE r4: n_post_guide_steps=None means the variant default
    (reference full tail for prior_then_guide, no tail for mpd); an
    explicit 0 now requests a genuinely tail-free run for BOTH variants."""
    ds = _toy_ds()
    # prior_then_guide default: (7 + 5) * n_guide_steps tail
    p_def = _toy_planner(ds, planner_alg="diffusion_prior_then_guide",
                         n_guide_steps=2)
    assert p_def._n_post_steps == (7 + 5) * 2
    # explicit 0: tail-free prior_then_guide == plain diffusion_prior
    p_zero = _toy_planner(ds, planner_alg="diffusion_prior_then_guide",
                          n_guide_steps=2, n_post_guide_steps=0)
    assert p_zero._n_post_steps == 0
    p_prior = _toy_planner(ds, planner_alg="diffusion_prior")
    tr0 = np.asarray(ds.trajs[0])
    s, g = jnp.asarray(tr0[0, :2]), jnp.asarray(tr0[-1, :2])
    r_zero = p_zero.plan(jax.random.PRNGKey(1), s, g)
    r_prior = p_prior.plan(jax.random.PRNGKey(1), s, g)
    np.testing.assert_allclose(r_zero.trajs_final, r_prior.trajs_final,
                               rtol=1e-5, atol=1e-6)
    # mpd default stays tail-free
    assert _toy_planner(ds)._n_post_steps == 0


def test_post_guide_w_coll_ramp():
    """The linear w_coll multiplier ramp over the post-chain tail
    (VERDICT r4 #4): (1,1) reproduces the constant-weight tail exactly; a
    rising ramp changes the result, keeps endpoints pinned, and scales
    only the collision term (zero collision weight => ramp is a no-op)."""
    ds = _toy_ds()
    tr0 = np.asarray(ds.trajs[0])
    s, g = jnp.asarray(tr0[0, :2]), jnp.asarray(tr0[-1, :2])
    kw = dict(n_guide_steps=2, n_post_guide_steps=4)
    r_const = _toy_planner(ds, **kw).plan(jax.random.PRNGKey(1), s, g)
    r_one = _toy_planner(ds, post_guide_w_coll_ramp=(1.0, 1.0), **kw).plan(
        jax.random.PRNGKey(1), s, g)
    np.testing.assert_allclose(r_one.trajs_final, r_const.trajs_final,
                               rtol=1e-6, atol=1e-7)
    r_ramp = _toy_planner(ds, post_guide_w_coll_ramp=(0.0, 3.0), **kw).plan(
        jax.random.PRNGKey(1), s, g)
    assert not np.allclose(r_ramp.trajs_final, r_const.trajs_final)
    np.testing.assert_allclose(
        r_ramp.trajs_final[:, 0, :2],
        np.broadcast_to(np.asarray(s), (4, 2)), atol=1e-4)
    np.testing.assert_allclose(
        r_ramp.trajs_final[:, -1, :2],
        np.broadcast_to(np.asarray(g), (4, 2)), atol=1e-4)
    # with w_coll = 0 the ramp multiplies nothing: identical to constant
    p_a = _toy_planner(ds, post_guide_w_coll_ramp=(0.0, 3.0), **kw)
    p_b = _toy_planner(ds, **kw)
    ra = p_a.plan(jax.random.PRNGKey(1), s, g, guide_weights=[0.0, 1e-7])
    rb = p_b.plan(jax.random.PRNGKey(1), s, g, guide_weights=[0.0, 1e-7])
    np.testing.assert_allclose(ra.trajs_final, rb.trajs_final,
                               rtol=1e-6, atol=1e-7)


def _freeze_tail_setup(all_free=False):
    """Planner whose chain provably ends at a chosen target batch: the
    eps 'model' is the closure eps = (x - sqrt_acp*T) / sqrt_1macp, which
    makes every x0_hat prediction exactly T, so the (unguided) prior
    chain converges to T. Targets: candidates 0-1 follow a collision-free
    edge path around EnvSimple2D's obstacles, candidates 2-3 cut straight
    through the center sphere ((0,0), r=0.22) — a deterministic mixed
    free/colliding mask at tail entry."""
    ds = _toy_ds()
    H = 16
    s = np.array([-0.85, -0.85], np.float32)
    g = np.array([0.85, 0.85], np.float32)
    # edge path: s -> (0.85, -0.85) -> g (clearance >= 0.25 everywhere)
    half = H // 2
    u = np.linspace(0.0, 1.0, half, endpoint=False)[:, None]
    leg1 = s[None] * (1 - u) + np.array([0.85, -0.85])[None] * u
    v = np.linspace(0.0, 1.0, H - half)[:, None]
    leg2 = np.array([0.85, -0.85])[None] * (1 - v) + g[None] * v
    edge = np.concatenate([leg1, leg2], axis=0)  # [H, 2]
    # straight diagonal: passes through the center sphere
    w = np.linspace(0.0, 1.0, H)[:, None]
    diag = s[None] * (1 - w) + g[None] * w
    if all_free:
        pos = np.stack([edge] * 4)  # every candidate collision-free
    else:
        pos = np.stack([edge, edge, diag, diag])  # [4, H, 2]
    vel = np.gradient(pos, 5.0 / H, axis=1)
    targets = jnp.asarray(np.concatenate([pos, vel], -1), jnp.float32)
    T_norm = ds.normalize_trajectories(targets)  # [4, H, 4]

    sched = make_schedule("exponential", 25)
    sa = sched.sqrt_alphas_cumprod
    s1 = sched.sqrt_one_minus_alphas_cumprod

    def eps_fn(params, x, t):
        return (x - sa[t][:, None, None] * T_norm) / s1[t][:, None, None]

    def make(**cfg_kw):
        return MotionPlanner(
            ds, sched, eps_fn, params={"unused": jnp.zeros(())},
            config=PlannerConfig(
                n_samples=4, planner_alg="diffusion_prior_then_guide",
                n_guide_steps=1, n_post_guide_steps=6,
                weight_grad_cost_collision=3e-2, **cfg_kw,
            ),
        )

    return ds, make, jnp.asarray(s), jnp.asarray(g)


def test_post_guide_freeze_free_tail():
    """r5 freeze-when-free adaptive tail: candidates the oracle already
    accepts at tail entry are frozen (unchanged through the tail, hence
    still free at the end, with their shorter pre-tail paths); colliding
    candidates keep receiving the full guide push. Flag off reproduces
    the r4 behavior (every candidate pushed, free ones included)."""
    ds, make, s, g = _freeze_tail_setup()
    pf = make(post_guide_freeze_free=True)
    r = pf.plan(jax.random.PRNGKey(2), s, g, return_chain=True)
    n_post = pf._n_post_steps
    chain_end = np.asarray(r.trajs_chain[-(n_post + 1)])  # tail entry
    free0 = np.asarray(ds.task.trajs_free_mask(jnp.asarray(chain_end)))
    assert free0.any() and not free0.all(), (
        f"setup must yield a mixed mask at tail entry, got {free0}"
    )
    # free-at-tail-entry candidates are frozen: final == tail entry
    np.testing.assert_allclose(
        r.trajs_final[free0], chain_end[free0], rtol=1e-6, atol=1e-6
    )
    # frozen candidates stay free; the free set is monotone over the tail
    assert r.free_mask[free0].all()
    assert r.fraction_free >= float(free0.mean())
    # colliding candidates still move (the full push)
    assert not np.allclose(r.trajs_final[~free0], chain_end[~free0])
    # flag off: the r4 tail pushes the free candidates too (the GP
    # smoothness term alone moves an already-free path)
    r_off = make().plan(jax.random.PRNGKey(2), s, g, return_chain=True)
    assert not np.allclose(r_off.trajs_final[free0], chain_end[free0])
    # the serving path accepts the flag (plan_batch tail body)
    rb = pf.plan_batch(jax.random.PRNGKey(2), s[None], g[None])[0]
    assert rb.free_mask[:2].all() if rb.free_mask.ndim else True
    assert np.isfinite(float(rb.fraction_free))


def test_post_guide_early_exit_matches_scan():
    """plan_batch's freeze-mode tail runs as an early-exiting while_loop
    (PlannerConfig.post_guide_early_exit): once every candidate is free
    the remaining scan steps would be masked no-ops, so stopping is
    result-identical. Checked against the forced-scan path on a mixed
    batch (loop runs to the cap) and an all-free batch (loop exits after
    one step vs the scan's six)."""
    for all_free in (False, True):
        ds, make, s, g = _freeze_tail_setup(all_free=all_free)
        p_we = make(post_guide_freeze_free=True)  # early exit defaults on
        p_sc = make(post_guide_freeze_free=True, post_guide_early_exit=False)
        ra = p_we.plan_batch(jax.random.PRNGKey(7), s[None], g[None])[0]
        rb = p_sc.plan_batch(jax.random.PRNGKey(7), s[None], g[None])[0]
        np.testing.assert_allclose(
            ra.trajs_final, rb.trajs_final, rtol=1e-6, atol=1e-6
        )
        assert ra.fraction_free == rb.fraction_free
        np.testing.assert_array_equal(ra.free_mask, rb.free_mask)


def test_post_guide_noise_anneal():
    """r5 annealed restart noise: still-colliding tail candidates get
    per-step Gaussian noise (annealed std) on top of the guide push;
    frozen (free) candidates never see it. Deterministic per key;
    requires freeze mode."""
    ds, make, s, g = _freeze_tail_setup()
    pn = make(post_guide_freeze_free=True,
              post_guide_noise_anneal=(0.3, 0.0))
    r = pn.plan(jax.random.PRNGKey(2), s, g, return_chain=True)
    n_post = pn._n_post_steps
    chain_end = np.asarray(r.trajs_chain[-(n_post + 1)])
    free0 = np.asarray(ds.task.trajs_free_mask(jnp.asarray(chain_end)))
    assert free0.any() and not free0.all()
    # frozen candidates: bitwise-frozen even with the noise feature on
    np.testing.assert_allclose(
        r.trajs_final[free0], chain_end[free0], rtol=1e-6, atol=1e-6
    )
    assert r.free_mask[free0].all()
    # colliding candidates move differently than the noise-free tail
    r_nf = make(post_guide_freeze_free=True).plan(
        jax.random.PRNGKey(2), s, g
    )
    assert not np.allclose(
        r.trajs_final[~free0], r_nf.trajs_final[~free0]
    )
    # deterministic: same key, same result
    r2 = pn.plan(jax.random.PRNGKey(2), s, g)
    np.testing.assert_array_equal(r.trajs_final, r2.trajs_final)
    # endpoints stay pinned through the noisy tail
    np.testing.assert_allclose(
        r.trajs_final[:, 0, :2],
        np.broadcast_to(np.asarray(s), (4, 2)), atol=1e-4)
    # guard: noise without freeze is a config error
    with pytest.raises(ValueError):
        make(post_guide_noise_anneal=(0.3, 0.0))
    # plan_batch: early-exit while_loop carries the noise key
    rb = pn.plan_batch(jax.random.PRNGKey(2), s[None], g[None])[0]
    assert np.isfinite(float(rb.fraction_free))


def test_n_resample_passes():
    """r5 per-candidate resampling: each pass re-runs the chain with
    fresh noise and replaces only oracle-rejected candidates — free
    candidates keep their plans bitwise. In the forced-x0hat setup the
    redraw converges to the SAME targets, so the colliding diagonal
    candidates stay colliding (replacement happened, quality unchanged)
    while the free edge candidates are untouched; with zero passes the
    program equals the r5 baseline. The noiseless extra steps are
    disabled so the chain keeps key-dependent variation (with them the
    forced chain converges exactly and a redraw is numerically
    identical)."""
    ds, make, s, g = _freeze_tail_setup()
    kw = dict(post_guide_freeze_free=True, n_diffusion_steps_without_noise=0)
    p0 = make(**kw)
    p1 = make(n_resample_passes=1, **kw)
    r0 = p0.plan(jax.random.PRNGKey(2), s, g, return_chain=True)
    r1 = p1.plan(jax.random.PRNGKey(2), s, g, return_chain=True)
    # one extra chain row per pass (the merged state)
    assert r1.trajs_chain.shape[0] == r0.trajs_chain.shape[0] + 1
    free0 = r0.free_mask
    assert free0.any() and not free0.all()
    # free candidates keep their pass-0 plans exactly
    np.testing.assert_allclose(
        r1.trajs_final[free0], r0.trajs_final[free0], rtol=1e-6, atol=1e-6
    )
    # the free set is monotone: a pass can only free candidates
    assert r1.free_mask[free0].all()
    # replacement uses a FRESH draw: with a real (random-net) chain —
    # where every candidate collides, so one pass replaces the whole
    # batch — the result differs from the no-resample run (the forced
    # x0hat chain above snaps exactly to its target at t=0, so its
    # redraws are numerically identical by construction)
    ds2 = _toy_ds()
    tr2 = np.asarray(ds2.trajs[0])
    s2, g2 = jnp.asarray(tr2[0, :2]), jnp.asarray(tr2[-1, :2])
    q0 = _toy_planner(ds2, n_guide_steps=2)
    q1 = _toy_planner(ds2, n_guide_steps=2, n_resample_passes=1)
    a = q0.plan(jax.random.PRNGKey(1), s2, g2)
    b = q1.plan(jax.random.PRNGKey(1), s2, g2)
    assert not a.free_mask.any()  # all colliding -> all replaced
    assert not np.allclose(a.trajs_final, b.trajs_final)
    # deterministic per key
    r1b = p1.plan(jax.random.PRNGKey(2), s, g)
    np.testing.assert_array_equal(r1.trajs_final, r1b.trajs_final)
    # serving path accepts the config
    rb = p1.plan_batch(jax.random.PRNGKey(2), s[None], g[None])[0]
    assert np.isfinite(float(rb.fraction_free))


def test_num_interpolated_points_config():
    """PlannerConfig.num_interpolated_points reaches the guide (VERDICT
    r4 #3: the 96/64 work-reduction lanes); different counts give
    different guide gradients, same shapes."""
    ds = _toy_ds()
    p128 = _toy_planner(ds)
    p64 = _toy_planner(ds, num_interpolated_points=64)
    assert p128.guide.num_interp == 128 and p64.guide.num_interp == 64
    tr0 = np.asarray(ds.trajs[0])
    s, g = jnp.asarray(tr0[0, :2]), jnp.asarray(tr0[-1, :2])
    r128 = p128.plan(jax.random.PRNGKey(1), s, g)
    r64 = p64.plan(jax.random.PRNGKey(1), s, g)
    assert r64.trajs_final.shape == r128.trajs_final.shape
    assert np.isfinite(r64.trajs_final).all()
    assert not np.allclose(r64.trajs_final, r128.trajs_final)


def test_plan_batch_bf16_transfer_and_failure_payload():
    """transfer_dtype=bf16 compresses only the candidate transfer (metrics
    exact, candidates within bf16 rounding of full-precision); best-only
    mode returns NaN trajectories for failed queries instead of passing
    off candidate 0 as a chosen plan (ADVICE r4 / VERDICT r4 #8)."""
    ds = _toy_ds()
    planner = _toy_planner(ds)
    trs = np.asarray(ds.trajs)
    starts = jnp.asarray(trs[:2, 0, :2])
    goals = jnp.asarray(trs[:2, -1, :2])
    key = jax.random.PRNGKey(8)
    r_full = planner.plan_batch(key, starts, goals)
    r_bf16 = planner.plan_batch(key, starts, goals,
                                transfer_dtype=jnp.bfloat16)
    for a, b in zip(r_full, r_bf16):
        assert b.trajs_final.dtype == np.float32
        # bf16 has ~2-3 significant decimal digits; trajectories are O(1)
        np.testing.assert_allclose(a.trajs_final, b.trajs_final, atol=2e-2)
        # metrics computed on-device from the f32 tensor: exactly equal
        assert a.success == b.success
        np.testing.assert_array_equal(a.free_mask, b.free_mask)
        assert a.cost_best == b.cost_best
        assert a.idx_best == b.idx_best

    # guaranteed failure: an oracle margin so large every point collides
    ds_fail = _toy_ds(obstacle_cutoff_margin=10.0)
    p_fail = _toy_planner(ds_fail)
    [rb] = p_fail.plan_batch(key, starts[:1], goals[:1],
                             return_all_trajs=False)
    assert rb.success == 0
    assert np.isnan(rb.trajs_final).all()
    assert rb.idx_best is None and rb.cost_best is None
    # full mode still returns the (finite) candidate set on failure
    [rf] = p_fail.plan_batch(key, starts[:1], goals[:1])
    assert rf.success == 0 and np.isfinite(rf.trajs_final).all()
