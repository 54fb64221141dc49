"""Training-loop tests: loss decreases, EMA semantics, checkpoint round-trip."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpd_tpu.diffusion import make_schedule
from mpd_tpu.nets.temporal_unet import TemporalUnet
from mpd_tpu.train import TrainConfig, Trainer, save_checkpoint, load_checkpoint, latest_step


def _toy_dataset(n=256, H=16, D=4, seed=0):
    """Smooth normalized trajectories: random start/goal lines + sine bumps."""
    rng = np.random.RandomState(seed)
    u = np.linspace(0, 1, H)[None, :, None]
    a = rng.uniform(-0.8, 0.8, (n, 1, D))
    b = rng.uniform(-0.8, 0.8, (n, 1, D))
    amp = rng.uniform(-0.2, 0.2, (n, 1, D))
    x = a * (1 - u) + b * u + amp * np.sin(np.pi * u)
    return jnp.asarray(x, jnp.float32)


@pytest.fixture(scope="module")
def trained():
    data = _toy_dataset()
    net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2))
    cfg = TrainConfig(batch_size=64, lr=2e-3, step_start_ema=50, ema_update_every=5)
    trainer = Trainer(net, make_schedule("exponential", 25), data, cfg, seed=0)
    history = trainer.fit(num_steps=400, log_every=100, steps_per_call=50)
    return trainer, history


def test_loss_decreases(trained):
    _, history = trained
    assert history["train_loss"][-1] < history["train_loss"][0] * 0.7
    assert np.isfinite(history["val_loss"]).all()


def test_ema_differs_from_params_but_tracks(trained):
    trainer, _ = trained
    p = jax.tree.leaves(trainer.state.params)
    e = jax.tree.leaves(trainer.state.ema_params)
    # EMA started copying at step 50 then decayed: not identical, not far
    diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(p, e)]
    assert max(diffs) > 0
    assert max(diffs) < 1.0


def test_checkpoint_roundtrip(trained, tmp_path):
    trainer, _ = trained
    step = int(trainer.state.step)
    save_checkpoint(str(tmp_path), step, trainer.state, extra={"note": "test"})
    assert latest_step(str(tmp_path)) == step
    restored, got_step = load_checkpoint(str(tmp_path), trainer.state)
    assert got_step == step
    for a, b in zip(jax.tree.leaves(trainer.state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trained_model_samples_near_data_manifold(trained):
    """After a short fit on smooth lines, unguided samples should be much
    smoother than pure noise (the prior learned something)."""
    from mpd_tpu.diffusion import run_sampling, SamplerConfig

    trainer, _ = trained
    sched = make_schedule("exponential", 25)
    eps_fn = trainer.eps_fn_ema()
    conds = {0: jnp.asarray([0.5, 0.5, -0.5, -0.5]), 15: jnp.asarray([-0.5, -0.5, 0.5, 0.5])}
    x = run_sampling(
        sched, eps_fn, jax.random.PRNGKey(0), (8, 16, 4), conds,
        SamplerConfig(n_extra_steps=5, t_start_guide=-(10**9)),
    )
    # mean squared second difference (roughness) much lower than white noise
    rough = float(jnp.mean(jnp.diff(x, n=2, axis=1) ** 2))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    rough_noise = float(jnp.mean(jnp.diff(noise, n=2, axis=1) ** 2))
    assert rough < 0.25 * rough_noise


def test_bf16_training_runs_and_keeps_f32_params():
    """TrainConfig(use_bf16=True) — the scaled TPU lane's config
    (RESULTS.md r4): model compute in bfloat16, params/opt/EMA stay f32,
    loss decreases comparably to f32 on the toy problem."""
    data = _toy_dataset()
    net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16,
                       dim_mults=(1, 2))
    cfg = TrainConfig(batch_size=64, lr=2e-3, use_bf16=True,
                      step_start_ema=50, ema_update_every=5)
    trainer = Trainer(net, make_schedule("exponential", 25), data, cfg, seed=0)
    history = trainer.fit(num_steps=200, log_every=100, steps_per_call=50)
    assert history["train_loss"][-1] < history["train_loss"][0] * 0.8
    assert np.isfinite(history["val_loss"]).all()
    for leaf in jax.tree.leaves(trainer.state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(trainer.state.ema_params):
        assert leaf.dtype == jnp.float32


def test_context_conditioned_training_runs_and_learns():
    """Trainer(contexts=...) trains a conditioned eps-model: contexts are
    gathered with the batch indices and fed as the net's third argument
    (ref build_context -> loss, diffusion_model_base.py:30-43). Loss
    decreases; an unconditioned Trainer on the same data is unchanged by
    the contexts arg being absent (API guard). End-to-end conditioning
    quality is covered by the slow test below / the committed
    results_conditioned_toy artifacts (TPU, 20k steps: side agreement
    1.00 vs 0.48 unconditioned)."""
    sys_path = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import sys

    if sys_path not in sys.path:
        sys.path.insert(0, sys_path)
    from scripts.train_conditioned_toy import make_detour_dataset

    trajs, ctx = make_detour_dataset(n=128, H=16, reps=32)
    net = TemporalUnet(state_dim=4, n_support_points=16, unet_input_dim=16,
                       dim_mults=(1, 2), conditioning_type="concatenate",
                       conditioning_embed_dim=ctx.shape[-1])
    trainer = Trainer(net, make_schedule("exponential", 25), trajs,
                      TrainConfig(batch_size=32, lr=2e-3), seed=0,
                      contexts=ctx)
    assert trainer.train_ctx.shape[0] == trainer.train_data.shape[0]
    history = trainer.fit(num_steps=150, log_every=75, steps_per_call=25)
    assert history["train_loss"][-1] < history["train_loss"][0] * 0.9
    assert np.isfinite(history["val_loss"]).all()


@pytest.mark.slow  # two ~1.5-min CPU trainings (fast loop: -m 'not slow')
def test_conditioned_model_follows_context_end_to_end():
    """The 'concatenate' conditioning mode trained END-TO-END on the
    bimodal detour task (VERDICT r4 #6): start/goal hard conditioning
    carries no side information, so only the context can disambiguate —
    the conditioned model must detour to the requested side well above
    the unconditioned prior's ~50/50. Thresholds sit far below the
    calibrated CPU values (3k steps: conditioned ~0.97+, unconditioned
    ~0.5) and the TPU 20k-step artifact (1.00 vs 0.48,
    results_conditioned_toy)."""
    import sys

    sys_path = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if sys_path not in sys.path:
        sys.path.insert(0, sys_path)
    from scripts.train_conditioned_toy import (
        make_detour_dataset,
        sample_with_context,
        side_agreement,
    )

    H, D = 16, 4
    trajs, ctx = make_detour_dataset(n=256, H=H, reps=32)
    schedule = make_schedule("exponential", 25)
    agree = {}
    for name, cond in (("cond", "concatenate"), ("uncond", None)):
        net = TemporalUnet(state_dim=D, n_support_points=H,
                           unet_input_dim=16, dim_mults=(1, 2),
                           conditioning_type=cond,
                           conditioning_embed_dim=ctx.shape[-1])
        trainer = Trainer(net, schedule, trajs,
                          TrainConfig(batch_size=64, steps_til_summary=10**9),
                          seed=0, contexts=ctx if cond else None)
        trainer.fit(num_steps=3000, key=jax.random.PRNGKey(1), log_every=1500)
        vals = []
        for s in (1.0, -1.0):
            row = (np.tile([s, 0.45], ctx.shape[-1] // 2).astype(np.float32)
                   if cond else np.zeros((0,), np.float32))
            out = sample_with_context(net, trainer.state.ema_params, schedule,
                                      row, 32, H, D, jax.random.PRNGKey(3))
            vals.append(side_agreement(out, s))
        agree[name] = float(np.mean(vals))
    assert agree["cond"] >= 0.75, agree
    assert 0.2 <= agree["uncond"] <= 0.8, agree
    assert agree["cond"] >= agree["uncond"] + 0.15, agree
