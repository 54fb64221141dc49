#!/usr/bin/env python
"""Train a context-CONDITIONED TemporalUnet end-to-end (VERDICT r4 #6).

The conditioning modes ('default'/'attention'/'concatenate') were
shape-tested but never trained; the live reference config is None, so
this exercises the advertised surface on a task where conditioning is
the ONLY disambiguator: a bimodal detour dataset. Every trajectory goes
from (-0.8, 0) to (0.8, 0) with a sine bump of side s = +-1 and
amplitude A ~ U(0.3, 0.6); start/goal hard conditioning carries NO side
information, so an unconditioned prior samples both modes ~50/50 while
the conditioned model must follow the requested context.

Context vector = tile([s, A], reps) (dim 2*reps; reps=32 by default so
conditioning_embed_dim=64 > 4*state_dim engages the reference's
state-encoder MLP branch of the 'concatenate' mode — the r4 parity work,
ref temporal_unet.py:44-52 — at a usable width: the encoder bottleneck is
out_dim//2 = embed_dim//8 hidden units, so a tiny embed dim (e.g. 20)
squeezes the whole state through 2 units and the conditioned model
cannot fit the data at all; 64 gives out 16 / hidden 8).

Reports side-agreement fraction (conditioned vs unconditioned baseline)
and the amplitude regression error; writes aggregate.yaml when --out.

Ref contract: context built per-batch and fed to the model's forward
(mpd/models/diffusion_models/diffusion_model_base.py:30-43,
temporal_unet.py:41-59,127-130).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_detour_dataset(n=512, H=32, duration=5.0, reps=32, seed=0):
    """Bimodal sine-detour trajectories + aligned context vectors."""
    rng = np.random.RandomState(seed)
    u = np.linspace(0.0, 1.0, H)
    s = rng.choice([-1.0, 1.0], size=n)
    A = rng.uniform(0.3, 0.6, size=n)
    x = -0.8 + 1.6 * u[None, :]
    y = (s * A)[:, None] * np.sin(np.pi * u)[None, :]
    pos = np.stack([np.broadcast_to(x, y.shape), y], axis=-1)  # [n, H, 2]
    vel = np.gradient(pos, duration / H, axis=1)
    vel[:, 0] = 0.0
    vel[:, -1] = 0.0
    trajs = np.concatenate([pos, vel], axis=-1).astype(np.float32)
    ctx = np.tile(np.stack([s, A], axis=-1), (1, reps)).astype(np.float32)
    return trajs, ctx


def sample_with_context(net, params, schedule, ctx_row, B, H, D, key):
    """Guided-free conditioned sampling: the query context is bound into
    the eps_fn closure (per-context compile — fine for evaluation; a
    serving deployment would pass it as a traced argument)."""
    import jax
    import jax.numpy as jnp

    from mpd_tpu.diffusion import SamplerConfig, run_sampling

    ctx = jnp.broadcast_to(jnp.asarray(ctx_row), (B, ctx_row.shape[-1]))
    start = jnp.asarray([-0.8, 0.0, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.0, 0.0, 0.0])
    hard_conds = {
        0: jnp.broadcast_to(start, (B, D)),
        H - 1: jnp.broadcast_to(goal, (B, D)),
    }

    def eps(x, t):
        if ctx_row.shape[-1]:
            return net.apply(params, x, t, ctx)
        return net.apply(params, x, t)

    cfg = SamplerConfig(n_guide_steps=0, t_start_guide=0, n_extra_steps=5)
    return np.asarray(
        jax.jit(
            lambda k: run_sampling(schedule, eps, k, (B, H, D), hard_conds, cfg)
        )(key)
    )


def side_agreement(trajs, s):
    """Fraction of samples whose midpoint detours to the requested side."""
    y_mid = trajs[:, trajs.shape[1] // 2, 1]
    return float(np.mean(np.sign(y_mid) == np.sign(s)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--n-trajs", type=int, default=512)
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--unet-dim", type=int, default=32)
    p.add_argument("--n-samples", type=int, default=64)
    p.add_argument("--mode", default="concatenate",
                   choices=["concatenate", "default", "attention"])
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    from mpd_tpu.core import setup_runtime

    setup_runtime(cpu=args.cpu)
    import jax
    import yaml

    from mpd_tpu.diffusion import make_schedule
    from mpd_tpu.nets.temporal_unet import TemporalUnet
    from mpd_tpu.train import TrainConfig, Trainer

    H, D = args.horizon, 4
    trajs, ctx = make_detour_dataset(n=args.n_trajs, H=H)
    ctx_dim = ctx.shape[-1]
    schedule = make_schedule("exponential", 25)
    tcfg = TrainConfig(batch_size=args.batch_size, steps_til_summary=10**9)

    results = {}
    nets, trainers = {}, {}
    for name, cond in (("conditioned", args.mode), ("unconditioned", None)):
        net = TemporalUnet(
            state_dim=D, n_support_points=H, unet_input_dim=args.unet_dim,
            dim_mults=(1, 2, 4), conditioning_type=cond,
            conditioning_embed_dim=ctx_dim,
        )
        trainer = Trainer(
            net, schedule, trajs, tcfg, seed=0,
            contexts=ctx if cond else None,
        )
        hist = trainer.fit(num_steps=args.steps, key=jax.random.PRNGKey(1),
                           log_every=max(args.steps // 5, 1))
        results[f"{name}_final_loss"] = round(hist["train_loss"][-1], 5)
        print(f"[{name}] {args.steps} steps, final loss "
              f"{hist['train_loss'][-1]:.4f} ({hist['elapsed_s']:.0f}s)",
              flush=True)
        nets[name], trainers[name] = net, trainer

    # side agreement: request each side; conditioned must follow, the
    # unconditioned prior samples its bimodal dataset distribution
    for name in ("conditioned", "unconditioned"):
        net, trainer = nets[name], trainers[name]
        agrees, amp_errs = [], []
        for s in (+1.0, -1.0):
            a_req = 0.45
            row = (np.tile([s, a_req], ctx_dim // 2).astype(np.float32)
                   if name == "conditioned"
                   else np.zeros((0,), np.float32))
            out = sample_with_context(
                net, trainer.state.ema_params, schedule, row,
                args.n_samples, H, D, jax.random.PRNGKey(int(2 + s)),
            )
            agrees.append(side_agreement(out, s))
            amp_errs.append(
                float(np.mean(np.abs(
                    np.abs(out[:, :, 1]).max(axis=1) - a_req
                )))
            )
        results[f"{name}_side_agreement"] = round(float(np.mean(agrees)), 4)
        results[f"{name}_amp_abs_err"] = round(float(np.mean(amp_errs)), 4)
        print(f"[{name}] side agreement {np.mean(agrees):.3f} "
              f"(per side: {agrees}), amp err {np.mean(amp_errs):.3f}",
              flush=True)

    results["mode"] = args.mode
    results["steps"] = args.steps
    print("RESULTS:", results)
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "aggregate.yaml"), "w") as f:
            yaml.safe_dump(results, f)


if __name__ == "__main__":
    main()
