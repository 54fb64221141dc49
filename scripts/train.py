#!/usr/bin/env python
"""Diffusion-prior training CLI.

Counterpart of the reference's scripts/train_diffusion/train.py. The model
dir is self-describing: args.yaml + checkpoints/step_*/ (params, EMA,
optimizer, step) so inference (scripts/plan.py) rebuilds everything from it.

Example:
  python scripts/train.py --data data_trajectories/EnvSimple2D-RobotPointMass \
      --out data_trained_models/EnvSimple2D-RobotPointMass --num-train-steps 100000
"""

import argparse
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True, help="dataset dir (context subdirs)")
    p.add_argument("--out", required=True, help="model output dir")
    # reference defaults: train.py:19-51 / launch_train_01.py:71-118
    p.add_argument("--include-velocity", type=int, default=1)
    p.add_argument("--variance-schedule", default="exponential")
    p.add_argument("--n-diffusion-steps", type=int, default=25)
    p.add_argument("--predict-epsilon", type=int, default=1)
    p.add_argument("--unet-input-dim", type=int, default=32)
    p.add_argument("--unet-dim-mults-option", type=int, default=1, choices=(0, 1))
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--num-train-steps", type=int, default=500_000)
    p.add_argument("--use-ema", type=int, default=1)
    p.add_argument("--use-bf16", type=int, default=0)
    p.add_argument("--steps-til-checkpoint", type=int, default=50_000)
    p.add_argument("--steps-til-summary", type=int, default=20_000,
                   help="periodic val + EMA rollout summary cadence (ref trainer.py:194-265)")
    p.add_argument("--summary-samples", type=int, default=25)
    p.add_argument("--no-summary", action="store_true",
                   help="disable the periodic rollout summary")
    p.add_argument("--no-summary-figures", action="store_true",
                   help="skip the dataset-vs-sampled trajectory PNGs the "
                        "summary renders under <out>/summary_figures "
                        "(ref summary_trajectory_generation.py:53-84)")
    p.add_argument("--wandb-mode", default="disabled",
                   choices=("disabled", "online", "offline"))
    p.add_argument("--wandb-project", default=None)
    p.add_argument("--log-every", type=int, default=2_000)
    p.add_argument("--n-devices", type=int, default=0,
                   help=">1: data-parallel over the first N devices "
                        "(params replicated, batch sharded over ICI)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    from mpd_tpu.core import setup_runtime

    setup_runtime(cpu=args.cpu)
    import jax

    from mpd_tpu.data import TrajectoryDataset
    from mpd_tpu.diffusion import make_schedule
    from mpd_tpu.nets.temporal_unet import UNET_DIM_MULTS, TemporalUnet
    from mpd_tpu.train import (
        TrainConfig,
        Trainer,
        latest_step,
        load_checkpoint,
        save_checkpoint,
    )

    ds = TrajectoryDataset(base_dir=args.data, include_velocity=bool(args.include_velocity))
    print(f"dataset: {ds.n_trajs} trajs, dim {ds.trajectory_dim}")

    net = TemporalUnet(
        state_dim=ds.state_dim,
        n_support_points=ds.n_support_points,
        unet_input_dim=args.unet_input_dim,
        dim_mults=UNET_DIM_MULTS[args.unet_dim_mults_option],
    )
    schedule = make_schedule(args.variance_schedule, args.n_diffusion_steps)
    cfg = TrainConfig(
        batch_size=args.batch_size,
        lr=args.lr,
        num_train_steps=args.num_train_steps,
        use_ema=bool(args.use_ema),
        use_bf16=bool(args.use_bf16),
        predict_epsilon=bool(args.predict_epsilon),
        steps_til_checkpoint=args.steps_til_checkpoint,
        steps_til_summary=args.steps_til_summary,
    )
    mesh = None
    if args.n_devices > 1:
        from mpd_tpu.parallel import make_mesh

        mesh = make_mesh(args.n_devices)
        print(f"data-parallel over {args.n_devices} devices: {mesh}")
    trainer = Trainer(net, schedule, ds.trajs_normalized, cfg, seed=args.seed, mesh=mesh)

    os.makedirs(args.out, exist_ok=True)
    start_step = 0
    if args.resume and latest_step(args.out) is not None:
        trainer.state, start_step = load_checkpoint(args.out, trainer.state)
        print(f"resumed from step {start_step}")

    model_args = dict(
        dataset_subdir=os.path.basename(os.path.normpath(args.data)),
        data_dir=args.data,
        include_velocity=bool(args.include_velocity),
        variance_schedule=args.variance_schedule,
        n_diffusion_steps=args.n_diffusion_steps,
        predict_epsilon=bool(args.predict_epsilon),
        unet_input_dim=args.unet_input_dim,
        unet_dim_mults_option=args.unet_dim_mults_option,
        batch_size=args.batch_size,
        lr=args.lr,
        num_train_steps=args.num_train_steps,
        use_ema=bool(args.use_ema),
        state_dim=ds.state_dim,
        n_support_points=ds.n_support_points,
        # persist the fitted normalizer stats: inference must unnormalize
        # with the exact training-time stats even if the dataset changes
        traj_normalizer=dict(
            kind=ds.normalizer_name,
            mins=np.asarray(ds.traj_normalizer.mins).tolist()
            if hasattr(ds.traj_normalizer, "mins") else None,
            maxs=np.asarray(ds.traj_normalizer.maxs).tolist()
            if hasattr(ds.traj_normalizer, "maxs") else None,
        ),
    )
    with open(os.path.join(args.out, "args.yaml"), "w") as f:
        yaml.safe_dump(model_args, f)

    # in-training observability (ref trainer.py:194-265): periodic val loss +
    # EMA rollout collision stats via a compiled-once summary, logged through
    # ExperimentLogger (stdout always; wandb when enabled)
    from mpd_tpu.train import ExperimentLogger, RolloutSummary

    logger = ExperimentLogger(
        project=args.wandb_project,
        config=model_args,
        mode=args.wandb_mode,
    )
    summary_fn = None
    if not args.no_summary:
        summary = RolloutSummary(
            ds, schedule, net.apply, n_samples=args.summary_samples,
            fig_dir=(
                None if args.no_summary_figures
                else os.path.join(args.out, "summary_figures")
            ),
            logger=logger,
        )

        def summary_fn(step):
            return summary(
                trainer.state.ema_params if cfg.use_ema else trainer.state.params,
                jax.random.PRNGKey(args.seed * 104729 + step),
                step=step,
            )

    remaining = args.num_train_steps - start_step
    ckpt_interval = args.steps_til_checkpoint
    done = start_step
    history = {"step": [], "train_loss": [], "val_loss": []}
    tl_path = os.path.join(args.out, "train_loss_history.npy")
    if start_step > 0 and os.path.exists(tl_path):  # resumed: extend history
        tl = np.load(tl_path)
        vl = np.load(os.path.join(args.out, "val_loss_history.npy"))
        keep = tl[0] <= start_step
        history["step"] = tl[0][keep].tolist()
        history["train_loss"] = tl[1][keep].tolist()
        history["val_loss"] = vl[1][keep].tolist()
    while remaining > 0:
        chunk = min(ckpt_interval, remaining)
        hist = trainer.fit(
            num_steps=chunk,
            key=jax.random.PRNGKey(args.seed * 7919 + done),
            log_every=args.log_every,
            callback=lambda s, m, base=done: print(
                f"step {base + s}: train {m['train_loss']:.5f} val {m['val_loss']:.5f}",
                flush=True,
            ),
            summary_fn=summary_fn,
            logger=logger,
            step_offset=done,
        )
        done += chunk
        remaining -= chunk
        for k in history:
            history[k].extend(hist[k])
        save_checkpoint(args.out, done, trainer.state, extra=model_args)
        # loss history on disk next to the checkpoints
        # (ref trainer.py:40-42 persists .npy loss arrays)
        np.save(os.path.join(args.out, "train_loss_history.npy"),
                np.asarray([history["step"], history["train_loss"]]))
        np.save(os.path.join(args.out, "val_loss_history.npy"),
                np.asarray([history["step"], history["val_loss"]]))
        sps = chunk / max(hist["elapsed_s"], 1e-9)
        print(f"checkpoint @ step {done} ({sps:.0f} steps/s)", flush=True)

    logger.finish()
    print("training complete")


if __name__ == "__main__":
    main()
