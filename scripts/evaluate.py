#!/usr/bin/env python
"""Aggregate planning evaluation: N queries per trained model, metrics to csv.

The quality-parity harness for BASELINE.md: success rate, fraction free,
collision intensity, smoothness, path length, variance and p50 latency over
many random start/goal queries (the reference evaluates the same metric
block per query, inference.py:292-327).

Example:
  python scripts/evaluate.py --model-dir data_trained_models/EnvSimple2D-RobotPointMass \
      --n-queries 20 --out results_eval/EnvSimple2D
"""

import argparse
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--n-queries", type=int, default=20)
    p.add_argument("--n-samples", type=int, default=50)
    p.add_argument("--planner-alg", default="mpd")
    p.add_argument("--weight-grad-cost-collision", type=float, default=1e-2)
    p.add_argument("--n-guide-steps", type=int, default=5)
    p.add_argument("--start-guide-steps-fraction", type=float, default=0.25)
    p.add_argument("--use-extra-objects", type=int, default=1)
    p.add_argument("--threshold-start-goal-pos", type=float, default=None,
                   help="min start-goal joint distance for eval queries "
                        "(default: the dataset's own threshold; the reference "
                        "uses 1.83 for the Panda)")
    p.add_argument("--use-ddim", action="store_true",
                   help="DDIM subsequence sampling instead of the DDPM chain")
    p.add_argument("--ddim-times", default=None,
                   help="comma-separated DDIM timestep subsequence, e.g. "
                        "'0,1,2,4,9,24' (low-t-biased); default: uniform "
                        "linspace stride as in the reference")
    p.add_argument("--ddim-eta", type=float, default=0.0,
                   help="DDIM stochasticity (0 = reference-faithful "
                        "deterministic; 1 = DDPM-style posterior noise "
                        "between guided steps)")
    p.add_argument("--ddim-refine-noise-std", type=float, default=0.0,
                   help="exploration noise between DDIM refine steps, in "
                        "units of the schedule's smallest noisy-step std")
    p.add_argument("--ddim-refine-steps", type=int, default=0,
                   help="extra noiseless denoise+guide steps after the DDIM "
                        "chain (0 = reference-faithful ddim_sample)")
    p.add_argument("--ddim-refine-anneal-t", type=int, default=0,
                   help="annealed re-noise tail: refine step j re-noises to "
                        "timestep t_j (linear from this value down to 0) and "
                        "denoises at t_j (0 = refine at t=0 only)")
    p.add_argument("--use-respaced", action="store_true",
                   help="respaced-DDPM fast lane: stochastic DDPM chain over "
                        "a timestep subsequence (DDIM's eps-forward count "
                        "with DDPM's posterior-noise diversity)")
    p.add_argument("--respaced-times", default=None,
                   help="comma-separated respaced timestep subsequence; "
                        "default: the DDIM serving lane's 10 times")
    p.add_argument("--batch-queries", type=int, default=0,
                   help=">0: plan this many queries per device call "
                        "(MotionPlanner.plan_batch serving path); per-query "
                        "latency is the amortized batch time")
    p.add_argument("--fused-collision", default="auto",
                   choices=["auto", "on", "off", "interpret"],
                   help="Pallas collision-guide megakernel mode (A/B vs the "
                        "jax.grad path; see kernels/panda_guide.py)")
    p.add_argument("--out", default=None)
    p.add_argument("--seed", type=int, default=30)
    p.add_argument("--n-post-guide-steps", type=int, default=None,
                   help="pure-guide refinement tail after the chain: for "
                        "'mpd' a short hybrid tail (VERDICT r3 #5), for "
                        "'diffusion_prior_then_guide' overrides the default "
                        "(t_start+extra)*n_guide tail; default = variant "
                        "default, explicit 0 = tail-free")
    p.add_argument("--post-guide-freeze-free", action="store_true",
                   help="freeze-when-free adaptive tail: each tail step "
                        "updates only trajectories still in collision; "
                        "free candidates keep their (shorter) paths")
    p.add_argument("--post-guide-ramp", default=None,
                   help="'s0,s1': linear multiplier ramp on the collision "
                        "guide weights over the post-guide tail (e.g. "
                        "'0.5,3.0' ends 3x stronger; default constant)")
    p.add_argument("--n-resample-passes", type=int, default=0,
                   help="re-run the full chain (+tail) this many times, "
                        "each pass replacing only still-colliding "
                        "candidates (independent redraws multiply the "
                        "stuck fraction away; free candidates keep their "
                        "plans)")
    p.add_argument("--post-guide-noise", default=None,
                   help="'s0,s1': annealed restart-noise std (normalized "
                        "units) added to STILL-COLLIDING candidates per "
                        "tail step (requires --post-guide-freeze-free) — "
                        "simulated-annealing escapes for stuck candidates")
    p.add_argument("--num-interp", type=int, default=128,
                   help="collision-guide interpolation count (128 = the "
                        "reference's effective value; 96 = its intended "
                        "ceil(1.5*H); 64 = H — work-reduction lanes)")
    p.add_argument("--bf16", action="store_true",
                   help="run the eps-model in bfloat16 (params + activations)")
    p.add_argument("--spheres-per-segment", type=int, default=None,
                   help="Panda collision-sphere density (default 2/segment);"
                        " higher tightens the validity oracle + guide")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    from mpd_tpu.core import setup_runtime

    setup_runtime(cpu=args.cpu)
    import jax
    import jax.numpy as jnp

    from mpd_tpu.data import TrajectoryDataset
    from mpd_tpu.diffusion import make_schedule
    from mpd_tpu.nets.temporal_unet import UNET_DIM_MULTS, TemporalUnet
    from mpd_tpu.planner import MotionPlanner, PlannerConfig
    from mpd_tpu.train import TrainConfig, Trainer, load_checkpoint
    from mpd_tpu.utils import save_metrics

    with open(os.path.join(args.model_dir, "args.yaml")) as f:
        margs = yaml.safe_load(f)

    robot_kwargs = {}
    if args.spheres_per_segment is not None:
        robot_kwargs["n_spheres_per_segment"] = args.spheres_per_segment
    ds = TrajectoryDataset(
        base_dir=margs["data_dir"],
        include_velocity=margs["include_velocity"],
        use_extra_objects=bool(args.use_extra_objects),
        obstacle_cutoff_margin=0.05,
        robot_kwargs=robot_kwargs,
    )
    tn = margs.get("traj_normalizer")
    if tn and tn.get("mins") is not None:
        ds.override_traj_normalizer_stats(tn["mins"], tn["maxs"])

    net = TemporalUnet(
        state_dim=margs["state_dim"],
        n_support_points=margs["n_support_points"],
        unet_input_dim=margs["unet_input_dim"],
        dim_mults=UNET_DIM_MULTS[margs["unet_dim_mults_option"]],
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    trainer = Trainer(
        net, make_schedule(margs["variance_schedule"], margs["n_diffusion_steps"]),
        ds.trajs_normalized, TrainConfig(), seed=0,
    )
    state, step = load_checkpoint(args.model_dir, trainer.state)
    params = state.ema_params if margs.get("use_ema", True) else state.params
    planner = MotionPlanner(
        ds,
        make_schedule(margs["variance_schedule"], margs["n_diffusion_steps"]),
        lambda p, x, t: net.apply(p, x, t),
        params=params,
        config=PlannerConfig(
            planner_alg=args.planner_alg,
            n_samples=args.n_samples,
            weight_grad_cost_collision=args.weight_grad_cost_collision,
            n_guide_steps=args.n_guide_steps,
            start_guide_steps_fraction=args.start_guide_steps_fraction,
            use_ddim=args.use_ddim,
            ddim_refine_steps=args.ddim_refine_steps,
            ddim_times=(tuple(int(t) for t in args.ddim_times.split(","))
                        if args.ddim_times else None),
            ddim_eta=args.ddim_eta,
            ddim_refine_noise_std=args.ddim_refine_noise_std,
            ddim_refine_anneal_t=args.ddim_refine_anneal_t,
            use_respaced=args.use_respaced,
            respaced_times=(tuple(int(t) for t in args.respaced_times.split(","))
                            if args.respaced_times else None),
            fused_collision_guide=args.fused_collision,
            n_post_guide_steps=args.n_post_guide_steps,
            post_guide_freeze_free=args.post_guide_freeze_free,
            post_guide_w_coll_ramp=(
                tuple(float(s) for s in args.post_guide_ramp.split(","))
                if args.post_guide_ramp else None
            ),
            post_guide_noise_anneal=(
                tuple(float(s) for s in args.post_guide_noise.split(","))
                if args.post_guide_noise else None
            ),
            n_resample_passes=args.n_resample_passes,
            num_interpolated_points=args.num_interp,
        ),
    )

    key = jax.random.PRNGKey(args.seed)
    # draw the query pairs (same key schedule in both modes, so the query
    # distribution is identical whether planned one-per-call or batched)
    pairs, plan_keys = [], []
    for q in range(args.n_queries):
        key, k1, k2 = jax.random.split(key, 3)
        for _ in range(100):
            k1, sub = jax.random.split(k1)
            qs = ds.task.random_coll_free_q(sub, n_samples=2)
            if float(jnp.linalg.norm(qs[0] - qs[1])) > (
                args.threshold_start_goal_pos
                if args.threshold_start_goal_pos is not None
                else ds.threshold_start_goal_pos
            ):
                break
        pairs.append(qs)
        plan_keys.append(k2)

    all_res = []
    if args.batch_queries > 0:
        Q = args.batch_queries
        for lo in range(0, args.n_queries, Q):
            chunk = pairs[lo : lo + Q]
            # pad a ragged final chunk to Q by repeating the last query and
            # drop the extra rows: plan_batch compiles one program per
            # distinct Q, and a second cold compile (minutes through the
            # remote-compile tunnel) would skew the tail rows' latencies
            n_real = len(chunk)
            chunk = chunk + [chunk[-1]] * (Q - n_real)
            starts = jnp.stack([c[0] for c in chunk])
            goals = jnp.stack([c[1] for c in chunk])
            all_res.extend(planner.plan_batch(plan_keys[lo], starts, goals)[:n_real])
    else:
        for q in range(args.n_queries):
            all_res.append(planner.plan(plan_keys[q], pairs[q][0], pairs[q][1]))

    results = []
    for q, res in enumerate(all_res):
        row = {
            "success": res.success,
            "fraction_free": res.fraction_free,
            "collision_intensity": res.collision_intensity,
            "t_total": res.t_total,
            "cost_best": res.cost_best,
            "cost_smoothness": None if res.cost_smoothness is None else float(np.mean(res.cost_smoothness)),
            "cost_path_length": None if res.cost_path_length is None else float(np.mean(res.cost_path_length)),
            "variance_waypoints": res.variance_waypoints,
        }
        results.append(row)
        print(f"[q {q}] success {res.success} free {res.fraction_free:.2f} "
              f"coll_int {res.collision_intensity:.4f} t {res.t_total*1000:.0f}ms", flush=True)

    # drop the compile query (the whole first chunk in batch mode) from
    # latency stats but keep its quality metrics
    n_warm = max(1, args.batch_queries)
    lat = [r["t_total"] for r in results[n_warm:]] or [results[0]["t_total"]]
    agg = {
        "success_rate": float(np.mean([r["success"] for r in results])),
        "fraction_free": float(np.mean([r["fraction_free"] for r in results])),
        "collision_intensity": float(np.mean([r["collision_intensity"] for r in results])),
        "t_p50_ms": float(np.median(lat) * 1000),
    }
    print("\nAGGREGATE:", agg)

    out = args.out or os.path.join(args.model_dir, "results_eval")
    save_metrics(results, out, name=f"eval_{args.planner_alg}")
    with open(os.path.join(out, "aggregate.yaml"), "w") as f:
        yaml.safe_dump({**agg, "n_queries": args.n_queries, "checkpoint_step": int(step)}, f)


if __name__ == "__main__":
    main()
