#!/usr/bin/env python
"""Multi-device scaling bench: guided-MPD trajs/s vs n_devices.

Weak scaling of the compiled guided query (bench.py's workload) over a 1-D
('data',) mesh: per-device candidate batch held fixed, total B = per_dev * n.
The candidate axis is embarrassingly parallel, so ideal scaling is linear;
deviations measure collective/dispatch overhead, not algorithmic cost.

On real multi-chip hardware this is the one-command scaling measurement
BASELINE.md asks for (1 chip / 1 host / 2+ hosts). On a single chip it
degenerates to the n=1 point. `--virtual N` forces an N-device CPU mesh for
plumbing checks (throughput numbers are then meaningless).

Prints one JSON line per device count:
  {"n_devices": n, "batch": B, "trajs_per_sec": T, "scaling_efficiency": e}
"""

import argparse
import json
import os
import sys


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--per-device-batch", type=int, default=512,
                   help="candidates per device (4096/8 — bench.py's knee "
                        "split evenly at full fan-out)")
    p.add_argument("--n-iters", type=int, default=10)
    p.add_argument("--virtual", type=int, default=0,
                   help="force an N-device virtual CPU mesh (plumbing check)")
    args = p.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )

    from mpd_tpu.core import setup_runtime

    setup_runtime(cpu=bool(args.virtual))
    import jax
    import numpy as np

    from bench import build_query, time_query
    from mpd_tpu.parallel import make_mesh

    n_total = len(jax.devices())
    print(f"backend: {jax.default_backend()}, {n_total} devices",
          file=sys.stderr, flush=True)

    counts = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= n_total]
    if n_total not in counts:
        counts.append(n_total)

    base = None
    for n in counts:
        B = args.per_device_batch * n
        mesh = make_mesh(n) if n > 1 else None
        # fused="auto" everywhere: on a REAL TPU backend the mesh points run
        # the Pallas guide kernel shard_mapped over the candidate axis
        # (parallel.shard_map_batch0), the same program family as n=1. On
        # the virtual CPU mesh (MULTICHIP_r*.json runs) "auto" resolves to
        # the autodiff guide — the JSON records which path was live.
        q = build_query(B, mesh=mesh, fused="auto")
        t = time_query(q, n_iters=args.n_iters)
        thpt = B / float(np.median(t))
        if base is None:
            base = thpt
        print(json.dumps({
            "n_devices": n,
            "batch": B,
            "trajs_per_sec": round(thpt, 1),
            "median_s": round(float(np.median(t)), 4),
            "scaling_efficiency": round(thpt / (base * n), 3),
            "fused_guide_live": q._fused_guide_live,
        }), flush=True)


if __name__ == "__main__":
    main()
