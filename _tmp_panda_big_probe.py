"""Probe the Panda large-batch lane with the retuned block at B=1024/2048."""
import time, numpy as np
from mpd_tpu.core import setup_runtime
setup_runtime()
import jax, jax.random as jrandom
from bench import build_query, chain_cost, mfu

for B in (1024, 2048):
    q = build_query(B, env_id="EnvSpheres3D", robot_id="RobotPanda",
                    n_guide_steps=15, w_coll=5e-2)
    keys = jrandom.split(jrandom.PRNGKey(7), 12)
    jax.block_until_ready([q(k) for k in keys[:4]])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready([q(k) for k in keys])
        best = min(best, (time.perf_counter() - t0) / 12)
    fl, by = chain_cost(q)
    print(f"B={B}: {best*1e3:.1f} ms/query -> {B/best:.0f} trajs/s "
          f"(MFU {100*(mfu(fl, best) or 0):.1f}%)", flush=True)
