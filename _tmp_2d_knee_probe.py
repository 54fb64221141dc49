"""Re-probe the 2D large-batch knee with the guide kernel live (the 4096
knee was measured pre-kernel): DDPM-25 and respaced-10 at B=4096/8192."""
import time
from mpd_tpu.core import setup_runtime
setup_runtime()
import jax, jax.random as jrandom
from bench import build_query

for B in (4096, 8192):
    for lane, kw in (("ddpm", {}), ("respaced", {"respaced": True})):
        q = build_query(B, **kw)
        keys = jrandom.split(jrandom.PRNGKey(7), 12)
        jax.block_until_ready([q(k) for k in keys[:4]])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready([q(k) for k in keys])
            best = min(best, (time.perf_counter() - t0) / 12)
        print(f"B={B} {lane}: {best*1e3:.1f} ms/query -> {B/best:.0f} trajs/s",
              flush=True)
