#!/usr/bin/env python
"""Sweep training batch size x dtype on the chip (VERDICT r3 #1).

The reference trains at batch 128 f32 (ref scripts/train_diffusion/
launch_train_01.py:87) — on the TPU that is the MXU-starvation regime the
sampler lanes escaped by scaling batch. This times the scan-fused train
step (bench._bench_training, the exact scripts/train.py program) across a
config grid and prints one JSON line per config: steps/s, trajs/s
(steps/s x batch) and analytic MFU.

Usage: python scripts/tune_train_batch.py [batch ...]  (default sweep:
128 512 1024 2048, each at f32 and bf16)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from mpd_tpu.core import setup_runtime

    setup_runtime()
    import jax

    from bench import _bench_training

    batches = [int(a) for a in sys.argv[1:]] or [128, 512, 1024, 2048]
    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    best = None
    for bs in batches:
        for bf16 in (False, True):
            r = _bench_training(batch_size=bs, use_bf16=bf16)
            r["trajs_per_sec"] = round(r["steps_per_sec"] * bs, 1)
            print(json.dumps(r), flush=True)
            if best is None or r["trajs_per_sec"] > best["trajs_per_sec"]:
                best = r
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
