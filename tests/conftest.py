"""Test config: force the CPU backend with a virtual 8-device mesh so
sharding tests run anywhere and compiles stay local/fast
(SURVEY.md section 4, multi-host-without-a-pod). Must run before any test
module imports jax. The axon TPU plugin (sitecustomize) re-registers itself
regardless of JAX_PLATFORMS, so we also override via jax.config.

Real-hardware lane: `MPD_TPU_REAL=1 python -m pytest tests/test_kernels_tpu.py`
skips the CPU forcing so TPU-gated tests (Mosaic kernel compiles) run on the
chip; they self-skip when the backend isn't tpu."""

import os

if not os.environ.get("MPD_TPU_REAL"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
