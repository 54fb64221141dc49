"""mpd_tpu — a TPU-native Motion Planning Diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
jacarvalho/mpd-public (Motion Planning Diffusion, Carvalho et al., IROS 2023):
learning diffusion priors over collision-free robot trajectories and planning
by guided reverse-diffusion sampling with differentiable motion-planning costs.

Design: pure-functional pytrees everywhere, static shapes, single-jit guided
sampling loop (`lax.scan`), `vmap`-first world model (SDFs, FK), `shard_map`
over a device mesh for the candidate-trajectory batch.
"""

__version__ = "0.1.0"
