from mpd_tpu.diffusion.schedules import (
    DiffusionSchedule,
    make_schedule,
    respaced_schedule,
    respace_schedule_tables,
    linear_betas,
    quadratic_betas,
    sigmoid_betas,
    cosine_betas,
    exponential_betas,
    variance_preserving_betas,
)
from mpd_tpu.diffusion.gaussian_diffusion import (
    q_sample,
    predict_start_from_noise,
    predict_noise_from_start,
    q_posterior_mean,
    p_mean_variance,
    diffusion_loss,
    HardConds,
    apply_hard_conditioning,
)
from mpd_tpu.diffusion.sampler import (
    SamplerConfig,
    ddpm_sample_step,
    run_sampling,
    run_ddim_sampling,
    respace_eps_fn,
    guide_gradient_steps,
)
