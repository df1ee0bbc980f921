from .schedules import (
    DiffusionSchedule,
    LossType,
    ModelMeanType,
    ModelVarType,
    betas_for_alpha_bar,
    build_schedule,
    get_named_beta_schedule,
    named_schedule,
    respaced_schedule,
    schedule_from_betas,
    space_timesteps,
)
from .gaussian import (
    calc_bpd_loop,
    condition_mean,
    condition_score,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    prior_bpd,
    q_mean_variance,
    q_posterior_mean_variance,
    q_sample,
    training_losses,
    vb_terms_bpd,
)
from .losses import discretized_gaussian_log_likelihood, mean_flat, normal_kl
from .sampling import (
    SamplerConfig,
    ddim_reverse_loop,
    ddim_sample_loop,
    ddim_sample_loop_progressive,
    ddim_step,
    p_sample_loop,
    p_sample_loop_progressive,
    p_sample_step,
)
