"""Core SuperDiff math: schedules, Itô estimators, kappa policies, samplers."""

from .schedules import VPSchedule, CosineVPSchedule, SigmaGrid
from .ito import (
    rademacher,
    hutchinson_div,
    dlogq_sde_vp,
    dlogq_sde_sigma_space,
    dlogq_sde_sigma_space_or,
    dlogq_sde_r3,
    dlogq_sde_driftless,
    dlogq_ode_vp,
    dlogq_ode_sigma_space,
    renormalize_logq,
)
from .kappa import (
    or_weights,
    kappa_or,
    kappa_and_sde,
    kappa_and_ode,
    kappa_and_generic,
    normalized_log_sigma,
)
from .superpose import SuperposeConfig, superpose, stack_score_fns
from .dsm import kronecker_times, make_dsm_loss

__all__ = [
    "VPSchedule",
    "CosineVPSchedule",
    "SigmaGrid",
    "rademacher",
    "hutchinson_div",
    "dlogq_sde_vp",
    "dlogq_sde_sigma_space",
    "dlogq_sde_sigma_space_or",
    "dlogq_sde_r3",
    "dlogq_sde_driftless",
    "dlogq_ode_vp",
    "dlogq_ode_sigma_space",
    "renormalize_logq",
    "or_weights",
    "kappa_or",
    "kappa_and_sde",
    "kappa_and_ode",
    "kappa_and_generic",
    "normalized_log_sigma",
    "SuperposeConfig",
    "superpose",
    "stack_score_fns",
    "kronecker_times",
    "make_dsm_loss",
]
