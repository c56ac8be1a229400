from .mlp import MLPScoreNet
from .unet import ScoreUNet
from .ensemble import stack_params, unstack_params, make_stacked_score_fn

__all__ = [
    "MLPScoreNet",
    "ScoreUNet",
    "stack_params",
    "unstack_params",
    "make_stacked_score_fn",
    # heavier optional modules (inception, ncsn_layers, normalization, sd,
    # protein) are imported by path to keep package import light
]
