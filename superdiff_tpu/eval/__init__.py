from . import (
    aggregate,
    bpd,
    clip_metrics,
    embed_viz,
    fid,
    fld,
    nll,
    novelty,
    self_consistency,
    struct_metrics,
    tifa,
)

__all__ = [
    "aggregate",
    "bpd",
    "clip_metrics",
    "embed_viz",
    "fid",
    "fld",
    "nll",
    "novelty",
    "self_consistency",
    "struct_metrics",
    "tifa",
]
