from . import aggregate, bpd, clip_metrics, fid, fld, nll, self_consistency, struct_metrics, tifa

__all__ = [
    "aggregate",
    "bpd",
    "clip_metrics",
    "fid",
    "fld",
    "nll",
    "self_consistency",
    "struct_metrics",
    "tifa",
]
