from . import aggregate, bpd, clip_metrics, fid, nll

__all__ = ["aggregate", "bpd", "clip_metrics", "fid", "nll"]
