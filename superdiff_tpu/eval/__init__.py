from . import fid

__all__ = ["fid"]
