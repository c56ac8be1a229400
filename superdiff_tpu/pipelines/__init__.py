from . import cifar, sd, protein

__all__ = ["cifar", "sd", "protein"]
