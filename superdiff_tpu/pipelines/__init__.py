from . import cifar

__all__ = ["cifar"]
