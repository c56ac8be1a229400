from . import rigid, backbone
from .r3 import R3Diffuser
from .so3 import SO3Diffuser
from .se3 import SE3Diffuser
from .ipa import IPAConfig, IPAScoreNetwork

__all__ = [
    "rigid",
    "backbone",
    "R3Diffuser",
    "SO3Diffuser",
    "SE3Diffuser",
    "IPAConfig",
    "IPAScoreNetwork",
]
