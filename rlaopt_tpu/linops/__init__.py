"""Matrix-free linear operators (pytree-native, shardable)."""

from .base import *  # noqa: F401,F403
from .types import *  # noqa: F401,F403
from .sharded import *  # noqa: F401,F403
from .mixins import *  # noqa: F401,F403
from .enums import _DistributionMode  # noqa: F401

from . import base, types, sharded, mixins

__all__ = ["_DistributionMode"]
for _m in (base, types, sharded, mixins):
    if hasattr(_m, "__all__"):
        __all__.extend(_m.__all__)
