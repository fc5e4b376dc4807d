"""rlaopt_tpu — TPU-native randomized linear algebra optimization toolkit.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
PyTorch+CUDA reference ``udellgroup/rlaopt``: matrix-free linear operators
(pytree-native, mesh-shardable), kernel Gram operators (RBF/Laplace/Matérn)
with fused blockwise Pallas matvecs, randomized sketches
(Gaussian/orthonormal/sparse-sign/SRHT), randomized preconditioners
(Nyström/Newton/sketch-and-precondition), PCG and SAP ("ASkotch") solvers,
spectral estimators, and a LinSys model orchestrating solve loops.
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401
from . import linops  # noqa: F401
from . import ops  # noqa: F401
from . import sketches  # noqa: F401
from . import parallel  # noqa: F401
from . import kernels  # noqa: F401
from . import preconditioners  # noqa: F401
from . import spectral_estimators  # noqa: F401
from . import solvers  # noqa: F401
from . import models  # noqa: F401
from . import sparse  # noqa: F401

from .utils.rng import seed  # noqa: F401
