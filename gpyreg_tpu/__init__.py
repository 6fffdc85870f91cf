"""gpyreg_tpu: a TPU-native exact Gaussian-process regression library.

A from-scratch JAX/XLA rebuild of the capabilities of
acerbilab/gpyreg — lightweight exact GP regression with MAP-fitted and/or
slice-sampled hyperparameters — designed TPU-first:

- a functional jitted NLML core with batched (vmapped) Cholesky across
  hyperparameter candidates and samples,
- MXU-friendly pairwise-distance kernel construction,
- a custom-VJP jitter-escalating Cholesky reproducing the reference's
  numerical-failure semantics inside jit,
- autodiff hyperparameter gradients replacing hand-derived formulas,

behind an API-compatible ``GP`` class so PyVBMC-style consumers can swap
backends.

Enables float64 globally on import (parity with the NumPy reference).
"""

from . import _config  # noqa: F401  (enables x64; must come first)

from . import covariance_functions
from . import f_min_fill
from . import isotropic_covariance_functions
from . import mean_functions
from . import noise_functions
from . import outwarp_functions
from . import slice_sample
from .gp import GP, Posterior

__version__ = "0.1.0"

__all__ = [
    "GP",
    "Posterior",
    "covariance_functions",
    "isotropic_covariance_functions",
    "mean_functions",
    "noise_functions",
    "outwarp_functions",
    "f_min_fill",
    "slice_sample",
]
