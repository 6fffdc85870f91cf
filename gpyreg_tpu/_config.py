"""Global configuration for gpyreg_tpu.

The reference library (gpyreg) is float64 NumPy end-to-end; we default to
float64 for numerical parity (NLML match at ~1e-8 rtol requires it).  On TPU
float64 is software-emulated; a float32 fast path can be selected for
throughput-critical workloads where ~1e-5 relative accuracy suffices.
"""

import jax

# Must happen before any jax arrays are created.
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

# Default computation dtype for the functional core.
DEFAULT_DTYPE = jnp.float64

# Maximum Cholesky jitter-escalation attempts; mirrors the retry loop in
# reference gaussian_process.py:2413-2421 (10 tries, noise multiplier x10).
CHOL_MAX_TRIES = 10

# Threshold on min(sn2) choosing the "high-noise" Cholesky parametrization,
# reference gaussian_process.py:2404.
LCHOL_THRESHOLD = 1e-6


def set_default_dtype(dtype):
    """Set the default computation dtype (jnp.float64 or jnp.float32)."""
    global DEFAULT_DTYPE
    DEFAULT_DTYPE = dtype


def get_default_dtype():
    return DEFAULT_DTYPE
