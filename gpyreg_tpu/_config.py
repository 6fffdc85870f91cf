"""Global configuration for gpyreg_tpu.

The reference library (gpyreg) is float64 NumPy end-to-end; we default to
float64 for numerical parity (NLML match at ~1e-8 rtol requires it).  On TPU
float64 is software-emulated; a float32 fast path can be selected for
throughput-critical workloads where ~1e-5 relative accuracy suffices.
"""

import os

import jax

# Must happen before any jax arrays are created.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: large-N Cholesky/NLML programs take
# 1-2 min each to compile through the TPU toolchain; cache them across
# processes.  Opt out with GPYREG_TPU_NO_COMPILE_CACHE=1.  Skipped when
# the CPU backend is forced: CPU AOT artifacts compiled elsewhere load
# with machine-feature mismatches (SIGILL risk), and CPU compiles are
# cheap anyway.
if not os.environ.get("GPYREG_TPU_NO_COMPILE_CACHE") and (
    os.environ.get("JAX_PLATFORMS", "") != "cpu"
):
    _cache_dir = os.environ.get(
        "GPYREG_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/jax_gpyreg")
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

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
