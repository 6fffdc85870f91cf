"""Test configuration: force the CPU backend (fast, deterministic, and
allows an 8-device virtual mesh for sharding tests) before jax imports.

NOTE: the harness environment pre-sets JAX_PLATFORMS (e.g. to the "axon"
TPU plugin), so we must *overwrite* it, not setdefault it — otherwise the
whole suite silently runs float64 on a TPU chip where f64 matmul is
emulated and golden-value tolerances blow up.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# The persistent compile cache may hold AOT artifacts compiled elsewhere
# (machine-feature mismatch warnings / SIGILL risk); tests recompile.
os.environ["GPYREG_TPU_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The env var alone is NOT honored when a TPU plugin (axon) is installed;
# the config API is.  Must run before any jax computation.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
