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

import pytest  # noqa: E402

# LLVM's in-process JIT has intermittently segfaulted inside
# backend_compile late in the suite, after several hundred tests'
# executables accumulate in the process (observed in different modules,
# never reproducible standalone).  Bound the arena: at each module
# boundary, if >=100 tests ran since the last clear, drop every
# compiled executable and let the module recompile on demand.  (The
# same mitigation previously lived only in test_segmented_dispatch.py,
# which still clears unconditionally — its programs are the largest
# compiles in the suite.)
_tests_since_clear = {"n": 0}


@pytest.fixture(autouse=True)
def _count_tests_for_arena_bound():
    _tests_since_clear["n"] += 1
    yield


@pytest.fixture(scope="module", autouse=True)
def _bounded_compile_arena():
    if _tests_since_clear["n"] >= 100:
        jax.clear_caches()
        _tests_since_clear["n"] = 0
    yield
