"""Run the REFERENCE's own test suite against gpyreg_tpu (VERDICT r4
item: the drop-in ABI proof).

The upstream suite (/root/reference/gpyreg/testing/, ~3.3k LoC) is the
strongest completeness check available in this environment: it
exercises the public GP surface exactly the way the reference's users
(PyVBMC) do.  This runner:

1. stages the reference test files in a temp dir (NOT committed — the
   repo ships no reference code),
2. writes a conftest that aliases ``sys.modules["gpyreg"]`` and every
   reference submodule to ``gpyreg_tpu`` before collection (the
   ``gpyreg_tpu/gaussian_process.py`` import-path shim exists for the
   same reason), and provides a finite-difference ``check_grad``
   stand-in for the absent ``numdifftools`` dependency,
3. runs pytest and prints a JSON result summary (one line) plus the
   per-test table.

Expected deviations are xfailed with one-line reasons in
``EXPECTED_DIFFS`` below; anything else failing is a real ABI gap.

Usage: python tests/run_reference_suite.py [extra pytest args]
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import xml.etree.ElementTree as ET

REF_TESTING = "/root/reference/gpyreg/testing"

# test-id -> one-line reason.  Keys match "file.py::test_name".
# Categories:
#   rng-path   — test pins the exact np.random consumption sequence of
#                the reference's internal loops; ours differs by design
#                (batched design eval / keyed device chains), while the
#                statistical moment checks still pass.
#   api-scope  — test asserts on reference-private internals that have
#                no equivalent in a jitted core.
EXPECTED_DIFFS = {
    "test_gaussian_process.py::test__str__and__repr__": (
        "cosmetic: repr embeds the real module path "
        "(gpyreg_tpu.covariance_functions.Matern, not gpyreg.*) — the "
        "repr machinery and all other content assertions match"
    ),
    "test_gaussian_process_isotropic.py::test__str__and__repr__": (
        "cosmetic: repr embeds the real module path (gpyreg_tpu.*)"
    ),
}

CONFTEST = '''
import importlib
import sys
import types

import numpy as np

import os
os.environ.setdefault("GPYREG_TPU_NO_COMPILE_CACHE", "1")
os.environ.setdefault("MPLBACKEND", "Agg")
import jax
jax.config.update("jax_platforms", "cpu")

import gpyreg_tpu

# --- alias the reference package name to gpyreg_tpu -------------------
sys.modules["gpyreg"] = gpyreg_tpu
for sub in (
    "covariance_functions",
    "isotropic_covariance_functions",
    "mean_functions",
    "noise_functions",
    "f_min_fill",
    "slice_sample",
    "gaussian_process",
    "formatting",
    "outwarp_functions",
):
    sys.modules["gpyreg." + sub] = importlib.import_module(
        "gpyreg_tpu." + sub
    )

# --- gpyreg.testing.test_utils: finite-difference check_grad ----------
# The reference's helper uses numdifftools (not installed here); a
# fourth-order central difference reproduces its role as the numerical
# gradient oracle at the suite's 1e-6 tolerances.


def _compute_gradient(f, x0):
    x0 = np.asarray(x0, dtype=float)
    g = np.zeros(x0.shape)
    for i in range(x0.size):
        h = 1e-4 * max(1.0, abs(x0[i]))

        def fi(v):
            x = x0.copy()
            x[i] = v
            return f(x)

        g[i] = (
            8.0 * (fi(x0[i] + h) - fi(x0[i] - h))
            - (fi(x0[i] + 2 * h) - fi(x0[i] - 2 * h))
        ) / (12.0 * h)
    return g


def check_grad(f, grad, x0):
    analytical = np.asarray(grad(x0))
    numerical = _compute_gradient(f, x0)
    return np.abs(analytical - numerical)


_testing = types.ModuleType("gpyreg.testing")
_test_utils = types.ModuleType("gpyreg.testing.test_utils")
_test_utils.check_grad = check_grad
_test_utils.compute_gradient = _compute_gradient
_testing.test_utils = _test_utils
sys.modules["gpyreg.testing"] = _testing
sys.modules["gpyreg.testing.test_utils"] = _test_utils

# --- expected-deviation xfails ----------------------------------------
import pytest

EXPECTED_DIFFS = __EXPECTED_DIFFS__


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = item.nodeid.split("/")[-1]
        base = key.split("[")[0]
        reason = EXPECTED_DIFFS.get(key) or EXPECTED_DIFFS.get(base)
        if reason:
            item.add_marker(pytest.mark.xfail(reason=reason, strict=False))
'''


def main(extra_args):
    tmp = tempfile.mkdtemp(prefix="gpyreg_ref_suite_")
    try:
        for name in sorted(os.listdir(REF_TESTING)):
            if name.startswith("test_") and name.endswith(".py"):
                if name == "test_utils.py":
                    continue  # replaced by the conftest stand-in
                shutil.copy(os.path.join(REF_TESTING, name), tmp)
        conftest = CONFTEST.replace(
            "__EXPECTED_DIFFS__", repr(EXPECTED_DIFFS)
        )
        with open(os.path.join(tmp, "conftest.py"), "w") as f:
            f.write(conftest)

        env = dict(os.environ)
        env["PYTHONPATH"] = (
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            + os.pathsep
            + env.get("PYTHONPATH", "")
        )

        def run_pytest(targets, tag):
            junit = os.path.join(tmp, f"results_{tag}.xml")
            cmd = [
                sys.executable,
                "-m",
                "pytest",
                *targets,
                "-q",
                "-p",
                "no:cacheprovider",
                "--junit-xml",
                junit,
                "--rootdir",
                tmp,
                "-o",
                "junit_family=xunit2",
            ] + extra_args
            subprocess.run(cmd, env=env)
            results = {}
            if os.path.exists(junit):
                root = ET.parse(junit).getroot()
                for case in root.iter("testcase"):
                    name = f"{case.get('classname')}::{case.get('name')}"
                    state = "passed"
                    for child in case:
                        if child.tag == "failure":
                            state = "failed"
                        elif child.tag == "error":
                            state = "errors"
                        elif child.tag == "skipped":
                            state = (
                                "xfailed"
                                if "xfail" in (child.get("type") or "")
                                else "skipped"
                            )
                    results[name] = state
            return results

        results = run_pytest([tmp], "main")
        # The reference's own CI runs `pytest --reruns=5` because its
        # stochastic tests "can fail with some small probability"
        # (reference .github/workflows/tests.yml:38); same semantics
        # here, by re-running failures up to twice.
        for attempt in (1, 2):
            failed = [n for n, s in results.items() if s in ("failed",
                                                             "errors")]
            if not failed:
                break
            node_ids = [
                os.path.join(tmp, n.split("::")[0] + ".py")
                + "::"
                + n.split("::", 1)[1]
                for n in failed
            ]
            retry = run_pytest(node_ids, f"retry{attempt}")
            for name, state in retry.items():
                if results.get(name) in ("failed", "errors"):
                    results[name] = (
                        "flaky_passed" if state == "passed" else state
                    )

        counts = {"passed": 0, "failed": 0, "xfailed": 0, "skipped": 0,
                  "errors": 0, "flaky_passed": 0}
        for name in sorted(results):
            state = results[name]
            counts[state] += 1
            if state != "passed":
                print(f"{state.upper():12s} {name}")
        print(json.dumps({"reference_suite": counts}))
        return 0 if counts["failed"] == 0 and counts["errors"] == 0 else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
