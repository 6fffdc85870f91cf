"""Run the full BASELINE.md benchmark suite on the current JAX device
(the TPU when available) and print one JSON line per config with
vs_baseline speedups against benchmarks/reference_results.json.

    python benchmarks/bench_suite.py [--f64]

The suite runs the GP in float32 by default (the TPU production dtype);
numerical parity of the f64 path is covered by the test suite.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gpyreg_tpu as gpr  # noqa: E402

from benchmarks.workloads import ALL  # noqa: E402


class _DtypeModule:
    """Proxy that injects backend configuration into GP construction:
    the TPU dtype, shape bucketing (compile reuse across the growing-N
    refit loop), and — for small-N configs — fast_predict so every
    posterior lands in one parametrization group (stable prediction
    programs across MCMC noise draws)."""

    def __init__(self, mod, dtype, pad_bucket=None, fast_predict=False):
        self._mod = mod
        self._dtype = dtype
        self._pad = pad_bucket
        self._fast = fast_predict

    def __getattr__(self, name):
        attr = getattr(self._mod, name)
        if name == "GP":
            dtype, pad, fast = self._dtype, self._pad, self._fast

            def GP(*args, **kw):
                kw.setdefault("dtype", dtype)
                if pad:
                    kw.setdefault("pad_bucket", pad)
                if fast:
                    kw.setdefault("fast_predict", True)
                return attr(*args, **kw)

            return GP
        return attr


def main():
    dtype = np.float64 if "--f64" in sys.argv else np.float32
    mod_small = _DtypeModule(gpr, dtype, pad_bucket=64, fast_predict=True)
    mod_large = _DtypeModule(gpr, dtype)

    ref_path = os.path.join(
        os.path.dirname(__file__), "reference_results.json"
    )
    ref = {}
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)

    for name, fn in ALL.items():
        if name == "config5_large_n":
            res = fn(mod_large, M=100000)
        else:
            res = fn(mod_small)
        line = {"config": name, "dtype": str(np.dtype(dtype)), **res}
        r = ref.get(name, {})
        for k, v in list(res.items()):
            if k in r and isinstance(r[k], (int, float)) and v:
                # throughput keys first ("..._per_s" also ends in "_s")
                if k.endswith("per_s"):
                    line[f"speedup_{k}"] = round(v / r[k], 2)
                elif k.endswith("_s"):
                    line[f"speedup_{k[:-2]}"] = round(r[k] / v, 2)
                elif k.endswith("_s_mean"):
                    # Own suffix: must NOT collide with the median
                    # headline key ("warm_refit_s" -> speedup_warm_refit)
                    line[f"speedup_{k[:-7]}_mean"] = round(r[k] / v, 2)
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
