"""Measure the CPU reference (acerbilab/gpyreg) on the shared workloads.

Writes benchmarks/reference_results.json.  Run once per machine; the TPU
suite (bench_suite.py) reads the file for its vs_baseline columns.

    python benchmarks/measure_reference.py [--quick]
"""

import json
import os
import sys

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gpyreg as gpr  # noqa: E402  (the reference)

from benchmarks.workloads import ALL  # noqa: E402


def main():
    quick = "--quick" in sys.argv
    results = {}
    for name, fn in ALL.items():
        if quick and name == "config5_large_n":
            continue
        print(f"running {name} ...", flush=True)
        try:
            results[name] = fn(gpr)
        except Exception as e:  # keep going; record the failure
            results[name] = {"error": repr(e)}
        print(f"  {results[name]}", flush=True)

    out = os.path.join(os.path.dirname(__file__), "reference_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
