"""North-star warm REFIT: the PyVBMC steady-state pattern measured on
the real TPU at N=16384, D=10 ARD-SE.

PyVBMC refits its surrogate every iteration after adding a couple of
training points; the hyperposterior barely moves.  The MATLAB oracle's
answer is the slicelite ESS shortcut (gplite_train.m:178-197): when the
previous samples' importance-weight ESS under the new data stays above
0.5, skip the 1024-candidate design and the multistart MAP outright and
refresh each previous sample with a few no-adapt slice sweeps.

This script measures, at the full north-star scale:
  1. cold fit (sampler="slicelite", full pipeline) — the baseline;
  2. refit #1 after +2 data points (crosses a pad bucket: pays the
     one-time remote compiles of the refresh programs at the new
     bucket);
  3. refit #2 after +2 more points (same bucket: the true steady
     state) — the number that matters for a PyVBMC loop;
  4. the same +2-point refit with the standard full pipeline
     (sampler="slicesample") for the side-by-side.

Prints one JSON line.  Run alone on the TPU (CLAUDE.md: one TPU
process at a time).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from north_star import N, D, S_N, THIN, make_data  # noqa: E402


def main():
    import gpyreg_tpu as gpr

    X, y, _ = make_data()
    rng = np.random.default_rng(42)

    def extra_points(k):
        Xe = rng.uniform(-3, 3, (k, D))
        ye = (
            np.sum(np.sin(Xe[:, :3]), axis=1, keepdims=True)
            + 0.5 * np.sum(Xe[:, 3:5] ** 2, axis=1, keepdims=True) / 3.0
            + 0.1 * rng.normal(size=(k, 1))
        )
        return Xe, ye

    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        dtype=np.float32,
    )
    opts = {
        "sampler": "slicelite",
        "n_samples": S_N,
        "thin": THIN,
        "opts_N": 3,
        "init_N": 1024,
    }

    np.random.seed(0)
    t0 = time.perf_counter()
    gp.fit(X=X, y=y, options=dict(opts))
    cold_s = time.perf_counter() - t0
    print(f"# cold slicelite fit: {cold_s:.1f} s", flush=True)

    results = {"cold_fit_s": round(cold_s, 1)}
    Xc, yc = X, y
    for tag in ("refit1_bucket_cross", "refit2_steady"):
        Xe, ye = extra_points(2)
        Xc = np.vstack([Xc, Xe])
        yc = np.vstack([yc, ye])
        t0 = time.perf_counter()
        hyp, opt_res, sr = gp.fit(X=Xc, y=yc, options=dict(opts))
        dt = time.perf_counter() - t0
        shortcut = opt_res is None
        results[tag + "_s"] = round(dt, 1)
        results[tag + "_shortcut"] = bool(shortcut)
        if shortcut:
            results[tag + "_ess_frac"] = round(float(sr["ess_frac"]), 3)
            results[tag + "_thin_eff"] = int(sr["thin_eff"])
        print(
            f"# {tag}: {dt:.1f} s shortcut={shortcut} "
            f"timings={ {k: round(v, 1) for k, v in gp.fit_timings.items()} }",
            flush=True,
        )

    # Side-by-side: the same steady-state refit through the full
    # pipeline (what every refit cost before slicelite).
    Xe, ye = extra_points(2)
    Xc = np.vstack([Xc, Xe])
    yc = np.vstack([yc, ye])
    full_opts = dict(opts)
    full_opts["sampler"] = "slicesample"
    t0 = time.perf_counter()
    gp.fit(X=Xc, y=yc, options=full_opts)
    full_s = time.perf_counter() - t0
    results["full_pipeline_refit_s"] = round(full_s, 1)
    results["refit_speedup"] = round(
        full_s / max(results["refit2_steady_s"], 1e-9), 1
    )
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
