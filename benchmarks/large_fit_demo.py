"""Fit an exact GP at N=65,536 on ONE chip — past the Cholesky limit.

The 65k^2 kernel matrix would be 17 GB in f32 (unmaterializable on a
16 GB v5e, and far beyond the reference's RAM-resident NumPy path).
This demo runs the full matrix-free BBMM workflow THROUGH THE PUBLIC
``GP`` API (round-3 upgrade; the round-2 version drove the expert-level
ops directly):

  1. ``gp.fit(options={"method": "cg"})``: small CG-ranked Sobol design
     + L-BFGS-B over the stochastic objective (CG quadratic term + SLQ
     log-determinant + Hutchinson gradient, ops/iterative.cg_nlml);
  2. ``gp.predict``: chunked matrix-free CG serving with the weight
     vector cached on the matrix-free posterior.

Prints one JSON line with fit/predict timings and the recovered
hyperparameters.  Run on the TPU: python benchmarks/large_fit_demo.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gpyreg_tpu as gpr


def main(N=65536, D=4, M=2048):
    rng = np.random.default_rng(0)
    ell_true, sf_true, sn_true = 1.0, 1.0, 0.1
    X = rng.normal(size=(N, D))
    y = np.sum(np.sin(X / ell_true), axis=1, keepdims=True) + (
        sn_true * rng.normal(size=(N, 1))
    )
    xs = rng.normal(size=(M, D))

    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        dtype=np.float32,
    )
    hyp0 = np.concatenate([np.full(D, 0.5), [0.0], [-1.0], [0.0]])
    LB = np.full(D + 3, -6.0)
    UB = np.full(D + 3, 6.0)
    gp.set_bounds(
        {
            k: (LB[0], UB[0])
            for k in (
                "covariance_log_lengthscale",
                "covariance_log_outputscale",
                "noise_log_scale",
                "mean_const",
            )
        }
    )

    t0 = time.perf_counter()
    hyp_fit, res, _ = gp.fit(
        X=X,
        y=y,
        hyp0=hyp0,
        options={
            "method": "cg",
            "cg_row_chunk": 2048,
            "cg_n_probes": 8,
            "cg_n_lanczos": 24,
            "cg_tol": 1e-4,
            "cg_max_iter": 300,
            "cg_max_opt_iter": 40,
            "cg_init_N": 8,
            "cg_predict_tol": 1e-5,
            "tol_opt": 1e-5,
        },
    )
    fit_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    mu, var = gp.predict(xs)
    predict_s = time.perf_counter() - t0

    # Warm repeat: the cached weight vector makes serving pay only the
    # per-test-chunk work.
    t0 = time.perf_counter()
    mu2, var2 = gp.predict(xs)
    predict_warm_s = time.perf_counter() - t0

    hyp_row = np.ravel(hyp_fit)
    out = {
        "N": N,
        "D": D,
        "fit_s": round(fit_s, 2),
        "fit_nlml": round(float(res.fun), 2),
        "opt_iters": int(res.nit),
        "predict_s": round(predict_s, 2),
        "predict_warm_s": round(predict_warm_s, 2),
        "predict_pts": M,
        "hyp_fit": [round(float(v), 3) for v in hyp_row],
        "fit_timings": {
            k: round(v, 2) for k, v in gp.fit_timings.items()
        },
        "recovered_log_sn": round(float(hyp_row[D + 1]), 3),
        "true_log_sn": round(float(np.log(sn_true)), 3),
    }
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(var))
    assert np.max(np.abs(mu - mu2)) == 0.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
