"""Fit an exact GP at N=65,536 on ONE chip — past the Cholesky limit.

The 65k^2 kernel matrix would be 17 GB in f32 (unmaterializable on a
16 GB v5e, and far beyond the reference's RAM-resident NumPy path).
This demo runs the full matrix-free BBMM workflow:

  1. MAP hyperparameter fit: L-BFGS-B over the stochastic objective
     (CG quadratic term + SLQ log-determinant + Hutchinson gradient,
     ops/iterative.cg_nlml) with fixed probes;
  2. serving: chunked matrix-free CG prediction (ops/iterative.cg_predict).

Prints one JSON line with fit/predict timings and the recovered
hyperparameters.  Run on the TPU: python benchmarks/large_fit_demo.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gpyreg_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from gpyreg_tpu.core.model import ModelSpec
from gpyreg_tpu.ops.iterative import cg_nlml, cg_predict, fit_cg


def main(N=65536, D=4, M=2048):
    rng = np.random.default_rng(0)
    ell_true, sf_true, sn_true = 1.0, 1.0, 0.1
    X = rng.normal(size=(N, D)).astype(np.float32)
    y = (
        np.sum(np.sin(X / ell_true), axis=1, keepdims=True)
        + sn_true * rng.normal(size=(N, 1))
    ).astype(np.float32)
    xs = rng.normal(size=(M, D)).astype(np.float32)

    spec = ModelSpec(
        D=D,
        cov="se",
        mean="const",
        noise_constant=True,
        noise_user=0,
        noise_rectified=False,
    )
    hyp0 = np.concatenate([np.full(D, 0.5), [0.0], [-1.0], [0.0]])
    LB = np.full(D + 3, -6.0)
    UB = np.full(D + 3, 6.0)

    key = jax.random.key(7)
    # Warm-up / compile.
    cg_nlml(
        spec, hyp0, X, y, key=key, compute_grad=True,
        row_chunk=2048, n_probes=8, n_lanczos=24, tol=1e-4, max_iter=300,
    )

    t0 = time.perf_counter()
    hyp_fit, res = fit_cg(
        spec, X, y, hyp0=hyp0, LB=LB, UB=UB, key=key,
        row_chunk=2048, n_probes=8, n_lanczos=24,
        cg_tol=1e-4, max_iter=300, max_opt_iter=40, tol=1e-5,
    )
    fit_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    mu, var, info = cg_predict(
        spec, hyp_fit, X, y, None, xs, compute_var=True,
        tol=1e-5, row_chunk=2048, test_chunk=1024, max_iter=400,
    )
    predict_s = time.perf_counter() - t0

    out = {
        "N": N,
        "D": D,
        "fit_s": round(fit_s, 2),
        "fit_nlml": round(float(res.fun), 2),
        "opt_iters": int(res.nit),
        "predict_s": round(predict_s, 2),
        "predict_pts": M,
        "hyp_fit": [round(float(v), 3) for v in hyp_fit],
        "alpha_residual": info["alpha_rel_residual"],
        "recovered_log_sn": round(float(hyp_fit[D + 1]), 3),
        "true_log_sn": round(float(np.log(sn_true)), 3),
    }
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(var))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
