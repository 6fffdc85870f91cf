"""MXU serving-path study: trsm vs pre-inverted-factor prediction at
the north-star serving shape (N=16384, D=10, S=8 posterior samples,
M=100k test points, f32).

Measures warm throughput of both paths with DISTINCT inputs per timed
call (identical-args re-dispatch can return a memoized-transfer
artifact — CLAUDE.md), plus the paths' mutual max |delta s2| and, with
--f64check, each path's accuracy against a CPU f64 twin on a 2k-point
subset.

Usage:
  python benchmarks/mxu_serving.py            # TPU side
  python benchmarks/mxu_serving.py --f64check # CPU side afterwards
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, S, M = 16384, 10, 8, 100_000
STATE = "/tmp/mxu_serving_tpu.json"


def make_problem(seed=4):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(N, D))
    y = np.sum(np.sin(X), axis=1, keepdims=True) + 0.1 * rng.normal(
        size=(N, 1)
    )
    hyp = np.concatenate([np.zeros(D), [0.0], [-1.0], [0.0]])[
        None, :
    ] + 0.02 * rng.normal(size=(S, D + 3))
    return X, y, hyp, rng


def make_gp(gpr, dtype, **kw):
    return gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        dtype=dtype,
        **kw,
    )


def tpu_side():
    import gpyreg_tpu as gpr

    X, y, hyp, rng = make_problem()
    xs_warm = rng.normal(size=(M, D))
    xs_timed = [rng.normal(size=(M, D)) for _ in range(3)]
    xs_check = rng.normal(size=(2048, D))

    gp = make_gp(gpr, np.float32)
    gp.update(X_new=X, y_new=y, hyp=hyp)

    out = {"side": "tpu", "N": N, "D": D, "S": S, "M": M}
    s2_paths = {}
    for label, flag in (("trsm", False), ("mxu", True)):
        gp.mxu_predict = flag
        gp.predict(xs_warm)  # compile + steady-state warm
        best = np.inf
        for xs in xs_timed:
            t0 = time.perf_counter()
            mu, s2 = gp.predict(xs)
            best = min(best, time.perf_counter() - t0)
        assert np.all(np.isfinite(mu)) and np.all(np.isfinite(s2))
        mu_c, s2_c = gp.predict(xs_check)
        s2_paths[label] = s2_c
        out[f"{label}_best_s"] = round(best, 2)
        out[f"{label}_pts_per_s"] = round(M / best, 0)
    out["mutual_max_abs_ds2"] = float(
        f"{np.max(np.abs(s2_paths['mxu'] - s2_paths['trsm'])):.2e}"
    )
    out["speedup"] = round(out["mxu_pts_per_s"] / out["trsm_pts_per_s"], 2)
    with open(STATE, "w") as f:
        json.dump(
            {
                **out,
                "s2_trsm": s2_paths["trsm"].tolist(),
                "s2_mxu": s2_paths["mxu"].tolist(),
                "mu_check": mu_c.tolist(),
            },
            f,
        )
    print(json.dumps(out), flush=True)


def f64check_side():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import gpyreg_tpu as gpr

    with open(STATE) as f:
        tpu = json.load(f)
    X, y, hyp, rng = make_problem()
    rng.normal(size=(M, D))  # keep the stream aligned with tpu_side
    for _ in range(3):
        rng.normal(size=(M, D))
    xs_check = rng.normal(size=(2048, D))
    gp64 = make_gp(gpr, None)
    gp64.update(X_new=X, y_new=y, hyp=np.asarray(hyp))
    mu64, s264 = gp64.predict(xs_check)
    out = {"side": "f64check_cpu", "N": N}
    for label in ("trsm", "mxu"):
        s2 = np.asarray(tpu[f"s2_{label}"])
        out[f"{label}_max_abs_ds2_vs_f64"] = float(
            f"{np.max(np.abs(s2 - s264)):.2e}"
        )
    out["mu_max_abs_dmu_vs_f64"] = float(
        f"{np.max(np.abs(np.asarray(tpu['mu_check']) - mu64)):.2e}"
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if "--f64check" in sys.argv:
        f64check_side()
    else:
        tpu_side()
