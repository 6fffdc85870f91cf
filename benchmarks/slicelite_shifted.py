"""Slicelite warm refit under SHIFTED data at the north-star scale
(VERDICT r4 #5): the real PyVBMC inner-loop pattern is not
refit-on-identical-data (the round-4 240.7 s row, ESS fraction 1.0)
but fit -> add ~5% new points -> warm refit, where the ESS fraction
degrades and thin_eff scales up (gplite_train.m:192-195).

Measures on the TPU at N=16384 (+5% -> 17203), D=10 ARD-SE:
  1. cold slicelite fit at N=16384 (the baseline pipeline);
  2. warm refit after +819 points (5%): ESS fraction, thin_eff,
     wall, and the compile bill (fit_timings n_compiles/compile_s) —
     the bucket crossing pays fresh refresh-program compiles once;
  3. a second +0-point warm refit at the new N (the steady state at
     the new bucket, compiles amortized);
  4. [--full] a full slicesample fit on the shifted data for the
     side-by-side.

One JSON line per row.  Run alone on the TPU (CLAUDE.md).
Usage: python benchmarks/slicelite_shifted.py [--smoke] [--full]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from north_star import D, N, S_N, THIN, make_data  # noqa: E402

GROW_FRAC = 0.05


def row(tag, gp, wall, sr, extra=None):
    out = {
        "row": tag,
        "wall_s": round(wall, 1),
        "timings_s": {
            k: (round(v, 1) if isinstance(v, float) else v)
            for k, v in gp.fit_timings.items()
        },
    }
    if sr is not None:
        for k in ("ess_frac", "thin_eff", "exit_flag"):
            if k in sr:
                v = sr[k]
                out[k] = round(float(v), 3) if v is not None else None
    # The measured fraction even when the shortcut was rejected.
    v = getattr(gp, "slicelite_ess_frac", None)
    if v is not None and "ess_frac" not in out:
        out["ess_frac_rejected"] = round(float(v), 3)
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def main():
    n, d = N, D
    if "--smoke" in sys.argv:
        os.environ["GPYREG_TPU_NO_COMPILE_CACHE"] = "1"
        import jax

        jax.config.update("jax_platforms", "cpu")
        n, d = 256, 3

    import gpyreg_tpu as gpr

    rng = np.random.default_rng(0)
    grow = int(round(GROW_FRAC * n))
    if n == N:
        X, y, _ = make_data()
    else:
        X = rng.uniform(-3, 3, (n, d))
        y = (np.sum(np.sin(X[:, : min(3, d)]), axis=1, keepdims=True)
             + 0.1 * rng.normal(size=(n, 1)))
    Xg = rng.uniform(-3, 3, (grow, d))
    yg = (np.sum(np.sin(Xg[:, : min(3, d)]), axis=1, keepdims=True)
          + 0.1 * rng.normal(size=(grow, 1)))
    Xn = np.vstack([X, Xg])
    yn = np.vstack([y, yg])

    opts = {
        "sampler": "slicelite",
        "n_samples": S_N,
        "thin": THIN,
    }

    gp = gpr.GP(
        D=d,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        dtype=np.float32,
    )
    t0 = time.perf_counter()
    _, opt_res, sr = gp.fit(X=X, y=y, options=dict(opts))
    row("cold_slicelite_fit", gp, time.perf_counter() - t0, sr,
        {"N": n, "full_pipeline": opt_res is not None})

    # +5% points: the PyVBMC growth step.  The warm shortcut either
    # fires with degraded ESS (thin_eff scales up) or falls back to
    # the full pipeline — both are the honest measured behavior.
    t0 = time.perf_counter()
    _, opt_res, sr = gp.fit(X=Xn, y=yn, options=dict(opts))
    row("warm_refit_plus5pct", gp, time.perf_counter() - t0, sr,
        {"N": n + grow, "shortcut_fired": opt_res is None})

    # Steady state at the new bucket (identical data, compiles paid).
    t0 = time.perf_counter()
    _, opt_res, sr = gp.fit(X=Xn, y=yn, options=dict(opts))
    row("warm_refit_steady", gp, time.perf_counter() - t0, sr,
        {"N": n + grow, "shortcut_fired": opt_res is None})

    if "--full" in sys.argv:
        # Release the slicelite model's device posterior factors first:
        # two live 17k posteriors (~9.5 GB of factors each side) do not
        # fit one 16 GB chip — the first run of this script died
        # RESOURCE_EXHAUSTED in the second model's posterior build.
        gp.clean()
        gpf = gpr.GP(
            D=d,
            covariance=gpr.covariance_functions.SquaredExponential(),
            mean=gpr.mean_functions.ConstantMean(),
            noise=gpr.noise_functions.GaussianNoise(constant_add=True),
            dtype=np.float32,
        )
        t0 = time.perf_counter()
        _, _, srf = gpf.fit(
            X=Xn, y=yn,
            options={"n_samples": S_N, "thin": THIN},
        )
        row("full_slicesample_fit", gpf, time.perf_counter() - t0, srf,
            {"N": n + grow})


if __name__ == "__main__":
    main()
