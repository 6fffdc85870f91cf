"""Hyperposterior sampler study at the north-star chain shape.

The 16k chain phase is compute-bound at the native-Cholesky roofline
(benchmarks/chain_eval_profile.py), so further north-star gains are
algorithmic: which of the ported gplite sampler options buys the same
posterior for fewer wall-seconds?  Runs the FULL north-star fit
(N=16384, D=10 ARD-SE: 1024-candidate design + 3-restart MAP + 8-sample
hyperposterior) once per sampler with an identical seed (same design,
same MAP start, same widths), and reports:

  - fit_timings (the sample_s phase is the comparison axis)
  - convergence diagnostics (exit_flag, max R-hat, min eff_N)
  - hyperparameter posterior mean/std per sampler
  - predictive agreement on 2000 held-out points vs the slicesample
    baseline, as max |dmu| / predictive std and the s2 ratio envelope
    (different exact samplers must agree to within posterior spread)

Samplers: slicesample (reference default), covsample (gplite
random-direction slice, gplite_train.m:392-407), mala
(gplite_train.m:409-431, Nhyp-scaled counts), hmc
(gplite_train.m:433-447, 10 leapfrog steps), slicelite
(gplite_train.m:359-390; its warm repeat exercises the ESS
warm-refit shortcut).  'eissample' (2(D+1)
walkers, every walker moves per iteration) is behind --all: at N=16384
its batched evals are compute-bound so a full run costs about as much
as slicesample.

Usage: python benchmarks/sampler_study.py [--all] [--samplers a,b,...]
Prints one JSON line per sampler as it completes (plus a final summary
line), so a partial run still yields data.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, M = 16384, 10, 2000
S_N, THIN = 8, 5


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-3, 3, (N, D))
    y = (
        np.sum(np.sin(X[:, :3]), axis=1, keepdims=True)
        + 0.5 * np.sum(X[:, 3:5] ** 2, axis=1, keepdims=True) / 3.0
        + 0.1 * rng.normal(size=(N, 1))
    )
    xs = rng.uniform(-3, 3, (M, D))
    return X, y, xs


def main():
    global N, M
    if "--smoke" in sys.argv:  # CPU-sized script check
        import jax

        jax.config.update("jax_platforms", "cpu")
        N, M = 256, 200

    import gpyreg_tpu as gpr

    samplers = ["slicesample", "covsample", "mala", "hmc", "slicelite"]
    if "--all" in sys.argv:
        samplers.append("eissample")
    if "--samplers" in sys.argv:
        i = sys.argv.index("--samplers")
        if i + 1 >= len(sys.argv):
            sys.exit("--samplers requires a comma-separated list")
        samplers = sys.argv[i + 1].split(",")

    X, y, xs = make_data()
    opts = {"n_samples": S_N, "thin": THIN, "opts_N": 3, "init_N": 1024}

    base_mu = base_sd = None
    results = []
    for name in samplers:
        gp = gpr.GP(
            D=D,
            covariance=gpr.covariance_functions.SquaredExponential(),
            mean=gpr.mean_functions.ConstantMean(),
            noise=gpr.noise_functions.GaussianNoise(constant_add=True),
            dtype=np.float32,
        )
        np.random.seed(0)  # identical design / MAP start across samplers
        t0 = time.perf_counter()
        hyp, _opt, samp = gp.fit(
            X=X, y=y, options={**opts, "sampler": name}
        )
        wall = time.perf_counter() - t0
        cold_timings = dict(gp.fit_timings)
        if "--once" not in sys.argv:
            # Each sampler's first fit pays its own chain-program remote
            # compiles (minutes at 16k); the warm repeat is the
            # comparison axis (same contract as north_star.py).
            np.random.seed(1)
            t0 = time.perf_counter()
            hyp, _opt, samp = gp.fit(
                X=X, y=y, options={**opts, "sampler": name}
            )
            wall = time.perf_counter() - t0
        mu, s2 = gp.predict(xs)
        mu, sd = mu.ravel(), np.sqrt(np.maximum(s2.ravel(), 1e-20))

        R = samp.get("R") if samp else None
        eff = samp.get("eff_N") if samp else None
        rec = {
            "sampler": name,
            "fit_wall_s": round(wall, 1),
            "timings_s": {
                k: round(v, 1) for k, v in gp.fit_timings.items()
            },
            "exit_flag": None if samp is None else samp["exit_flag"],
            "max_R": None if R is None else round(float(np.max(R)), 3),
            "min_eff_N": (
                None if eff is None else round(float(np.min(eff)), 1)
            ),
            "hyp_mean": [round(float(v), 3) for v in np.mean(hyp, 0)],
            "hyp_std": [round(float(v), 3) for v in np.std(hyp, 0)],
        }
        if base_mu is None:
            base_mu, base_sd = mu, sd
        else:
            rec["max_dmu_over_sd"] = round(
                float(np.max(np.abs(mu - base_mu) / base_sd)), 3
            )
            rec["sd_ratio_range"] = [
                round(float(np.min(sd / base_sd)), 3),
                round(float(np.max(sd / base_sd)), 3),
            ]
        results.append(rec)
        print(json.dumps(rec), flush=True)

    base = results[0]["timings_s"].get("sample_s", None)
    print(
        json.dumps(
            {
                "summary": {
                    r["sampler"]: {
                        "sample_s": r["timings_s"].get("sample_s"),
                        "speedup_vs_slice": (
                            None
                            if not base
                            or not r["timings_s"].get("sample_s")
                            else round(
                                base / r["timings_s"]["sample_s"], 2
                            )
                        ),
                    }
                    for r in results
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
