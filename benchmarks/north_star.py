"""North-star workload (BASELINE.json): measured end-to-end GP.fit at
N=16384, D=10 ARD-SE — 1024-candidate design, multistart MAP, 8
slice-sampled posterior samples — plus 100k-point chunked prediction,
on the real TPU, with the f32-vs-f64 NLML agreement figure.

Usage:
  python benchmarks/north_star.py            # TPU side (default)
  python benchmarks/north_star.py --ref      # CPU reference side:
      measures per-evaluation NLML / NLML+grad / posterior-build cost at
      N=16384 on the single-threaded reference and extrapolates the full
      fit from the reference's own evaluation counts (running the real
      thing would take days; the extrapolation formula is printed).
  python benchmarks/north_star.py --f64check # CPU side: recompute the
      f64 NLML at the TPU-fitted hyperparameters (written by the TPU
      side to /tmp/north_star_tpu.json) — f64 is emulated (very slow)
      on TPU, so the agreement figure runs on the CPU backend.

Each side prints one JSON line; BASELINE.md records all.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, M = 16384, 10, 100_000
S_N, THIN = 8, 5  # 8 posterior samples, reference default thin=5


def _flag_value(flag):
    """Value following ``flag`` in argv; exits with a message (instead
    of a late IndexError on this minutes-long workload) when the flag
    is given bare."""
    if flag not in sys.argv:
        return None
    i = sys.argv.index(flag)
    if i + 1 >= len(sys.argv):
        sys.exit(f"{flag} requires a value")
    return sys.argv[i + 1]


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


def tpu_side():
    import gpyreg_tpu as gpr
    import jax

    X, y, xs = make_data()

    def make_gp(dtype):
        return gpr.GP(
            D=D,
            covariance=gpr.covariance_functions.SquaredExponential(),
            mean=gpr.mean_functions.ConstantMean(),
            noise=gpr.noise_functions.GaussianNoise(constant_add=True),
            dtype=dtype,
        )

    opts = {"n_samples": S_N, "thin": THIN, "opts_N": 3, "init_N": 1024}
    # Optional TPU-first knobs (the headline row runs WITHOUT them; rows
    # measured with these flags are reported as labeled option rows):
    #   --sampler NAME       e.g. hmc / mala / covsample
    #   --design-subset N    subset ranking of the 1024 candidates
    sampler = _flag_value("--sampler")
    if sampler is not None:
        opts["sampler"] = sampler
    subset = _flag_value("--design-subset")
    if subset is not None:
        try:
            opts["design_subset"] = int(subset)
        except ValueError:
            sys.exit(
                f"--design-subset needs an integer, got {subset!r}"
            )

    # Cold fit (includes every remote compile).
    gp = make_gp(np.float32)
    np.random.seed(0)
    t0 = time.perf_counter()
    hyp, opt_res, samp_res = gp.fit(X=X, y=y, options=dict(opts))
    cold_fit_s = time.perf_counter() - t0
    cold_timings = dict(gp.fit_timings)

    # Warm refit (the PyVBMC steady state: compiled programs reused).
    np.random.seed(1)
    t0 = time.perf_counter()
    hyp, opt_res, samp_res = gp.fit(X=X, y=y, options=dict(opts))
    warm_fit_s = time.perf_counter() - t0
    warm_timings = dict(gp.fit_timings)

    # 100k-point prediction (first call + warm repeat).
    t0 = time.perf_counter()
    mu, s2 = gp.predict(xs)
    predict_first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    mu, s2 = gp.predict(xs)
    predict_warm_s = time.perf_counter() - t0
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(s2))

    # f32 NLML at the sampled hyperparameters (the f64 twin runs on the
    # CPU backend via --f64check: f64 linalg is emulated on TPU).
    ll32 = [float(gp.log_likelihood(hyp[i])) for i in range(2)]

    out = {
        "side": "tpu",
        "device": str(jax.devices()[0]),
        "N": N,
        "D": D,
        "n_samples": S_N,
        "option_flags": {
            k: opts[k]
            for k in ("sampler", "design_subset")
            if k in opts
        },
        "cold_fit_s": round(cold_fit_s, 1),
        "warm_fit_s": round(warm_fit_s, 1),
        "warm_timings_s": {
            k: round(v, 1) for k, v in warm_timings.items()
        },
        "cold_timings_s": {
            k: round(v, 1) for k, v in cold_timings.items()
        },
        "mcmc_exit_flag": samp_res["exit_flag"],
        "predict_pts": M,
        "predict_first_s": round(predict_first_s, 1),
        "predict_warm_s": round(predict_warm_s, 1),
        "predict_pts_per_s_warm": round(M / predict_warm_s, 0),
        "nlml_f32": ll32,
        "hyp_mean": [round(float(v), 3) for v in np.mean(hyp, 0)],
    }
    with open("/tmp/north_star_tpu.json", "w") as f:
        json.dump({**out, "hyp": hyp.tolist()}, f)
    print(json.dumps(out), flush=True)


def f64check_side():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import gpyreg_tpu as gpr

    with open("/tmp/north_star_tpu.json") as f:
        tpu = json.load(f)
    hyp = np.asarray(tpu["hyp"])
    X, y, _ = make_data()
    gp64 = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp64.X, gp64.y = X, y
    rel = []
    for i, ll32 in enumerate(tpu["nlml_f32"]):
        ll64 = gp64.log_likelihood(hyp[i])
        rel.append(abs(ll32 - ll64) / max(1.0, abs(ll64)))
    print(
        json.dumps(
            {
                "side": "f64check_cpu",
                "N": N,
                "nlml_f32_vs_f64_rel": float(f"{max(rel):.2e}"),
                "n_checked": len(rel),
            }
        ),
        flush=True,
    )


def ref_side():
    sys.path.insert(0, "/root/reference")
    import gpyreg as ref

    X, y, _ = make_data()
    gp = ref.GP(
        D=D,
        covariance=ref.covariance_functions.SquaredExponential(),
        mean=ref.mean_functions.ConstantMean(),
        noise=ref.noise_functions.GaussianNoise(constant_add=True),
    )
    gp.X, gp.y = X, y
    hyp = np.concatenate(
        [np.zeros(D), [0.0], [-1.5], [float(np.mean(y))]]
    )

    t0 = time.perf_counter()
    nlz = gp._GP__compute_nlZ(hyp, False, False)
    t_nograd = time.perf_counter() - t0

    t0 = time.perf_counter()
    nlz_g = gp._GP__compute_nlZ(hyp, True, False)
    t_grad = time.perf_counter() - t0

    t0 = time.perf_counter()
    gp.update(hyp=hyp.reshape(1, -1), compute_posterior=True)
    t_post = time.perf_counter() - t0

    # Extrapolation from the reference's own fit structure
    # (gaussian_process.py:910-1232): 1024 design evaluations (no grad,
    # f_min_fill.py:175), 3 L-BFGS restarts x ~50 gradient evaluations
    # (typical L-BFGS-B budget at this dimension), slice sampling
    # (burn=thin*s_N=40) + s_N*thin=40 kept iterations, each sweeping
    # hyp_N=13 dimensions with ~3 evaluations per slice (bracket +
    # shrink average), and 8 posterior rebuilds.
    hyp_N = hyp.size
    n_design = 1024
    n_optim = 3 * 50
    n_mcmc = (THIN * S_N + S_N * THIN) * hyp_N * 3
    fit_est_s = (
        n_design * t_nograd
        + n_optim * t_grad
        + n_mcmc * t_nograd
        + S_N * t_post
    )
    out = {
        "side": "reference_cpu",
        "N": N,
        "D": D,
        "t_nlml_s": round(t_nograd, 1),
        "t_nlml_grad_s": round(t_grad, 1),
        "t_posterior_build_s": round(t_post, 1),
        "eval_counts": {
            "design": n_design,
            "optimize_grad_evals": n_optim,
            "mcmc_evals": n_mcmc,
            "posterior_builds": S_N,
        },
        "fit_extrapolated_s": round(fit_est_s, 0),
        "fit_extrapolated_days": round(fit_est_s / 86400, 2),
        "note": (
            "full reference fit extrapolated from measured per-eval "
            "costs and the reference's own loop structure; running it "
            "outright is infeasible"
        ),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if "--ref" in sys.argv:
        ref_side()
    elif "--f64check" in sys.argv:
        f64check_side()
    else:
        tpu_side()
