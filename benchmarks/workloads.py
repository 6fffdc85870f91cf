"""Benchmark workloads from BASELINE.md, parametrized by GP module.

Each workload takes a module with the shared gpyreg API (`gpyreg` — the
CPU reference — or `gpyreg_tpu`) and returns a dict of timings/metrics.
Running the identical code through both modules keeps the comparison
honest.  Sizes are chosen so the single-threaded NumPy reference
completes in minutes; bench.py holds the headline large-N metric.

Timings are STEADY-STATE: each config first runs an identical warm-up
fit on a twin GP (same model family and data shapes) so that one-time
XLA compilation is excluded — the production regime for a GP surrogate
is hundreds of refits of one model family (PyVBMC), not a single cold
fit.  The warm-up costs the NumPy reference one extra fit and changes
nothing algorithmically on either side.
"""

import time

import numpy as np


def _timer():
    return time.perf_counter()


def _best_of(fn, n=3):
    """Best (min) wall time of n calls: single-shot timings through the
    remote tunnel swing 2-5x on transient degradation; steady-state is
    what serving sees."""
    best = np.inf
    for _ in range(n):
        t0 = _timer()
        fn()
        best = min(best, _timer() - t0)
    return best


def _latency_stats(fn, inputs):
    """Single-shot latency distribution across len(inputs) calls
    (VERDICT r2 item 9: best-of timings alone hide the tunnel's 2-5x
    single-shot swings; a first caller sees the percentiles,
    steady-state serving the min).  ``inputs`` must be DISTINCT
    same-shape arguments, one per call: re-dispatching a compiled
    program with args identical to a previous call can return a
    memoized-transfer artifact instead of a real execution (see
    CLAUDE.md timing-artifact notes).  Returns {best, p50, p95} in
    seconds."""
    ts = []
    for x in inputs:
        t0 = _timer()
        fn(x)
        ts.append(_timer() - t0)
    ts = np.asarray(ts)
    return {
        "best": float(np.min(ts)),
        "p50": float(np.percentile(ts, 50)),
        "p95": float(np.percentile(ts, 95)),
    }


def _make(gpr, D, cov, mean):
    return gpr.GP(
        D=D,
        covariance=cov(),
        mean=mean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )


def config1_map_fit_1d(gpr, seed=0):
    """1-D SE GP, N=100, constant mean, Gaussian noise, single MAP fit
    (BASELINE.md config 1; structure of reference examples/example_1.py)."""
    np.random.seed(seed)
    N, D = 100, 1
    X = np.random.uniform(-5, 5, (N, D))
    y = np.sin(X) + 0.1 * np.random.randn(N, 1)
    opts = {"n_samples": 0, "opts_N": 3, "init_N": 1024}

    mk = lambda: _make(
        gpr, D, gpr.covariance_functions.SquaredExponential,
        gpr.mean_functions.ConstantMean,
    )
    mk().fit(X=X, y=y, options=opts)  # warm-up (compile)
    gp = mk()
    t0 = _timer()
    gp.fit(X=X, y=y, options=opts)
    fit_s = _timer() - t0
    return {"fit_s": fit_s}


def config2_matern_fit_predict(gpr, seed=1):
    """2-D Matern-5/2 ARD, N=500, MAP fit + dense-grid predict
    (BASELINE.md config 2)."""
    np.random.seed(seed)
    N, D = 500, 2
    X = np.random.uniform(-3, 3, (N, D))
    y = np.reshape(np.sin(np.sum(X, 1)) + 0.1 * np.random.randn(N), (-1, 1))
    opts = {"n_samples": 0, "opts_N": 3, "init_N": 1024}
    mk = lambda: _make(
        gpr, D, lambda: gpr.covariance_functions.Matern(degree=5),
        gpr.mean_functions.ConstantMean,
    )
    g = np.linspace(-5, 5, 100)
    xx, yy = np.meshgrid(g, g)
    xs = np.array((xx.ravel(), yy.ravel())).T  # 10k grid points

    warm = mk()
    warm.fit(X=X, y=y, options=opts)  # warm-up (compile)
    warm.predict(xs)

    gp = mk()
    t0 = _timer()
    gp.fit(X=X, y=y, options=opts)
    fit_s = _timer() - t0
    rng = np.random.default_rng(seed + 1)
    variants = [
        xs + rng.uniform(-0.05, 0.05, xs.shape) for _ in range(10)
    ]
    stats = _latency_stats(lambda x: gp.predict(x), variants)
    return {
        "fit_s": fit_s,
        "predict_s": stats["best"],
        "predict_p50_s": stats["p50"],
        "predict_p95_s": stats["p95"],
        "grid_pts": xs.shape[0],
    }


def config3_mcmc_hyperposterior(gpr, seed=2):
    """D=8 ARD-SE, N=256, slice-sampled 8-sample hyperposterior +
    mixture predictions (BASELINE.md config 3)."""
    np.random.seed(seed)
    N, D = 256, 8
    X = np.random.uniform(-3, 3, (N, D))
    y = np.reshape(np.sin(np.sum(X, 1)) + 0.1 * np.random.randn(N), (-1, 1))
    opts = {"n_samples": 8, "opts_N": 2, "init_N": 256, "thin": 5}
    mk = lambda: _make(
        gpr, D, gpr.covariance_functions.SquaredExponential,
        gpr.mean_functions.ConstantMean,
    )
    xs = np.random.uniform(-3, 3, (2000, D))

    warm = mk()
    warm.fit(X=X, y=y, options=opts)  # warm-up (compile)
    warm.predict(xs)

    gp = mk()
    t0 = _timer()
    gp.fit(X=X, y=y, options=opts)
    fit_s = _timer() - t0
    variants = [
        np.random.default_rng(seed + 1 + i).uniform(-3, 3, xs.shape)
        for i in range(10)
    ]
    stats = _latency_stats(lambda x: gp.predict(x), variants)
    return {
        "fit_s": fit_s,
        "predict_s": stats["best"],
        "predict_p50_s": stats["p50"],
        "predict_p95_s": stats["p95"],
    }


def config4_pyvbmc_warm_refits(gpr, seed=3, n_refits=5):
    """PyVBMC-style surrogate: negative-quadratic mean, user-provided
    heteroskedastic noise, repeated warm-started refits
    (BASELINE.md config 4)."""
    np.random.seed(seed)
    N, D = 200, 3
    X = np.random.uniform(-3, 3, (N, D))
    s2 = 0.01 + 0.01 * np.random.rand(N, 1)
    y = np.reshape(
        -np.sum(X**2, 1) + np.sqrt(s2.ravel()) * np.random.randn(N), (-1, 1)
    )
    def mk():
        return gpr.GP(
            D=D,
            covariance=gpr.covariance_functions.SquaredExponential(),
            mean=gpr.mean_functions.NegativeQuadratic(),
            noise=gpr.noise_functions.GaussianNoise(
                constant_add=True, user_provided_add=True
            ),
        )

    opts0 = {"n_samples": 4, "opts_N": 2, "init_N": 256, "thin": 2}
    opts_w = {"n_samples": 4, "opts_N": 1, "init_N": 0, "thin": 2}
    # Warm-up both programs: the cold fit AND one warm refit (the
    # refit uses different static options -> different programs).
    warm = mk()
    warm.fit(X=X, y=y, s2=s2, options=opts0)
    warm.fit(options=opts_w)

    gp = mk()
    t0 = _timer()
    gp.fit(X=X, y=y, s2=s2, options=opts0)
    cold_fit_s = _timer() - t0

    warm_s = []
    for k in range(n_refits):
        Xn = np.random.uniform(-3, 3, (10, D))
        s2n = 0.01 + 0.01 * np.random.rand(10, 1)
        yn = np.reshape(
            -np.sum(Xn**2, 1) + np.sqrt(s2n.ravel()) * np.random.randn(10),
            (-1, 1),
        )
        gp.update(X_new=Xn, y_new=yn, s2_new=s2n, compute_posterior=False)
        t0 = _timer()
        gp.fit(options=opts_w)
        warm_s.append(_timer() - t0)
    return {
        "cold_fit_s": cold_fit_s,
        # Median is the headline: a single transient tunnel degradation
        # (known 2-6x swings, CLAUDE.md) in a 5-refit loop drags the
        # mean far off the steady state one observed run reported
        # warm_mean 1.98 s vs median ~0.22 s.  Max discloses the tail.
        "warm_refit_s": float(np.median(warm_s)),
        "warm_refit_s_mean": float(np.mean(warm_s)),
        "warm_refit_s_max": float(np.max(warm_s)),
    }


def config5_large_n(gpr, seed=4, N=16384, D=10, S=8, M=10000, dtype=None):
    """Large-N exact GP: batched posterior across 8 hyp samples +
    chunked prediction (BASELINE.md config 5).  M defaults to 10k so the
    reference finishes; the TPU suite also reports M=100k."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(N, D))
    y = np.sum(np.sin(X), axis=1, keepdims=True) + 0.1 * rng.normal(
        size=(N, 1)
    )
    kwargs = {}
    if dtype is not None:
        kwargs["dtype"] = dtype
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        **kwargs,
    )
    hyp = np.concatenate([np.zeros(D), [0.0], [-1.0], [0.0]])[
        None, :
    ] + 0.02 * rng.normal(size=(S, D + 3))
    xs = rng.normal(size=(M, D))

    gp.update(X_new=X, y_new=y, hyp=hyp)  # warm-up (compile)
    # Warm up the FULL M-shaped chunked-predict program: the first call
    # at a new test-set shape includes its (remote) compile, which at
    # M=100k costs tens of seconds and is not steady-state serving.
    gp.predict(xs)

    t0 = _timer()
    gp.update(hyp=hyp + 1e-4, compute_posterior=True)
    posterior_s = _timer() - t0

    t0 = _timer()
    mu, s2 = gp.predict(xs)
    predict_s = _timer() - t0
    assert np.all(np.isfinite(mu))
    return {
        "posterior_build_s": posterior_s,
        "predict_s": predict_s,
        "predict_pts_per_s": M / predict_s,
    }


ALL = {
    "config1_map_fit_1d": config1_map_fit_1d,
    "config2_matern_fit_predict": config2_matern_fit_predict,
    "config3_mcmc_hyperposterior": config3_mcmc_hyperposterior,
    "config4_pyvbmc_warm_refits": config4_pyvbmc_warm_refits,
    "config5_large_n": config5_large_n,
}
