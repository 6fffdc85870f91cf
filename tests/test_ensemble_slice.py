"""Ensemble slice sampler (eissample_lite.m port, half-ensemble TPU
redesign): statistical correctness on analytic targets, affine
invariance on correlated Gaussians, bounds, determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpyreg_tpu.inference import ensemble_slice


def test_normal_moments():
    mu, sigma = 1.0, 1.5
    log_f = lambda x: -0.5 * jnp.sum(((x - mu) / sigma) ** 2)
    res, _ = ensemble_slice.sample(
        log_f, np.zeros(2), jax.random.key(0), n_samples=6000, burn=200
    )
    s = res["samples"]
    assert s.shape == (6000, 2)
    assert np.max(np.abs(np.mean(s, 0) - mu)) < 0.1
    assert np.max(np.abs(np.std(s, 0) - sigma)) < 0.15


def test_correlated_gaussian_affine_invariance():
    """Strongly correlated target — the differential directions adapt
    to the covariance, where coordinate-wise slice sampling would crawl."""
    cov = np.array([[1.0, 0.97], [0.97, 1.0]])
    icov = jnp.asarray(np.linalg.inv(cov))
    log_f = lambda x: -0.5 * x @ icov @ x
    res, _ = ensemble_slice.sample(
        log_f, np.zeros(2), jax.random.key(1), n_samples=8000, burn=400
    )
    s = res["samples"]
    emp = np.cov(s.T)
    assert np.max(np.abs(emp - cov)) < 0.25
    assert abs(np.corrcoef(s.T)[0, 1] - 0.97) < 0.05


def test_bounds_respected():
    log_f = lambda x: jnp.asarray(0.0)
    res, _ = ensemble_slice.sample(
        log_f,
        np.array([0.5]),
        jax.random.key(2),
        LB=np.array([0.0]),
        UB=np.array([1.0]),
        n_samples=4000,
        burn=200,
    )
    s = res["samples"]
    assert np.all((s >= 0) & (s <= 1))
    assert abs(np.mean(s) - 0.5) < 0.05
    assert abs(np.var(s) - 1 / 12) < 0.02


def test_key_determinism():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    a, _ = ensemble_slice.sample(
        log_f, np.zeros(2), jax.random.key(3), n_samples=100, burn=20
    )
    b, _ = ensemble_slice.sample(
        log_f, np.zeros(2), jax.random.key(3), n_samples=100, burn=20
    )
    assert np.array_equal(a["samples"], b["samples"])


def test_walker_defaults_and_validation():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    res, final = ensemble_slice.sample(
        log_f, np.zeros(3), jax.random.key(4), n_samples=50, burn=10
    )
    # K = 2*(D+1) = 8 walkers
    assert final.shape == (8, 3)
    with pytest.raises(ValueError):
        ensemble_slice.sample(
            log_f,
            np.array([2.0]),
            jax.random.key(5),
            LB=np.array([0.0]),
            UB=np.array([1.0]),
            n_samples=10,
        )


def test_gp_hyperposterior_smoke():
    """End-to-end: ensemble-sample a GP hyperposterior surface."""
    import gpyreg_tpu as gpr

    rng = np.random.default_rng(0)
    X = rng.uniform(-3, 3, (25, 1))
    y = np.sin(X) + 0.1 * rng.normal(size=(25, 1))
    gp = gpr.GP(
        D=1,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp.X, gp.y = X, y
    fns, args = gp._obj_args()
    res, _ = ensemble_slice.sample(
        fns["log_post_raw"],
        np.array([0.0, 0.0, -1.0, 0.0]),
        jax.random.key(6),
        n_samples=64,
        burn=32,
        LB=np.full(4, -8.0),
        UB=np.full(4, 8.0),
        f_args=args,
    )
    s = res["samples"]
    assert s.shape == (64, 4)
    assert np.all(np.isfinite(s))
    assert np.all(np.isfinite(res["f_vals"]))


def test_diagnostics_populated():
    """Cross-walker R-hat / eff_N / exit flag on an easy target."""
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    res, _ = ensemble_slice.sample(
        log_f, np.zeros(2), jax.random.key(7), n_samples=2000, burn=200
    )
    assert res["exit_flag"] == 1
    assert res["R"] is not None and res["R"].shape == (2,)
    assert np.all(np.abs(res["R"] - 1.0) < 0.1)
    assert res["eff_N"] is not None and np.all(res["eff_N"] > 200)


def test_log_prior_reporting():
    """log_priors are real per-sample values and f_vals excludes them."""
    log_f = lambda x: -0.5 * jnp.sum(x**2) - 0.1 * jnp.sum(x**4)
    log_prior = lambda x: -0.1 * jnp.sum(x**4)
    res, _ = ensemble_slice.sample(
        log_f,
        np.zeros(2),
        jax.random.key(8),
        n_samples=200,
        burn=50,
        log_prior=log_prior,
    )
    s = res["samples"]
    lp_expect = -0.1 * np.sum(s**4, axis=1)
    assert np.allclose(res["log_priors"], lp_expect, atol=1e-10)
    full = -0.5 * np.sum(s**2, axis=1) - 0.1 * np.sum(s**4, axis=1)
    assert np.allclose(
        res["f_vals"].ravel(), full - lp_expect, atol=1e-10
    )


def test_fit_returns_populated_diagnostics_eissample():
    """Twin of the device-slice diagnostics test for sampler='eissample'
    (VERDICT r2 item 5): fit returns real R/eff_N/exit_flag/log_priors."""
    import gpyreg_tpu as gpr

    rng = np.random.default_rng(5)
    X = rng.uniform(-3, 3, (30, 1))
    y = np.sin(X) + 0.1 * rng.normal(size=(30, 1))
    gp = gpr.GP(
        D=1,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp.set_priors(
        {
            "covariance_log_lengthscale": ("gaussian", (0.0, 1.0)),
            "covariance_log_outputscale": ("gaussian", (0.0, 1.0)),
            "noise_log_scale": ("student_t", (-2.0, 1.0, 3.0)),
            "mean_const": ("gaussian", (0.0, 1.0)),
        }
    )
    np.random.seed(3)
    hyp, _, sampling_result = gp.fit(
        X=X, y=y,
        options={"n_samples": 8, "opts_N": 1, "init_N": 16,
                 "sampler": "eissample", "thin": 2},
    )
    n_hyp = hyp.shape[1]
    assert sampling_result["exit_flag"] in (1, 0, -1, -2, -3)
    assert sampling_result["R"] is not None
    assert sampling_result["R"].shape == (n_hyp,)
    assert np.all(np.isfinite(sampling_result["R"]))
    assert sampling_result["eff_N"] is not None
    assert np.all(sampling_result["eff_N"] > 0)
    # Real per-sample log-prior values (not the round-2 zeros stub),
    # consistent with the GP's own log-posterior decomposition.
    lp = sampling_result["log_priors"]
    s = sampling_result["samples"]
    fv = sampling_result["f_vals"].ravel()
    assert lp.shape == (s.shape[0],)
    assert np.all(np.isfinite(lp))
    assert np.any(lp != 0.0)  # real values, not the round-2 zeros stub
    i = 0
    expect_full = gp.log_posterior(s[i])
    expect_nlz = -gp.log_likelihood(s[i])
    assert np.isclose(
        lp[i], expect_full + expect_nlz, rtol=1e-8, atol=1e-8
    )
    # f_vals excludes the prior (the reference result contract).
    assert np.isclose(fv[i], -expect_nlz, rtol=1e-8, atol=1e-8)


def test_fit_with_eissample_option():
    import gpyreg_tpu as gpr

    rng = np.random.default_rng(1)
    X = rng.uniform(-3, 3, (30, 1))
    y = np.sin(X) + 0.1 * rng.normal(size=(30, 1))
    gp = gpr.GP(
        D=1,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    np.random.seed(0)
    hyp, _, _ = gp.fit(
        X=X, y=y,
        options={"n_samples": 4, "opts_N": 1, "init_N": 16,
                 "sampler": "eissample"},
    )
    assert hyp.shape == (4, 4)
    mu, s2 = gp.predict(np.linspace(-3, 3, 10)[:, None])
    assert np.all(np.isfinite(mu)) and np.all(s2 >= 0)
    with pytest.raises(ValueError):
        gp.fit(X=X, y=y, options={"sampler": "nope", "init_N": 4,
                                  "opts_N": 0, "n_samples": 2})
