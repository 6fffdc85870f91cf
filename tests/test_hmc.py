"""HMC sampler (gplite_train.m:433-447 'hmc' option): statistical
correctness on analytic targets, determinism, bounds, step-size
adaptation, segmented-dispatch equality, and GP fit integration
(no Nhyp scaling — one trajectory moves every dimension)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpyreg_tpu.inference import hmc


def test_normal_moments():
    mu, sigma = 1.0, 1.5
    log_f = lambda x: -0.5 * jnp.sum(((x - mu) / sigma) ** 2)
    res, _ = hmc.sample(
        log_f,
        np.zeros(2),
        jax.random.key(0),
        n_samples=4000,
        burn=800,
        widths=np.full(2, sigma),
    )
    s = res["samples"]
    assert s.shape == (4000, 2)
    assert np.max(np.abs(np.mean(s, 0) - mu)) < 0.1
    assert np.max(np.abs(np.std(s, 0) - sigma)) < 0.15
    # Adaptation should land near the 0.651 optimal acceptance.
    assert 0.4 < res["accept_rate"] < 0.9


def test_correlated_gaussian():
    cov = np.array([[1.0, 0.8], [0.8, 1.0]])
    icov = jnp.asarray(np.linalg.inv(cov))
    log_f = lambda x: -0.5 * x @ icov @ x
    res, _ = hmc.sample(
        log_f,
        np.zeros(2),
        jax.random.key(1),
        n_samples=6000,
        burn=1000,
        thin=2,
    )
    emp = np.cov(res["samples"].T)
    assert np.max(np.abs(emp - cov)) < 0.2
    assert abs(np.corrcoef(res["samples"].T)[0, 1] - 0.8) < 0.1


def test_bounds_respected():
    """A flat bounded target: the trajectory coasts out of bounds to
    -inf and the MH test rejects, so kept samples stay inside and
    converge to the uniform."""
    log_f = lambda x: jnp.asarray(0.0)
    res, _ = hmc.sample(
        log_f,
        np.array([0.5]),
        jax.random.key(2),
        LB=np.array([0.0]),
        UB=np.array([1.0]),
        n_samples=6000,
        burn=500,
    )
    s = res["samples"]
    assert np.all((s >= 0) & (s <= 1))
    assert abs(np.mean(s) - 0.5) < 0.05
    assert abs(np.var(s) - 1 / 12) < 0.02


def test_key_determinism_and_validation():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    a, _ = hmc.sample(
        log_f, np.zeros(2), jax.random.key(3), n_samples=100, burn=20
    )
    b, _ = hmc.sample(
        log_f, np.zeros(2), jax.random.key(3), n_samples=100, burn=20
    )
    assert np.array_equal(a["samples"], b["samples"])
    with pytest.raises(ValueError):
        hmc.sample(
            log_f,
            np.array([2.0]),
            jax.random.key(4),
            LB=np.array([0.0]),
            UB=np.array([1.0]),
            n_samples=10,
        )


def test_fixed_dimension_pinned():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    res, _ = hmc.sample(
        log_f,
        np.array([0.7, 0.0]),
        jax.random.key(5),
        LB=np.array([0.7, -10.0]),
        UB=np.array([0.7, 10.0]),
        n_samples=500,
        burn=100,
    )
    s = res["samples"]
    assert np.all(s[:, 0] == 0.7)
    assert np.std(s[:, 1]) > 0.1


def test_log_prior_reporting():
    log_f = lambda x: -0.5 * jnp.sum(x**2) - 0.05 * jnp.sum(x**4)
    log_prior = lambda x: -0.05 * jnp.sum(x**4)
    res, _ = hmc.sample(
        log_f,
        np.zeros(2),
        jax.random.key(6),
        n_samples=300,
        burn=60,
        log_prior=log_prior,
    )
    s = res["samples"]
    lp_expect = -0.05 * np.sum(s**4, axis=1)
    assert np.allclose(res["log_priors"], lp_expect, atol=1e-10)
    full = -0.5 * np.sum(s**2, axis=1) + lp_expect
    assert np.allclose(
        res["f_vals"].ravel(), full - lp_expect, atol=1e-10
    )


def test_segmented_matches_monolithic():
    """Equal-size bounded dispatches with device-carried state must
    reproduce the monolithic chain bit-exactly (the overshoot rows are
    discarded in the pack program, never sampled)."""
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    kw = dict(n_samples=500, burn=123, thin=2, widths=np.full(3, 1.0))
    r1, _ = hmc.sample(log_f, np.zeros(3), jax.random.key(7), **kw)
    r2, _ = hmc.sample(
        log_f, np.zeros(3), jax.random.key(7), **kw, seg_iters=100
    )
    np.testing.assert_array_equal(r1["samples"], r2["samples"])
    np.testing.assert_array_equal(r1["f_vals"], r2["f_vals"])
    assert r1["accept_rate"] == r2["accept_rate"]


def test_fit_with_hmc_option():
    """GP.fit(sampler='hmc') end to end with populated diagnostics;
    unlike MALA, no Nhyp scaling of burn/thin (gplite_train.m:433)."""
    import gpyreg_tpu as gpr

    rng = np.random.default_rng(7)
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
    np.random.seed(11)
    hyp, _, sr = gp.fit(
        X=X,
        y=y,
        options={
            "n_samples": 4,
            "opts_N": 1,
            "init_N": 16,
            "sampler": "hmc",
            "thin": 2,
        },
    )
    assert hyp.shape == (4, 4)
    mu, s2 = gp.predict(np.linspace(-3, 3, 10)[:, None])
    assert np.all(np.isfinite(mu)) and np.all(s2 >= 0)
    assert sr["exit_flag"] in (1, 0, -1, -2, -3)
    assert sr["R"] is not None and np.all(np.isfinite(sr["R"]))
    assert sr["eff_N"] is not None
    assert np.any(sr["log_priors"] != 0.0)
    i = 0
    s = sr["samples"]
    expect_lp = gp.log_posterior(s[i]) - gp.log_likelihood(s[i])
    assert np.isclose(
        sr["log_priors"][i], expect_lp, rtol=1e-8, atol=1e-8
    )


def test_fit_hmc_recovers_surface():
    """HMC and slice sampling agree on a proper (prior-regularized)
    hyperposterior."""
    import gpyreg_tpu as gpr

    rng = np.random.default_rng(8)
    X = rng.uniform(-3, 3, (40, 1))
    y = np.sin(X) + 0.2 * rng.normal(size=(40, 1))

    def make_gp():
        g = gpr.GP(
            D=1,
            covariance=gpr.covariance_functions.SquaredExponential(),
            mean=gpr.mean_functions.ConstantMean(),
            noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        )
        g.set_priors(
            {
                "covariance_log_lengthscale": ("gaussian", (0.0, 1.0)),
                "covariance_log_outputscale": ("gaussian", (0.0, 1.0)),
                "noise_log_scale": (
                    "student_t",
                    (np.log(0.2), 1.0, 7.0),
                ),
                "mean_const": ("gaussian", (0.0, 1.0)),
            }
        )
        return g

    np.random.seed(21)
    gp_a = make_gp()
    hyp_a, _, sr_a = gp_a.fit(
        X=X, y=y,
        options={"n_samples": 30, "opts_N": 1, "init_N": 32,
                 "sampler": "hmc"},
    )
    np.random.seed(21)
    gp_b = make_gp()
    hyp_b, _, _ = gp_b.fit(
        X=X, y=y,
        options={"n_samples": 30, "opts_N": 1, "init_N": 32},
    )
    assert 0.2 < sr_a["accept_rate"] < 0.95
    spread = np.maximum(np.std(hyp_b, 0), 0.1)
    assert np.all(
        np.abs(np.mean(hyp_a, 0) - np.mean(hyp_b, 0)) < 3 * spread
    )
