"""Direct numerical parity against the upstream reference implementation
(acerbilab/gpyreg), when mounted at /root/reference.  Skipped elsewhere.

These tests hold the core quantities — NLML, log posterior, predictive
moments, quadrature — to tight tolerance against the NumPy reference for
identical inputs and hyperparameters, across model families.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "gpyreg")),
    reason="reference implementation not available",
)

if os.path.isdir(os.path.join(REF, "gpyreg")):
    sys.path.insert(0, REF)
    import gpyreg as ref_gpr

import gpyreg_tpu as gpr

RTOL = 1e-8


def _pair(D, cov_name, mean_name, noise_kwargs, degree=None):
    def build(mod):
        cov_cls = getattr(mod.covariance_functions, cov_name)
        cov = cov_cls(degree) if degree is not None else cov_cls()
        mean = getattr(mod.mean_functions, mean_name)()
        noise = mod.noise_functions.GaussianNoise(**noise_kwargs)
        return mod.GP(D=D, covariance=cov, mean=mean, noise=noise)

    return build(gpr), build(ref_gpr)


CONFIGS = [
    ("SquaredExponential", "ConstantMean", dict(constant_add=True), None),
    ("Matern", "ZeroMean", dict(constant_add=True), 3),
    ("Matern", "ConstantMean", dict(constant_add=True), 5),
    (
        "RationalQuadraticARD",
        "ConstantMean",
        dict(constant_add=True),
        None,
    ),
    (
        "SquaredExponential",
        "NegativeQuadratic",
        dict(
            constant_add=True,
            user_provided_add=True,
            scale_user_provided=True,
        ),
        None,
    ),
]


@pytest.mark.parametrize("cov,mean,noise_kw,deg", CONFIGS)
def test_nlml_parity(cov, mean, noise_kw, deg):
    rng = np.random.default_rng(0)
    D, N = 3, 35
    ours, ref = _pair(D, cov, mean, noise_kw, deg)
    X = rng.uniform(-2, 2, (N, D))
    y = rng.normal(size=(N, 1))
    s2 = None
    if noise_kw.get("user_provided_add"):
        s2 = np.abs(rng.normal(size=(N, 1))) + 0.05
    for g in (ours, ref):
        g.X, g.y, g.s2 = X, y, s2

    hyp_N = ours._hyp_counts()
    hyp_N = sum(hyp_N)
    for trial in range(4):
        hyp = 0.4 * rng.normal(size=hyp_N)
        ll_ours = ours.log_likelihood(hyp)
        ll_ref = ref.log_likelihood(hyp)
        assert np.isclose(ll_ours, ll_ref, rtol=RTOL), (ll_ours, ll_ref)


@pytest.mark.parametrize("cov,mean,noise_kw,deg", CONFIGS[:3])
def test_predict_parity(cov, mean, noise_kw, deg):
    rng = np.random.default_rng(1)
    D, N, M = 2, 30, 9
    ours, ref = _pair(D, cov, mean, noise_kw, deg)
    X = rng.uniform(-2, 2, (N, D))
    y = rng.normal(size=(N, 1))
    hyp_N = sum(ours._hyp_counts())
    hyp = 0.3 * rng.normal(size=(2, hyp_N))

    ours.update(X_new=X, y_new=y, hyp=hyp)
    ref.update(X_new=X, y_new=y, hyp=hyp)

    xs = rng.uniform(-2, 2, (M, D))
    mu_o, s2_o = ours.predict(xs, add_noise=True)
    mu_r, s2_r = ref.predict(xs, add_noise=True)
    assert np.allclose(mu_o, mu_r, rtol=RTOL, atol=1e-10)
    assert np.allclose(s2_o, s2_r, rtol=RTOL, atol=1e-10)

    mu_o, cov_o = ours.predict_full(xs)
    mu_r, cov_r = ref.predict_full(xs)
    assert np.allclose(cov_o, cov_r, rtol=1e-6, atol=1e-10)


def test_log_posterior_parity_with_priors():
    rng = np.random.default_rng(2)
    D, N = 2, 25
    ours, ref = _pair(
        D, "SquaredExponential", "ConstantMean", dict(constant_add=True)
    )
    X = rng.uniform(-2, 2, (N, D))
    y = rng.normal(size=(N, 1))
    priors = {
        "covariance_log_lengthscale": ("gaussian", (0.0, 1.0)),
        "covariance_log_outputscale": ("student_t", (0.0, 1.5, 4.0)),
        "noise_log_scale": ("smoothbox", (-4.0, -1.0, 0.7)),
        "mean_const": ("smoothbox_student_t", (-1.0, 1.0, 0.5, 3.0)),
    }
    for g in (ours, ref):
        g.X, g.y, g.s2 = X, y, None
        g.set_priors(priors)

    for trial in range(4):
        hyp = 0.4 * rng.normal(size=5)
        lp_o = ours.log_posterior(hyp)
        lp_r = ref.log_posterior(hyp)
        assert np.isclose(lp_o, lp_r, rtol=RTOL), (lp_o, lp_r)


def test_log_posterior_parity_with_bounded_priors():
    """Bounds + priors engage the truncation normalization constants."""
    rng = np.random.default_rng(3)
    D, N = 1, 20
    ours, ref = _pair(
        D, "SquaredExponential", "ConstantMean", dict(constant_add=True)
    )
    X = rng.uniform(-2, 2, (N, D))
    y = rng.normal(size=(N, 1))
    priors = {
        "covariance_log_lengthscale": ("gaussian", (0.0, 1.0)),
        "covariance_log_outputscale": ("student_t", (0.0, 1.5, 4.0)),
        "noise_log_scale": ("gaussian", (-2.0, 0.5)),
        "mean_const": None,
    }
    bounds = {
        "covariance_log_lengthscale": (-3.0, 3.0),
        "covariance_log_outputscale": (-2.0, 2.0),
        "noise_log_scale": (-5.0, 0.0),
        "mean_const": (-1.0, 1.0),
    }
    for g in (ours, ref):
        g.X, g.y, g.s2 = X, y, None
        g.set_priors(priors)
        g.set_bounds(bounds)

    for trial in range(4):
        hyp = np.array(
            [
                rng.uniform(-2, 2),
                rng.uniform(-1, 1),
                rng.uniform(-4, -0.5),
                rng.uniform(-0.9, 0.9),
            ]
        )
        lp_o = ours.log_posterior(hyp)
        lp_r = ref.log_posterior(hyp)
        assert np.isclose(lp_o, lp_r, rtol=RTOL), (lp_o, lp_r)


def test_quad_parity():
    rng = np.random.default_rng(4)
    D, N = 2, 28
    ours, ref = _pair(
        D, "SquaredExponential", "NegativeQuadratic", dict(constant_add=True)
    )
    X = rng.uniform(-2, 2, (N, D))
    y = rng.normal(size=(N, 1))
    hyp = 0.3 * rng.normal(size=(2, sum(ours._hyp_counts())))
    ours.update(X_new=X, y_new=y, hyp=hyp)
    ref.update(X_new=X, y_new=y, hyp=hyp)

    mus = rng.uniform(-1, 1, (3, D))
    sigmas = np.abs(rng.normal(size=(3, D))) + 0.3
    F_o, V_o = ours.quad(mus, sigmas, compute_var=True)
    F_r, V_r = ref.quad(mus, sigmas, compute_var=True)
    assert np.allclose(F_o, F_r, rtol=RTOL, atol=1e-12)
    assert np.allclose(V_o, V_r, rtol=1e-6, atol=1e-12)


def test_posterior_factor_parity():
    """Stored Posterior factors (alpha, sW, L, sn2_mult, L_chol) match
    the reference conventions exactly."""
    rng = np.random.default_rng(5)
    D, N = 2, 22
    ours, ref = _pair(
        D, "SquaredExponential", "ConstantMean", dict(constant_add=True)
    )
    X = rng.uniform(-2, 2, (N, D))
    y = rng.normal(size=(N, 1))
    hyp = np.array([[0.1, -0.2, 0.3, -1.0, 0.5]])
    ours.update(X_new=X, y_new=y, hyp=hyp)
    ref.update(X_new=X, y_new=y, hyp=hyp)

    p_o, p_r = ours.posteriors[0], ref.posteriors[0]
    assert p_o.L_chol == p_r.L_chol
    assert np.isclose(p_o.sn2_mult, p_r.sn2_mult)
    assert np.allclose(p_o.alpha, p_r.alpha, rtol=1e-7, atol=1e-10)
    assert np.allclose(p_o.sW, p_r.sW, rtol=1e-9)
    assert np.allclose(p_o.L, p_r.L, rtol=1e-6, atol=1e-9)


def test_low_noise_parametrization_parity():
    """min(sn2) < 1e-6 triggers the explicit-inverse parametrization."""
    rng = np.random.default_rng(6)
    D, N = 1, 15
    ours, ref = _pair(
        D, "SquaredExponential", "ZeroMean", dict(constant_add=True)
    )
    X = rng.uniform(-2, 2, (N, D))
    y = np.sin(X)
    # log sigma_n = -8 -> sn2 = e^-16 << 1e-6
    hyp = np.array([[0.0, 0.0, -8.0]])
    ours.update(X_new=X, y_new=y, hyp=hyp)
    ref.update(X_new=X, y_new=y, hyp=hyp)
    assert ours.posteriors[0].L_chol == ref.posteriors[0].L_chol
    assert not ours.posteriors[0].L_chol

    xs = rng.uniform(-2, 2, (6, D))
    mu_o, s2_o = ours.predict(xs)
    mu_r, s2_r = ref.predict(xs)
    assert np.allclose(mu_o, mu_r, rtol=1e-6, atol=1e-8)
    assert np.allclose(s2_o, s2_r, rtol=1e-4, atol=1e-8)
