"""End-to-end GP tests with isotropic kernels (mirrors the reference's
testing/test_gaussian_process_isotropic.py strategy in compressed form):
fit + predict, gradient parity, isotropic-vs-tied-ARD prediction
equivalence at the GP level."""

import numpy as np
import pytest

import gpyreg_tpu as gpr
from gpyreg_tpu.isotropic_covariance_functions import (
    MaternIsotropic,
    SquaredExponentialIsotropic,
)


def _data(rng, N=35, D=2):
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, axis=1, keepdims=True)) + 0.1 * rng.normal(
        size=(N, 1)
    )
    return X, y


@pytest.mark.parametrize(
    "kernel",
    [SquaredExponentialIsotropic(), MaternIsotropic(3), MaternIsotropic(5)],
)
def test_fit_predict_isotropic(kernel):
    rng = np.random.default_rng(0)
    X, y = _data(rng)
    gp = gpr.GP(
        D=2,
        covariance=kernel,
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    hyp, _, _ = gp.fit(
        X=X, y=y, options={"n_samples": 2, "opts_N": 1, "init_N": 32}
    )
    assert hyp.shape[1] == 2 + 1 + 1  # 2 cov (iso), 1 noise, 1 mean
    xs = rng.uniform(-3, 3, (20, 2))
    mu, s2 = gp.predict(xs)
    assert np.all(np.isfinite(mu)) and np.all(s2 >= 0)


def test_isotropic_gp_equals_tied_ard_gp():
    """Same data + tied lengthscales => identical posterior predictions
    (reference test_isotropic_covariance_functions.py:164,204 lifted to
    the full GP level)."""
    rng = np.random.default_rng(1)
    X, y = _data(rng)
    hyp_iso = np.array([[0.3, 0.2, -1.5, 0.1]])
    hyp_ard = np.array([[0.3, 0.3, 0.2, -1.5, 0.1]])

    gp_iso = gpr.GP(
        D=2,
        covariance=SquaredExponentialIsotropic(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp_ard = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp_iso.update(X_new=X, y_new=y, hyp=hyp_iso)
    gp_ard.update(X_new=X, y_new=y, hyp=hyp_ard)

    ll_iso = gp_iso.log_likelihood(hyp_iso[0])
    ll_ard = gp_ard.log_likelihood(hyp_ard[0])
    assert abs(ll_iso - ll_ard) < 1e-9

    xs = rng.uniform(-3, 3, (30, 2))
    mu_i, s2_i = gp_iso.predict(xs)
    mu_a, s2_a = gp_ard.predict(xs)
    assert np.allclose(mu_i, mu_a, atol=1e-10)
    assert np.allclose(s2_i, s2_a, atol=1e-10)


def test_isotropic_random_function_and_quad_guard():
    rng = np.random.default_rng(2)
    X, y = _data(rng)
    gp = gpr.GP(
        D=2,
        covariance=MaternIsotropic(5),
        mean=gpr.mean_functions.ZeroMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp.update(X_new=X, y_new=y, hyp=np.array([[0.2, 0.1, -1.0]]))
    f = gp.random_function(rng.uniform(-3, 3, (15, 2)))
    assert f.shape == (15, 1)
    # quad is SE-ARD only (reference gaussian_process.py:1865-1871).
    with pytest.raises(ValueError):
        gp.quad(np.zeros((2, 2)), np.ones((2, 2)))
