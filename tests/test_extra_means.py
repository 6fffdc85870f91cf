"""Oracle-only mean functions (gplite_meanfun.m cases linear/quad/
posquad/se/negse): analytic gradients vs five-point stencil, numpy API
vs jax core twin, bounds sanity, end-to-end fits."""

import numpy as np
import pytest

import jax.numpy as jnp

import gpyreg_tpu as gpr
from gpyreg_tpu.core.model import ModelSpec, mean_value
from gpyreg_tpu.mean_functions import (
    LinearMean,
    NegativeSquaredExponentialMean,
    PositiveQuadratic,
    QuadraticMean,
    SquaredExponentialMean,
)

MEANS = [
    LinearMean(),
    QuadraticMean(),
    PositiveQuadratic(),
    SquaredExponentialMean(),
    NegativeSquaredExponentialMean(),
]


@pytest.mark.parametrize("mean", MEANS)
def test_gradient_five_point_stencil(mean):
    rng = np.random.default_rng(0)
    N, D = 9, 2
    X = rng.normal(size=(N, D))
    n = mean.hyperparameter_count(D)
    hyp = 0.3 * rng.normal(size=n)
    m, dm = mean.compute(hyp, X, compute_grad=True)
    assert dm.shape == (N, n)
    h = 1e-4
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        f = lambda t: mean.compute(hyp + t * e, X)
        num = (-f(2 * h) + 8 * f(h) - 8 * f(-h) + f(-2 * h)) / (12 * h)
        assert np.max(np.abs(dm[:, i] - num)) < 1e-6


@pytest.mark.parametrize("mean", MEANS)
def test_matches_jax_core_twin(mean):
    rng = np.random.default_rng(1)
    N, D = 12, 3
    X = rng.normal(size=(N, D))
    n = mean.hyperparameter_count(D)
    hyp = 0.2 * rng.normal(size=n)
    spec = ModelSpec(
        D=D, cov="se", mean=mean._kind,
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    m_np = mean.compute(hyp, X)
    m_jx = np.asarray(mean_value(spec, jnp.asarray(hyp), jnp.asarray(X)))
    assert np.allclose(m_np, m_jx, atol=1e-12)


@pytest.mark.parametrize("mean", MEANS)
def test_bounds_sanity(mean):
    rng = np.random.default_rng(2)
    X = rng.uniform(-3, 3, (25, 2))
    y = rng.normal(size=(25, 1))
    info = mean.get_bounds_info(X, y)
    n = mean.hyperparameter_count(2)
    for key in ("LB", "UB", "PLB", "PUB", "x0"):
        assert info[key].shape == (n,)
    assert np.all(info["LB"] <= info["UB"])
    assert np.all(np.isfinite(info["x0"]))


@pytest.mark.parametrize(
    "mean", [LinearMean(), PositiveQuadratic(), SquaredExponentialMean()]
)
def test_fit_smoke(mean):
    rng = np.random.default_rng(3)
    N, D = 30, 2
    X = rng.uniform(-3, 3, (N, D))
    y = (
        0.5 * np.sum(X, axis=1, keepdims=True)
        + 0.1 * rng.normal(size=(N, 1))
    )
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=mean,
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    hyp, _, _ = gp.fit(
        X=X, y=y, options={"n_samples": 2, "opts_N": 1, "init_N": 16}
    )
    assert hyp.shape[1] == 2 + 1 + 1 + mean.hyperparameter_count(D)
    mu, s2 = gp.predict(rng.uniform(-3, 3, (10, D)))
    assert np.all(np.isfinite(mu)) and np.all(s2 >= 0)
    # quad is restricted to the reference's supported mean set.
    with pytest.raises(ValueError):
        gp.quad(np.zeros((2, D)), np.ones((2, D)))


def test_linear_fit_recovers_slope():
    rng = np.random.default_rng(4)
    N, D = 60, 1
    X = rng.uniform(-3, 3, (N, D))
    y = 1.0 + 2.0 * X + 0.05 * rng.normal(size=(N, 1))
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=LinearMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    np.random.seed(0)
    hyp, _, _ = gp.fit(
        X=X, y=y, options={"n_samples": 0, "opts_N": 2, "init_N": 64}
    )
    # mean hyp layout: [..cov(2), noise(1), m0, a]
    a = hyp[0][-1]
    assert abs(a - 2.0) < 0.5
    # extrapolation follows the linear trend
    mu, _ = gp.predict(np.array([[10.0]]))
    assert abs(mu[0, 0] - 21.0) < 3.0
