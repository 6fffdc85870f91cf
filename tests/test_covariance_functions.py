"""Covariance function tests: validation, gradient checks against a
five-point stencil, golden values from independent NumPy formulas.
Mirrors the strategy of reference testing/test_covariance_functions.py.
"""

import numpy as np
import pytest
from scipy.spatial.distance import cdist, pdist, squareform

from gpyreg_tpu.covariance_functions import (
    Matern,
    RationalQuadraticARD,
    SquaredExponential,
)

KERNELS = [
    SquaredExponential(),
    Matern(1),
    Matern(3),
    Matern(5),
    RationalQuadraticARD(),
]


@pytest.mark.parametrize("kernel", KERNELS)
def test_hyp_count_validation(kernel):
    N, D = 10, 3
    X = np.random.randn(N, D)
    cov_N = kernel.hyperparameter_count(D)
    with pytest.raises(ValueError):
        kernel.compute(np.zeros(cov_N + 1), X)
    with pytest.raises(ValueError):
        kernel.compute(np.zeros((2, cov_N)), X)
    with pytest.raises(ValueError):
        kernel.compute(np.zeros(cov_N), X, compute_grad=True,
                       X_star=np.random.randn(3, D))


@pytest.mark.parametrize("kernel", KERNELS)
def test_shapes(kernel):
    rng = np.random.default_rng(0)
    N, M, D = 12, 7, 3
    X = rng.normal(size=(N, D))
    Z = rng.normal(size=(M, D))
    hyp = rng.normal(size=kernel.hyperparameter_count(D)) * 0.3

    K = kernel.compute(hyp, X)
    assert K.shape == (N, N)
    assert np.allclose(K, K.T)
    Kc = kernel.compute(hyp, X, X_star=Z)
    assert Kc.shape == (N, M)
    Kd = kernel.compute(hyp, X, compute_diag=True)
    assert Kd.shape == (N, 1)
    assert np.allclose(Kd.ravel(), np.diag(K))
    K2, dK = kernel.compute(hyp, X, compute_grad=True)
    assert np.allclose(K, K2)
    assert dK.shape == (N, N, hyp.size)


@pytest.mark.parametrize("kernel", KERNELS)
def test_gradient_five_point_stencil(kernel):
    rng = np.random.default_rng(42)
    N, D = 9, 2
    X = rng.normal(size=(N, D))
    hyp = 0.2 * rng.normal(size=kernel.hyperparameter_count(D))
    K, dK = kernel.compute(hyp, X, compute_grad=True)
    h = 1e-4
    for i in range(hyp.size):
        e = np.zeros_like(hyp)
        e[i] = 1.0
        f = lambda t: kernel.compute(hyp + t * e, X)
        num = (-f(2 * h) + 8 * f(h) - 8 * f(-h) + f(-2 * h)) / (12 * h)
        if isinstance(kernel, Matern) and kernel.degree == 1:
            # Matern-1/2 is non-differentiable at zero distance: compare
            # off-diagonal only (the reference's analytic dK is NaN on
            # the diagonal there; ours returns the one-sided limit 0).
            mask = ~np.eye(N, dtype=bool)
            assert np.max(np.abs(dK[:, :, i] - num)[mask]) < 1e-6
        else:
            assert np.max(np.abs(dK[:, :, i] - num)) < 1e-6


def test_se_golden_values():
    """SE kernel against the direct pdist formula."""
    rng = np.random.default_rng(3)
    N, D = 20, 4
    X = rng.normal(size=(N, D))
    hyp = 0.3 * rng.normal(size=D + 1)
    ell = np.exp(hyp[:D])
    sf2 = np.exp(2 * hyp[D])
    expected = sf2 * np.exp(
        -squareform(pdist(X / ell, "sqeuclidean")) / 2
    )
    K = SquaredExponential().compute(hyp, X)
    assert np.max(np.abs(K - expected)) < 1e-12


@pytest.mark.parametrize("degree", [1, 3, 5])
def test_matern_golden_values(degree):
    rng = np.random.default_rng(4)
    N, M, D = 15, 6, 3
    X = rng.normal(size=(N, D))
    Z = rng.normal(size=(M, D))
    hyp = 0.3 * rng.normal(size=D + 1)
    ell = np.exp(hyp[:D])
    sf2 = np.exp(2 * hyp[D])
    f = {1: lambda t: 1, 3: lambda t: 1 + t,
         5: lambda t: 1 + t * (1 + t / 3)}[degree]
    t = cdist(X * np.sqrt(degree) / ell, Z * np.sqrt(degree) / ell)
    expected = sf2 * f(t) * np.exp(-t)
    K = Matern(degree).compute(hyp, X, X_star=Z)
    assert np.max(np.abs(K - expected)) < 1e-10


def test_rq_golden_values():
    rng = np.random.default_rng(5)
    N, D = 12, 2
    X = rng.normal(size=(N, D))
    hyp = 0.3 * rng.normal(size=D + 2)
    ell = np.exp(hyp[:D])
    sf2 = np.exp(2 * hyp[D])
    alpha = np.exp(hyp[D + 1])
    sq = squareform(pdist(X / ell, "sqeuclidean"))
    expected = sf2 * (1 + 0.5 * sq / alpha) ** (-alpha)
    K = RationalQuadraticARD().compute(hyp, X)
    assert np.max(np.abs(K - expected)) < 1e-12


def test_bounds_info():
    rng = np.random.default_rng(6)
    X = rng.normal(size=(25, 3))
    y = rng.normal(size=(25, 1))
    for kernel in KERNELS:
        info = kernel.get_bounds_info(X, y)
        cov_N = kernel.hyperparameter_count(3)
        for key in ("LB", "UB", "PLB", "PUB", "x0"):
            assert info[key].shape == (cov_N,)
        assert np.all(info["LB"] <= info["UB"])
        assert np.all(np.isfinite(info["x0"]))
