"""Isotropic kernels: validation, gradients, and the key equivalence
isotropic == anisotropic with tied lengthscales (mirrors reference
testing/test_isotropic_covariance_functions.py:164-230)."""

import numpy as np
import pytest

from gpyreg_tpu.covariance_functions import Matern, SquaredExponential
from gpyreg_tpu.isotropic_covariance_functions import (
    MaternIsotropic,
    SquaredExponentialIsotropic,
)

ISO_KERNELS = [
    SquaredExponentialIsotropic(),
    MaternIsotropic(1),
    MaternIsotropic(3),
    MaternIsotropic(5),
]


@pytest.mark.parametrize("kernel", ISO_KERNELS)
def test_hyp_count_is_two(kernel):
    for D in (1, 3, 8):
        assert kernel.hyperparameter_count(D) == 2
    info = kernel.hyperparameter_info(5)
    assert info == [
        ("covariance_log_lengthscale", 1),
        ("covariance_log_outputscale", 1),
    ]


@pytest.mark.parametrize("kernel", ISO_KERNELS)
def test_validation(kernel):
    X = np.random.randn(8, 3)
    with pytest.raises(ValueError):
        kernel.compute(np.zeros(4), X)
    with pytest.raises(ValueError):
        kernel.compute(np.zeros((1, 2)), X)


@pytest.mark.parametrize(
    "iso,ard",
    [
        (SquaredExponentialIsotropic(), SquaredExponential()),
        (MaternIsotropic(1), Matern(1)),
        (MaternIsotropic(3), Matern(3)),
        (MaternIsotropic(5), Matern(5)),
    ],
)
def test_isotropic_equals_tied_ard(iso, ard):
    rng = np.random.default_rng(7)
    N, M, D = 14, 5, 4
    X = rng.normal(size=(N, D))
    Z = rng.normal(size=(M, D))
    ln_ell, ln_sf = 0.3, -0.2
    hyp_iso = np.array([ln_ell, ln_sf])
    hyp_ard = np.concatenate([np.full(D, ln_ell), [ln_sf]])

    assert np.allclose(
        iso.compute(hyp_iso, X), ard.compute(hyp_ard, X), atol=1e-12
    )
    assert np.allclose(
        iso.compute(hyp_iso, X, X_star=Z),
        ard.compute(hyp_ard, X, X_star=Z),
        atol=1e-12,
    )
    # Tied-gradient equivalence: d/d(ln ell) iso = sum_d d/d(ln ell_d) ard
    K_i, dK_i = iso.compute(hyp_iso, X, compute_grad=True)
    K_a, dK_a = ard.compute(hyp_ard, X, compute_grad=True)
    assert np.allclose(
        dK_i[:, :, 0], np.sum(dK_a[:, :, :D], axis=2), atol=1e-10
    )
    assert np.allclose(dK_i[:, :, 1], dK_a[:, :, D], atol=1e-10)


@pytest.mark.parametrize("kernel", ISO_KERNELS)
def test_gradient_five_point_stencil(kernel):
    rng = np.random.default_rng(11)
    N, D = 9, 3
    X = rng.normal(size=(N, D))
    hyp = 0.2 * rng.normal(size=2)
    K, dK = kernel.compute(hyp, X, compute_grad=True)
    h = 1e-4
    for i in range(2):
        e = np.zeros_like(hyp)
        e[i] = 1.0
        f = lambda t: kernel.compute(hyp + t * e, X)
        num = (-f(2 * h) + 8 * f(h) - 8 * f(-h) + f(-2 * h)) / (12 * h)
        if isinstance(kernel, MaternIsotropic) and kernel.degree == 1:
            mask = ~np.eye(N, dtype=bool)
            assert np.max(np.abs(dK[:, :, i] - num)[mask]) < 1e-6
        else:
            assert np.max(np.abs(dK[:, :, i] - num)) < 1e-6


def test_bounds_info():
    rng = np.random.default_rng(8)
    X = rng.normal(size=(20, 3))
    y = rng.normal(size=(20, 1))
    for kernel in ISO_KERNELS:
        info = kernel.get_bounds_info(X, y)
        for key in ("LB", "UB", "PLB", "PUB", "x0"):
            assert info[key].shape == (2,)
        assert np.all(info["LB"] <= info["UB"])
