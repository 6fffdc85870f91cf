"""Mean function tests: counts, shapes, validation, analytic gradients
vs finite differences (reference testing/test_mean_functions.py)."""

import numpy as np
import pytest

from gpyreg_tpu.mean_functions import (
    ConstantMean,
    NegativeQuadratic,
    ZeroMean,
)

MEANS = [ZeroMean(), ConstantMean(), NegativeQuadratic()]


@pytest.mark.parametrize("mean", MEANS)
def test_validation(mean):
    X = np.random.randn(6, 2)
    mean_N = mean.hyperparameter_count(2)
    with pytest.raises(ValueError):
        mean.compute(np.zeros(mean_N + 1), X)
    with pytest.raises(ValueError):
        mean.compute(np.zeros((1, max(mean_N, 1))), X)


def test_counts():
    assert ZeroMean.hyperparameter_count(5) == 0
    assert ConstantMean.hyperparameter_count(5) == 1
    assert NegativeQuadratic.hyperparameter_count(5) == 11


def test_values():
    rng = np.random.default_rng(0)
    N, D = 10, 3
    X = rng.normal(size=(N, D))

    assert np.allclose(ZeroMean().compute(np.zeros(0), X), 0)
    assert np.allclose(ConstantMean().compute(np.array([2.5]), X), 2.5)

    hyp = rng.normal(size=1 + 2 * D)
    m = NegativeQuadratic().compute(hyp, X)
    xm = hyp[1 : 1 + D]
    omega = np.exp(hyp[1 + D :])
    expected = hyp[0] - 0.5 * np.sum(((X - xm) / omega) ** 2, 1)
    assert np.allclose(m, expected)


@pytest.mark.parametrize("mean", [ConstantMean(), NegativeQuadratic()])
def test_gradients(mean):
    rng = np.random.default_rng(1)
    N, D = 8, 2
    X = rng.normal(size=(N, D))
    mean_N = mean.hyperparameter_count(D)
    hyp = rng.normal(size=mean_N)
    m, dm = mean.compute(hyp, X, compute_grad=True)
    assert dm.shape == (N, mean_N)
    eps = 1e-6
    for i in range(mean_N):
        e = np.zeros(mean_N)
        e[i] = eps
        num = (mean.compute(hyp + e, X) - mean.compute(hyp - e, X)) / (
            2 * eps
        )
        assert np.max(np.abs(dm[:, i] - num)) < 1e-6


def test_zero_mean_grad_is_empty():
    X = np.random.randn(4, 2)
    m, dm = ZeroMean().compute(np.zeros(0), X, compute_grad=True)
    assert np.size(dm) == 0


def test_bounds_info():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(15, 3))
    y = rng.normal(size=(15, 1))
    for mean in MEANS:
        info = mean.get_bounds_info(X, y)
        mean_N = mean.hyperparameter_count(3)
        for key in ("LB", "UB", "PLB", "PUB", "x0"):
            assert info[key].shape == (mean_N,)
        assert np.all(info["LB"] <= info["UB"])
