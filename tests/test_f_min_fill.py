"""Space-filling initializer tests (reference f_min_fill.py:11-180):
bounds respected, ascending sort, x0 kept first, prior warping sanity,
sobol vs uniform init methods."""

import numpy as np
import pytest

from gpyreg_tpu.f_min_fill import f_min_fill


def _priors(n, families=None):
    hp = {
        "mu": np.full((n,), np.nan),
        "sigma": np.full((n,), np.nan),
        "df": np.full((n,), np.nan),
        "a": np.full((n,), np.nan),
        "b": np.full((n,), np.nan),
    }
    return hp


def test_design_within_bounds_and_sorted():
    rng = np.random.default_rng(0)
    n = 3
    f = lambda x: float(np.sum((x - 0.3) ** 2))
    x0 = np.zeros((1, n))
    LB, UB = np.full(n, -2.0), np.full(n, 2.0)
    PLB, PUB = np.full(n, -1.0), np.full(n, 1.0)
    X0, y0 = f_min_fill(f, x0, LB, UB, PLB, PUB, _priors(n), 128, "sobol")
    assert X0.shape == (128, n)
    assert y0.shape == (128,)
    assert np.all(X0 >= LB) and np.all(X0 <= UB)
    assert np.all(np.diff(y0) >= 0)  # ascending objective
    # The best point should be near the optimum 0.3 (sobol coverage).
    assert np.linalg.norm(X0[0] - 0.3) < 0.8


def test_x0_included():
    n = 2
    f = lambda x: float(np.sum(x**2))
    x0 = np.array([[0.0, 0.0]])  # the global optimum
    LB, UB = np.full(n, -3.0), np.full(n, 3.0)
    X0, y0 = f_min_fill(
        f, x0, LB, UB, LB / 2, UB / 2, _priors(n), 64, "sobol"
    )
    # x0 is evaluated and (being optimal) sorted to the front.
    assert np.allclose(X0[0], 0.0)


def test_rand_method():
    n = 2
    f = lambda x: float(np.sum(x**2))
    x0 = np.zeros((1, n))
    LB, UB = np.full(n, -1.0), np.full(n, 1.0)
    np.random.seed(0)
    X0, y0 = f_min_fill(f, x0, LB, UB, LB, UB, _priors(n), 32, "rand")
    assert X0.shape == (32, n)
    assert np.all(X0 >= LB) and np.all(X0 <= UB)


def test_gaussian_prior_warping_concentrates_mass():
    """With a tight Gaussian prior on dim 0, the design should
    concentrate near the prior mean (reference f_min_fill.py:104-168)."""
    n = 2
    f = lambda x: 0.0
    x0 = np.zeros((1, n))
    LB, UB = np.full(n, -10.0), np.full(n, 10.0)
    hp = _priors(n)
    hp["mu"][0] = 2.0
    hp["sigma"][0] = 0.1
    X0, _ = f_min_fill(f, x0, LB, UB, LB, UB, hp, 256, "sobol")
    # Excluding the x0 row, dim 0 samples track the prior.
    samples = X0[np.any(X0 != 0.0, axis=1), 0]
    assert abs(np.median(samples) - 2.0) < 0.1
    assert np.std(samples) < 0.5


def test_batched_objective_matches_scalar():
    n = 2
    calls = {"batch": 0}

    def f(x):
        return float(np.sum(x**2))

    def f_batch(X):
        calls["batch"] += 1
        return np.sum(np.asarray(X) ** 2, axis=1)

    x0 = np.zeros((1, n))
    LB, UB = np.full(n, -1.0), np.full(n, 1.0)
    # f_min_fill consumes the global RNG (sobol column shuffle): reseed
    # so both calls draw the identical design.
    np.random.seed(7)
    X0a, y0a = f_min_fill(f, x0, LB, UB, LB, UB, _priors(n), 64, "sobol")
    np.random.seed(7)
    X0b, y0b = f_min_fill(
        f, x0, LB, UB, LB, UB, _priors(n), 64, "sobol", f_batch=f_batch
    )
    assert calls["batch"] == 1
    assert np.allclose(X0a, X0b)
    assert np.allclose(y0a, y0b)
