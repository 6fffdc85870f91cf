"""Mirrors of the remaining reference test cases not yet covered by the
other test modules (reference testing/test_gaussian_process.py:557-947,
test_gaussian_process_isotropic.py same sections, and
test_slice_sample.py:50-61): error-path guards, hyperparameter dict
round-trips, quadrature with full composable noise, bound persistence
across refits, and the step-out sampler variant."""

import numpy as np
import pytest
import scipy.integrate
import scipy.stats

import gpyreg_tpu as gpr
from gpyreg_tpu import GP
from gpyreg_tpu.covariance_functions import Matern, SquaredExponential
from gpyreg_tpu.isotropic_covariance_functions import (
    MaternIsotropic,
    SquaredExponentialIsotropic,
)
from gpyreg_tpu.mean_functions import (
    ConstantMean,
    NegativeQuadratic,
    ZeroMean,
)
from gpyreg_tpu.noise_functions import GaussianNoise
from gpyreg_tpu.slice_sample import SliceSampler

ALL_KERNELS = [
    SquaredExponential(),
    Matern(3),
    SquaredExponentialIsotropic(),
    MaternIsotropic(5),
]


def _gp(cov, mean=None, D=3):
    return GP(
        D=D,
        covariance=cov,
        mean=mean or ZeroMean(),
        noise=GaussianNoise(constant_add=True),
    )


# ---------------------------------------------------------------------------
# Error-path guards (reference test_gaussian_process.py:852-947, and the
# isotropic mirror of the same cases)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cov", ALL_KERNELS)
def test_recommended_bounds_require_data(cov):
    gp = _gp(cov)
    for X, y in [(None, None), (1, None), (None, 1)]:
        gp.X, gp.y = X, y
        with pytest.raises(ValueError, match="does not have X or y"):
            gp.get_recommended_bounds()


@pytest.mark.parametrize("cov", ALL_KERNELS)
def test_set_hyperparameters_wrong_shape(cov):
    gp = _gp(cov)
    with pytest.raises(ValueError, match="wrong shape"):
        gp.set_hyperparameters(np.ones((1, 20)))


@pytest.mark.parametrize("cov", ALL_KERNELS)
def test_hyperparameters_to_dict_wrong_shape(cov):
    gp = _gp(cov)
    with pytest.raises(ValueError, match="wrong shape"):
        gp.hyperparameters_to_dict(np.ones((1, 20)))


@pytest.mark.parametrize("cov", ALL_KERNELS)
def test_hyperparameters_from_dict_single_dict(cov):
    """A bare dict (not a list of dicts) must be accepted and round-trip
    (reference test_gaussian_process.py:909-930)."""
    gp = _gp(cov)
    hyper_dict = gp.get_hyperparameters()[0]
    gp.hyperparameters_from_dict(hyper_dict)
    for key, want in hyper_dict.items():
        got = gp.get_hyperparameters()[0][key]
        assert np.array_equal(got, want, equal_nan=True)


@pytest.mark.parametrize("cov", [Matern(3), MaternIsotropic(3)])
def test_quad_not_squared_exponential(cov):
    gp = _gp(cov, mean=NegativeQuadratic())
    with pytest.raises(ValueError, match="squared exponential"):
        gp.quad(0, 0.1, compute_var=True)


# ---------------------------------------------------------------------------
# Quadrature with the fully composable noise model (reference
# test_gaussian_process.py:557-619, compressed sizes)
# ---------------------------------------------------------------------------


def test_quadrature_with_noise():
    rng = np.random.default_rng(11)
    N, s2_constant = 250, 0.01
    X = np.linspace(-15, 15, N)[:, None]
    s2 = np.full(X.shape, s2_constant)
    y = np.sin(X) + np.sqrt(s2) * rng.standard_normal(X.shape)
    y[y < 0] = -(np.abs(3 * y[y < 0]) ** 2)

    gp = GP(
        D=1,
        covariance=SquaredExponential(),
        mean=NegativeQuadratic(),
        noise=GaussianNoise(
            constant_add=True,
            user_provided_add=True,
            scale_user_provided=True,
            rectified_linear_output_dependent_add=True,
        ),
    )
    gp.fit(X=X, y=y, s2=s2, options={"n_samples": 8, "opts_N": 1})

    # Riemann ground truth from the predictive mean/covariance grid.
    mu_N = 600
    x_star = np.linspace(-15, 15, mu_N)[:, None]
    f_mu, f_cov = gp.predict_full(x_star, s2_star=s2_constant, add_noise=True)
    w = scipy.stats.norm.pdf(x_star[:, 0], scale=0.1)
    F_grid = np.sum(f_mu[:, 0] * w) * (30 / mu_N)
    F_grid_var = w @ f_cov[:, :, 0] @ w * (30 / mu_N) ** 2

    F_bayes, F_bayes_var = gp.quad(0, 0.1, compute_var=True)
    assert np.abs(F_bayes - F_grid) < 0.05
    assert np.abs(F_bayes_var - F_grid_var) < 0.05

    def f_times_pdf(x):
        fx = np.sin(x)
        if fx < 0:
            fx = -(np.abs(3 * fx) ** 2)
        return fx * scipy.stats.norm.pdf(x, scale=0.1)

    F_true = scipy.integrate.quad(f_times_pdf, -np.inf, np.inf)[0]
    assert np.abs(F_true - F_bayes) < 0.1


# ---------------------------------------------------------------------------
# Bound persistence across refits (reference :659-773, compressed)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cov_ctor", [Matern, MaternIsotropic])
def test_setting_bounds_persist_across_fits(cov_ctor):
    rng = np.random.default_rng(5)
    X = rng.uniform(-5, 5, (20, 2))
    y = 1 + np.sum(np.sin(X), 1, keepdims=True)
    cov = cov_ctor(3)
    ell_N = cov.hyperparameter_count(2) - 1

    gp = GP(
        D=2,
        covariance=cov,
        mean=ConstantMean(),
        noise=GaussianNoise(constant_add=True),
    )
    gp.set_priors(
        {
            "covariance_log_outputscale": None,
            "covariance_log_lengthscale": None,
            "noise_log_scale": ("gaussian", (np.log(1e-3), 1.0)),
            "mean_const": None,
        }
    )
    gp.set_bounds(
        {
            "covariance_log_outputscale": (-np.inf, 1.0),
            "covariance_log_lengthscale": (-2.0, np.inf),
            "noise_log_scale": (-np.inf, np.inf),
            "mean_const": (-4.0, 4.0),
        }
    )
    lower = np.concatenate(
        [np.full(ell_N, -2.0), [-np.inf, -np.inf, -4.0]]
    )
    upper = np.concatenate(
        [np.full(ell_N, np.inf), [1.0, np.inf, 4.0]]
    )

    opts = {"opts_N": 1, "init_N": 16, "n_samples": 0}
    for _ in range(2):  # a second fit must not clobber explicit bounds
        gp.fit(X=X, y=y, options=opts)
        assert np.all(gp.lower_bounds == lower)
        assert np.all(gp.upper_bounds == upper)

    gp.set_bounds(None)
    assert np.all(np.isnan(gp.lower_bounds))
    assert np.all(np.isnan(gp.upper_bounds))


# ---------------------------------------------------------------------------
# Degenerate fit budgets for the isotropic family (reference isotropic
# mirror of test_fitting_options :778-810)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("opts_N", [0, 1])
@pytest.mark.parametrize("n_samples", [0, 2])
@pytest.mark.parametrize("init_N", [0, 8])
def test_iso_fit_budget_combinations(opts_N, n_samples, init_N):
    rng = np.random.default_rng(3)
    X = rng.uniform(-3, 3, (16, 2))
    y = np.sin(np.sum(X, 1, keepdims=True))
    gp = GP(
        D=2,
        covariance=SquaredExponentialIsotropic(),
        mean=ConstantMean(),
        noise=GaussianNoise(constant_add=True),
    )
    gp.fit(
        X=X,
        y=y,
        options={
            "opts_N": opts_N,
            "n_samples": n_samples,
            "init_N": init_N,
            "thin": 1,
            "burn": 1,
        },
    )
    mu, s2 = gp.predict(np.zeros((3, 2)))
    assert np.all(np.isfinite(mu)) and np.all(s2 >= 0)


# ---------------------------------------------------------------------------
# Step-out sampler statistics (reference test_slice_sample.py:50-61)
# ---------------------------------------------------------------------------


def test_normal_step_out_moments():
    np.random.seed(17)
    slicer = SliceSampler(
        scipy.stats.norm.logpdf,
        np.array([0.5]),
        options={"display": "off", "diagnostics": True, "step_out": True},
    )
    samples = slicer.sample(6000)["samples"]
    assert np.abs(np.mean(samples)) < 0.1
    assert np.abs(np.var(samples) - 1.0) < 0.1


# ---------------------------------------------------------------------------
# Invalid Matern degree (reference test_covariance_functions.py:84-91 and
# test_isotropic_covariance_functions.py:88-95)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ctor", [Matern, MaternIsotropic])
@pytest.mark.parametrize("degree", [0, 2, 4, 7, -1])
def test_matern_invalid_degree(ctor, degree):
    with pytest.raises(ValueError, match="degrees 1, 3 and 5"):
        ctor(degree)
