"""End-to-end GP tests, mirroring the reference suite
(testing/test_gaussian_process.py): empty-GP predictions, getters and
setters, clean round-trip, gradient checks vs finite differences,
rank-1 vs full-refit equality, quadrature vs numerical integration,
bound-pinned fits, smoke runs over degenerate fit budgets, recovery of
known hyperparameters, and lpd correctness."""

import numpy as np
import pytest
import scipy.stats

import gpyreg_tpu as gpr
from gpyreg_tpu import GP
from gpyreg_tpu.covariance_functions import Matern, SquaredExponential
from gpyreg_tpu.mean_functions import (
    ConstantMean,
    NegativeQuadratic,
    ZeroMean,
)
from gpyreg_tpu.noise_functions import GaussianNoise


def make_gp(D=2, mean=None, noise=None, cov=None):
    return GP(
        D=D,
        covariance=cov or SquaredExponential(),
        mean=mean or ConstantMean(),
        noise=noise or GaussianNoise(constant_add=True),
    )


def make_data(N=30, D=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-3, 3, size=(N, D))
    y = np.sin(np.sum(X, 1))[:, None] + 0.1 * rng.normal(size=(N, 1))
    return X, y


def quick_fit_options(n_samples=0):
    return {"opts_N": 1, "init_N": 16, "n_samples": n_samples}


def test_empty_gp_predictions():
    """A GP with hyperparameters but no data predicts from the prior."""
    gp = make_gp()
    hyp = np.array([[0.0, 0.0, 0.1, -1.0, 0.4]])
    gp.update(hyp=hyp, compute_posterior=True)
    xs = np.random.randn(6, 2)
    mu, s2 = gp.predict(xs)
    assert np.allclose(mu, 0.4)  # constant mean
    assert np.allclose(s2, np.exp(2 * 0.1))  # prior variance sf2
    mu_f, cov_f = gp.predict_full(xs)
    assert cov_f.shape == (6, 6, 1)
    assert np.allclose(np.diagonal(cov_f[:, :, 0]), np.exp(0.2))

    f = gp.random_function(xs)
    assert f.shape == (6, 1)
    y = gp.random_function(xs, add_noise=True)
    assert y.shape == (6, 1)


def test_temporary_data_attribute():
    gp = make_gp()
    assert isinstance(gp.temporary_data, dict)
    gp.temporary_data["foo"] = 1
    gp.clean()
    assert gp.temporary_data == {}


def test_getters_setters():
    gp = make_gp()
    X, y = make_data()
    hyp = np.array([[0.1, -0.2, 0.3, -1.0, 0.5]])
    gp.update(X_new=X, y_new=y, hyp=hyp)

    # dict round-trip
    hyp_dicts = gp.get_hyperparameters()
    assert len(hyp_dicts) == 1
    d = hyp_dicts[0]
    assert np.allclose(d["covariance_log_lengthscale"], [0.1, -0.2])
    assert np.allclose(d["covariance_log_outputscale"], [0.3])
    assert np.allclose(d["noise_log_scale"], [-1.0])
    assert np.allclose(d["mean_const"], [0.5])
    back = gp.hyperparameters_from_dict(hyp_dicts)
    assert np.allclose(back, hyp)

    gp.set_hyperparameters(hyp_dicts)
    assert np.allclose(gp.get_hyperparameters(as_array=True), hyp)

    with pytest.raises(ValueError):
        gp.set_hyperparameters(np.zeros((1, 7)))

    # bounds round-trip
    bounds = gp.get_bounds()
    assert set(bounds.keys()) == {
        "covariance_log_lengthscale",
        "covariance_log_outputscale",
        "noise_log_scale",
        "mean_const",
    }
    with pytest.raises(ValueError):
        gp.set_bounds({"covariance_log_lengthscale": (-2, 2)})

    # priors round-trip
    priors = {
        "covariance_log_lengthscale": ("gaussian", (0.0, 1.0)),
        "covariance_log_outputscale": ("student_t", (0.0, 1.0, 5.0)),
        "noise_log_scale": ("smoothbox", (-3.0, -1.0, 0.5)),
        "mean_const": None,
    }
    gp.set_priors(priors)
    got = gp.get_priors()
    assert got["covariance_log_lengthscale"][0] == "gaussian"
    assert got["covariance_log_outputscale"][0] == "student_t"
    assert got["noise_log_scale"][0] == "smoothbox"
    assert got["mean_const"] is None
    with pytest.raises(ValueError):
        gp.set_priors({"covariance_log_lengthscale": ("gaussian", (0, 1))})
    with pytest.raises(ValueError):
        gp.set_priors(
            {
                **priors,
                "covariance_log_lengthscale": ("bogus_family", (0, 1)),
            }
        )


def test_clean_reconstruct_roundtrip():
    gp = make_gp()
    X, y = make_data()
    hyp = np.array([[0.1, -0.2, 0.3, -1.0, 0.5], [0.0, 0.1, 0.2, -0.9, 0.4]])
    gp.update(X_new=X, y_new=y, hyp=hyp)
    xs = np.random.randn(5, 2)
    mu1, s21 = gp.predict(xs)
    gp.clean()
    for p in gp.posteriors:
        assert p.alpha is None and p.L is None
    gp.update(compute_posterior=True)
    mu2, s22 = gp.predict(xs)
    assert np.allclose(mu1, mu2)
    assert np.allclose(s21, s22)


@pytest.mark.parametrize(
    "cov,mean,noise_args",
    [
        (SquaredExponential(), ConstantMean(), dict(constant_add=True)),
        (Matern(3), ZeroMean(), dict(constant_add=True)),
        (Matern(5), NegativeQuadratic(), dict(constant_add=True)),
        (
            SquaredExponential(),
            NegativeQuadratic(),
            dict(
                constant_add=True,
                user_provided_add=True,
                scale_user_provided=True,
                rectified_linear_output_dependent_add=True,
            ),
        ),
    ],
)
def test_nlml_and_posterior_gradients(cov, mean, noise_args):
    """Autodiff gradients of the NLML and log posterior vs central
    finite differences (reference :305-385 uses numdifftools)."""
    rng = np.random.default_rng(12)
    D = 2
    gp = GP(
        D=D, covariance=cov, mean=mean, noise=GaussianNoise(**noise_args)
    )
    N = 25
    X = rng.uniform(-2, 2, (N, D))
    y = rng.normal(size=(N, 1))
    gp.X, gp.y = X, y
    if noise_args.get("user_provided_add"):
        gp.s2 = np.abs(rng.normal(size=(N, 1))) + 0.1

    hyp_N = (
        cov.hyperparameter_count(D)
        + GaussianNoise(**noise_args).hyperparameter_count()
        + mean.hyperparameter_count(D)
    )
    hyp = 0.3 * rng.normal(size=hyp_N)

    _, g = gp.log_likelihood(hyp, compute_grad=True)
    eps = 1e-6
    for i in range(hyp_N):
        e = np.zeros(hyp_N)
        e[i] = eps
        num = (
            gp.log_likelihood(hyp + e) - gp.log_likelihood(hyp - e)
        ) / (2 * eps)
        assert abs(g[i] - num) < 1e-5, f"hyp {i}: {g[i]} vs {num}"

    # With priors -> log posterior gradient.
    info = gp._hyper_info()
    priors = {name: ("student_t", (0.0, 2.0, 7.0)) for name, _ in info}
    gp.set_priors(priors)
    _, g = gp.log_posterior(hyp, compute_grad=True)
    for i in range(hyp_N):
        e = np.zeros(hyp_N)
        e[i] = eps
        num = (
            gp.log_posterior(hyp + e) - gp.log_posterior(hyp - e)
        ) / (2 * eps)
        assert abs(g[i] - num) < 1e-5


def test_log_prior_families_gradient():
    """All four prior families (+ fixed via bounds) in one GP."""
    rng = np.random.default_rng(5)
    gp = make_gp(D=2, mean=ConstantMean())
    X, y = make_data(N=20)
    gp.X, gp.y = X, y
    gp.set_priors(
        {
            "covariance_log_lengthscale": ("gaussian", (0.0, 1.0)),
            "covariance_log_outputscale": ("student_t", (0.0, 1.5, 4.0)),
            "noise_log_scale": ("smoothbox", (-4.0, -1.0, 0.7)),
            "mean_const": ("smoothbox_student_t", (-1.0, 1.0, 0.5, 3.0)),
        }
    )
    hyp = np.array([0.3, -0.2, 0.1, -2.0, 1.4])
    lp, g = gp.log_posterior(hyp, compute_grad=True)
    assert np.isfinite(lp)
    eps = 1e-6
    for i in range(hyp.size):
        e = np.zeros(hyp.size)
        e[i] = eps
        num = (
            gp.log_posterior(hyp + e) - gp.log_posterior(hyp - e)
        ) / (2 * eps)
        assert abs(g[i] - num) < 1e-5


def test_rank1_update_equals_full_refit():
    gp = make_gp()
    X, y = make_data(N=25)
    hyp = np.array(
        [[0.1, -0.2, 0.3, -1.0, 0.5], [0.0, 0.1, 0.2, -0.9, 0.4]]
    )
    gp.update(X_new=X, y_new=y, hyp=hyp)

    rng = np.random.default_rng(3)
    x_new = rng.uniform(-3, 3, (1, 2))
    y_new = np.array([[0.2]])
    gp.update(X_new=x_new, y_new=y_new)  # rank-1 path

    gp_full = make_gp()
    gp_full.update(
        X_new=np.vstack([X, x_new]), y_new=np.vstack([y, y_new]), hyp=hyp
    )

    xs = rng.uniform(-3, 3, (8, 2))
    mu1, s21 = gp.predict(xs)
    mu2, s22 = gp_full.predict(xs)
    assert np.allclose(mu1, mu2, atol=1e-9)
    assert np.allclose(s21, s22, atol=1e-9)


def test_split_update_equals_batch():
    gp1 = make_gp()
    gp2 = make_gp()
    X, y = make_data(N=24)
    hyp = np.array([[0.1, -0.2, 0.3, -1.0, 0.5]])
    gp1.update(X_new=X, y_new=y, hyp=hyp)
    gp2.update(X_new=X[:12], y_new=y[:12], hyp=hyp)
    gp2.update(X_new=X[12:18], y_new=y[12:18], hyp=hyp)
    gp2.update(X_new=X[18:], y_new=y[18:], hyp=hyp)
    xs = np.random.randn(5, 2)
    mu1, s21 = gp1.predict(xs)
    mu2, s22 = gp2.predict(xs)
    assert np.allclose(mu1, mu2)
    assert np.allclose(s21, s22)


def test_quad_vs_numerical_integration():
    """Bayesian quadrature against a Riemann sum over the posterior
    mean (reference :496-614)."""
    gp = make_gp(D=1, mean=ConstantMean())
    rng = np.random.default_rng(10)
    X = rng.uniform(-3, 3, (25, 1))
    y = np.sin(X) + 0.05 * rng.normal(size=X.shape)
    hyp = np.array([[0.0, 0.0, -2.0, 0.1]])
    gp.update(X_new=X, y_new=y, hyp=hyp)

    mu_q, sigma_q = 0.4, 0.8
    F, F_var = gp.quad(mu_q, sigma_q, compute_var=True)

    # Ground truth: integral of predictive mean against N(mu_q, sigma_q^2)
    grid = np.linspace(-8, 8, 4001)[:, None]
    fmu, _ = gp.predict(grid)
    w = scipy.stats.norm.pdf(grid, loc=mu_q, scale=sigma_q)
    F_num = np.trapezoid((fmu * w).ravel(), grid.ravel())
    assert abs(F[0, 0] - F_num) < 1e-4
    assert F_var[0, 0] > 0

    # Multiple measures, separate samples
    mus = np.array([[0.0], [1.0]])
    sigmas = np.array([[0.5], [0.7]])
    F2 = gp.quad(mus, sigmas, separate_samples=True)
    assert F2.shape == (2, 1)


def test_fixed_bound_pins_hyperparameter():
    """LB == UB for a hyperparameter keeps it fixed through fit
    (reference :620-656)."""
    gp = make_gp(D=1)
    rng = np.random.default_rng(2)
    X = rng.uniform(-3, 3, (20, 1))
    y = np.sin(X)
    fixed_val = 0.3
    bounds = {
        "covariance_log_lengthscale": None,
        "covariance_log_outputscale": (fixed_val, fixed_val),
        "noise_log_scale": None,
        "mean_const": None,
    }
    gp.set_bounds(bounds)
    hyp, _, _ = gp.fit(X=X, y=y, options=quick_fit_options(n_samples=2))
    assert np.allclose(hyp[:, 1], fixed_val)


def test_nan_bounds_filled_with_recommended():
    gp = make_gp()
    X, y = make_data()
    gp.fit(X=X, y=y, options=quick_fit_options())
    assert not np.any(np.isnan(gp.lower_bounds))
    assert not np.any(np.isnan(gp.upper_bounds))
    assert np.all(gp.lower_bounds <= gp.upper_bounds)


@pytest.mark.parametrize("opts_N", [0, 2])
@pytest.mark.parametrize("n_samples", [0, 2])
@pytest.mark.parametrize("init_N", [0, 16])
def test_fit_budget_combinations(opts_N, n_samples, init_N):
    """All 8 combinations of zero/nonzero fit budgets run (reference
    :776-806)."""
    gp = make_gp(D=1)
    rng = np.random.default_rng(4)
    X = rng.uniform(-3, 3, (15, 1))
    y = np.sin(X)
    hyp, opt_res, samp_res = gp.fit(
        X=X,
        y=y,
        options={
            "opts_N": opts_N,
            "n_samples": n_samples,
            "init_N": init_N,
            "thin": 2,
            "burn": 2,
        },
    )
    expected_rows = n_samples if n_samples > 0 else 1
    assert hyp.shape[0] == expected_rows
    assert gp.posteriors is not None
    mu, s2 = gp.predict(np.zeros((1, 1)))
    assert np.isfinite(mu).all() and np.isfinite(s2).all()


def test_fit_recovers_known_hyperparameters():
    """MAP fit recovers the generating lengthscale/outputscale within
    loose tolerance (reference :809-849 asserts |dhyp| < 0.5)."""
    rng = np.random.default_rng(7)
    D = 1
    N = 60
    X = rng.uniform(-5, 5, (N, D))
    ell_true, sf_true, sn_true = 1.0, 1.0, 0.05
    K = np.exp(
        -0.5 * (X - X.T) ** 2 / ell_true**2
    ) * sf_true**2 + sn_true**2 * np.eye(N)
    y = np.linalg.cholesky(K) @ rng.normal(size=(N, 1))

    gp = make_gp(D=1, mean=ZeroMean())
    hyp, _, _ = gp.fit(
        X=X, y=y, options={"opts_N": 2, "init_N": 128, "n_samples": 0}
    )
    assert abs(hyp[0, 0] - np.log(ell_true)) < 0.7
    assert abs(hyp[0, 1] - np.log(sf_true)) < 0.7


def test_lpd_matches_scipy_norm_logpdf():
    """Log predictive density equals the normal log-pdf under the
    mixture-reduced moments (reference :948-1028)."""
    gp = make_gp()
    X, y = make_data(N=30)
    hyp = np.array(
        [[0.1, -0.2, 0.3, -1.5, 0.5], [0.0, 0.1, 0.2, -1.2, 0.4]]
    )
    gp.update(X_new=X, y_new=y, hyp=hyp)
    rng = np.random.default_rng(8)
    xs = rng.uniform(-3, 3, (7, 2))
    ys = rng.normal(size=(7, 1))

    mu, s2, lpd = gp.predict(xs, y_star=ys, add_noise=True, return_lpd=True)
    expected = scipy.stats.norm.logpdf(ys, loc=mu, scale=np.sqrt(s2))
    assert np.allclose(lpd, expected, atol=1e-10)

    mu_s, s2_s, lpd_s = gp.predict(
        xs, y_star=ys, add_noise=True, return_lpd=True,
        separate_samples=True,
    )
    assert lpd_s.shape == (7, 2)
    with pytest.raises(ValueError):
        gp.predict(xs, return_lpd=True)


def test_separate_samples_shapes():
    gp = make_gp()
    X, y = make_data()
    hyp = np.array(
        [[0.1, -0.2, 0.3, -1.0, 0.5], [0.0, 0.1, 0.2, -0.9, 0.4]]
    )
    gp.update(X_new=X, y_new=y, hyp=hyp)
    xs = np.random.randn(5, 2)
    mu, s2 = gp.predict(xs, separate_samples=True)
    assert mu.shape == (5, 2) and s2.shape == (5, 2)
    mu, s2 = gp.predict(xs, separate_samples=False)
    assert mu.shape == (5, 1) and s2.shape == (5, 1)
    mu_f, cov_f = gp.predict_full(xs)
    assert mu_f.shape == (5, 2) and cov_f.shape == (5, 5, 2)


def test_str_and_repr():
    gp = make_gp()
    s = str(gp)
    assert "GP:" in s
    assert "Covariance function: SquaredExponential" in s
    assert "Mean function: ConstantMean" in s
    assert "Noise function: GaussianNoise(constant_add=True)" in s
    assert "Hyperparameter samples: 0" in s
    r = repr(gp)
    assert "self.D = 2" in r


def test_convert_shapes():
    gp = make_gp(D=3)
    X = np.random.randn(4, 3)
    y = np.random.randn(4)
    X2, y2, s22 = gp._convert_shapes(X, y, 0.1)
    assert X2.shape == (4, 3)
    assert y2.shape == (4, 1)
    assert s22.shape == (4, 1) and np.allclose(s22, 0.1)

    x1 = np.random.randn(3)
    X3, _, _ = gp._convert_shapes(x1, None, None)
    assert X3.shape == (1, 3)

    with pytest.raises(AssertionError):
        gp._convert_shapes(np.random.randn(4, 2), None, None)
    with pytest.raises(TypeError):
        gp._convert_shapes(X, y, "bad")
    assert gp._convert_shapes(None, None, None) == (None, None, None)


def test_random_function_statistics():
    gp = make_gp(D=1)
    rng = np.random.default_rng(13)
    X = rng.uniform(-3, 3, (20, 1))
    y = np.sin(X)
    hyp = np.array([[0.0, 0.0, -3.0, 0.0]])
    gp.update(X_new=X, y_new=y, hyp=hyp)
    np.random.seed(99)
    draws = np.hstack(
        [gp.random_function(X) for _ in range(30)]
    )  # (20, 30)
    mu, _ = gp.predict(X)
    # Posterior draws at training points concentrate near the mean.
    assert np.max(np.abs(np.mean(draws, 1, keepdims=True) - mu)) < 0.25
