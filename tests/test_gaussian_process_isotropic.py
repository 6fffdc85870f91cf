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


def _mk_iso(D=2, mean=None, kernel=None):
    return gpr.GP(
        D=D,
        covariance=kernel or SquaredExponentialIsotropic(),
        mean=mean or gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )


def test_iso_empty_gp_prior_predictions():
    """Prior predictions before any data (reference
    test_gaussian_process_isotropic.py:20-88)."""
    gp = _mk_iso()
    gp.update(hyp=np.array([[0.1, 0.4, -1.0, 0.7]]), compute_posterior=False)
    xs = np.random.default_rng(0).uniform(-3, 3, (10, 2))
    mu, s2 = gp.predict(xs)
    assert np.allclose(mu, 0.7, atol=1e-10)  # the constant mean
    assert np.allclose(s2, np.exp(2 * 0.4), atol=1e-8)  # prior variance
    f = gp.random_function(xs)
    assert f.shape == (10, 1) and np.all(np.isfinite(f))


def test_iso_getters_setters():
    """Bounds/priors/hyperparameter dict round trips with the iso
    2-hyp covariance (reference :144-254)."""
    gp = _mk_iso()
    b = gp.get_bounds()
    assert set(b) == {
        "covariance_log_lengthscale",
        "covariance_log_outputscale",
        "noise_log_scale",
        "mean_const",
    }
    gp.set_bounds({k: (-5.0, 5.0) for k in b})
    lb2 = gp.get_bounds()
    assert np.all(lb2["covariance_log_lengthscale"][0] == -5.0)
    with pytest.raises(ValueError):
        gp.set_bounds({"covariance_log_lengthscale": (-5, 5)})  # missing keys

    pr = {k: None for k in b}
    pr["covariance_log_outputscale"] = ("gaussian", (0.0, 1.0))
    gp.set_priors(pr)
    got = gp.get_priors()
    assert got["covariance_log_outputscale"][0] == "gaussian"

    hyp = np.array([[0.3, 0.2, -1.5, 0.1]])
    X, y = _data(np.random.default_rng(3))
    gp.update(X_new=X, y_new=y, hyp=hyp)
    d = gp.get_hyperparameters()
    assert np.allclose(
        gp.hyperparameters_from_dict(d), hyp
    )
    gp.set_hyperparameters(hyp + 0.1)
    assert np.allclose(
        gp.get_hyperparameters(as_array=True), hyp + 0.1
    )


def test_iso_cleaning_roundtrip():
    """clean() drops factors; update() rebuilds them exactly
    (reference :256-305)."""
    rng = np.random.default_rng(4)
    X, y = _data(rng)
    gp = _mk_iso()
    gp.update(X_new=X, y_new=y, hyp=np.array([[0.3, 0.2, -1.5, 0.1]]))
    xs = rng.uniform(-3, 3, (12, 2))
    mu0, s20 = gp.predict(xs)
    gp.temporary_data["junk"] = np.ones(5)
    gp.clean()
    assert gp.temporary_data == {}
    assert gp.posteriors[0].alpha is None and gp.posteriors[0].L is None
    gp.update(compute_posterior=True)
    mu1, s21 = gp.predict(xs)
    assert np.allclose(mu0, mu1, atol=1e-12)
    assert np.allclose(s20, s21, atol=1e-12)


def test_iso_gradient_computations():
    """NLML and log-posterior gradients match finite differences through
    the isotropic kernel (reference :307-431)."""
    rng = np.random.default_rng(5)
    X, y = _data(rng, N=25)
    gp = _mk_iso()
    gp.X, gp.y = X, y
    hyp = np.array([0.2, 0.1, -1.3, 0.05])

    _, g = gp.log_likelihood(hyp, compute_grad=True)
    eps = 1e-6
    for i in range(4):
        hp, hm = hyp.copy(), hyp.copy()
        hp[i] += eps
        hm[i] -= eps
        num = (gp.log_likelihood(hp) - gp.log_likelihood(hm)) / (2 * eps)
        assert abs(g[i] - num) < 1e-4 * max(1, abs(num))

    pr = {k: None for k in gp.get_bounds()}
    pr["covariance_log_lengthscale"] = ("student_t", (0.0, 1.0, 5.0))
    gp.set_priors(pr)
    gp.set_bounds({k: (-8.0, 8.0) for k in gp.get_bounds()})
    _, g = gp.log_posterior(hyp, compute_grad=True)
    for i in range(4):
        hp, hm = hyp.copy(), hyp.copy()
        hp[i] += eps
        hm[i] -= eps
        num = (gp.log_posterior(hp) - gp.log_posterior(hm)) / (2 * eps)
        assert abs(g[i] - num) < 1e-4 * max(1, abs(num))


def test_iso_split_update_equals_batch():
    """Incremental updates == one batch update (reference :433-496)."""
    rng = np.random.default_rng(6)
    X, y = _data(rng, N=30)
    hyp = np.array([[0.3, 0.2, -1.2, 0.1]])
    gp1 = _mk_iso()
    gp1.update(X_new=X, y_new=y, hyp=hyp)

    gp2 = _mk_iso()
    gp2.update(X_new=X[:20], y_new=y[:20], hyp=hyp)
    for i in range(20, 30):
        gp2.update(X_new=X[i : i + 1], y_new=y[i : i + 1])

    xs = rng.uniform(-3, 3, (15, 2))
    mu1, s21 = gp1.predict(xs)
    mu2, s22 = gp2.predict(xs)
    assert np.allclose(mu1, mu2, atol=1e-6)
    assert np.allclose(s21, s22, atol=1e-6)


def test_iso_quadrature_ground_truth():
    """Bayesian quadrature with the ISO SE kernel == numerical
    integration of the posterior mean (reference :498-557, D=1)."""
    import scipy.integrate
    import scipy.stats

    f = lambda x: np.exp(-((x - 0.35) ** 2) / 0.02) + np.sin(10 * x) / 3
    X = np.linspace(-2.5, 2.5, 50)
    y = f(X)
    gp = _mk_iso(D=1, mean=gpr.mean_functions.ZeroMean())
    gp.fit(
        X=X[:, None], y=y[:, None], options={"n_samples": 0, "init_N": 256}
    )
    F_true = scipy.integrate.quad(
        lambda x: f(x) * scipy.stats.norm.pdf(x, scale=0.1), -np.inf, np.inf
    )[0]
    F, F_var = gp.quad(0, 0.1, compute_var=True)
    assert abs(F_true - F[0, 0]) < 1e-3
    assert F_var[0, 0] >= 0

    # Batched quadrature consistency.
    F2, FV2 = gp.quad(
        np.array([[0.0], [0.5]]), np.array([[0.1], [0.4]]), compute_var=True
    )
    assert np.isclose(F[0, 0], F2[0, 0])


def test_iso_quadrature_d2_matches_riemann():
    """BEYOND the reference: the iso quad closed form is correct for
    D > 1 too (the reference silently misreads iso hyps there)."""
    rng = np.random.default_rng(7)
    X, y = _data(rng, N=60)
    gp = _mk_iso()
    gp.update(X_new=X, y_new=y, hyp=np.array([[0.1, 0.2, -2.0, 0.0]]))
    mu_q = np.array([[0.2, -0.3]])
    sig_q = np.array([[0.4, 0.6]])
    F, _ = gp.quad(mu_q, sig_q, compute_var=True)

    # Riemann integral of predict mean against the Gaussian measure.
    g = np.linspace(-4, 4, 161)
    GX, GY = np.meshgrid(g, g)
    pts = np.stack([GX.ravel(), GY.ravel()], 1)
    mu_pred, _ = gp.predict(pts)
    w = (
        scipy_norm_pdf(pts[:, 0], mu_q[0, 0], sig_q[0, 0])
        * scipy_norm_pdf(pts[:, 1], mu_q[0, 1], sig_q[0, 1])
    )
    dx = g[1] - g[0]
    F_num = np.sum(mu_pred.ravel() * w) * dx * dx
    assert abs(F[0, 0] - F_num) < 5e-3


def scipy_norm_pdf(x, mu, sig):
    import scipy.stats

    return scipy.stats.norm.pdf(x, loc=mu, scale=sig)


def test_iso_fitting_with_fixed_bounds():
    """LB == UB pins a hyperparameter through the fit
    (reference :622-659)."""
    rng = np.random.default_rng(8)
    X, y = _data(rng, N=30)
    gp = _mk_iso()
    b = gp.get_bounds()
    b["noise_log_scale"] = (-2.0, -2.0)
    gp.set_bounds(b)
    hyp, _, _ = gp.fit(
        X=X, y=y, options={"n_samples": 2, "opts_N": 1, "init_N": 32}
    )
    assert np.all(hyp[:, 2] == -2.0)


def test_iso_fitting_recovery():
    """Fit recovers known iso hyperparameters within tolerance
    (reference :811-852)."""
    rng = np.random.default_rng(9)
    N, D = 400, 2
    ell, sf, sn = 0.8, 1.2, 0.05
    X = rng.uniform(-3, 3, (N, D))
    # Draw y from the actual GP prior via random_function (no data set:
    # the prior-covariance branch).
    gen = _mk_iso()
    gen.update(
        hyp=np.array([[np.log(ell), np.log(sf), np.log(sn), 0.0]]),
        compute_posterior=False,
    )
    np.random.seed(10)
    f = gen.random_function(X)
    y = f + sn * rng.normal(size=(N, 1))
    gp = _mk_iso()
    hyp, _, _ = gp.fit(
        X=X, y=y, options={"n_samples": 0, "opts_N": 2, "init_N": 256}
    )
    assert abs(hyp[0, 0] - np.log(ell)) < 0.5
    assert abs(hyp[0, 2] - np.log(sn)) < 0.7


def test_iso_predict_lpd():
    """Log predictive density matches the Gaussian formula
    (reference :950-1030)."""
    import scipy.stats

    rng = np.random.default_rng(11)
    X, y = _data(rng, N=30)
    gp = _mk_iso()
    gp.update(X_new=X, y_new=y, hyp=np.array([[0.3, 0.2, -1.2, 0.1]]))
    xs = rng.uniform(-3, 3, (10, 2))
    ys = rng.normal(size=(10, 1))
    mu, s2, lpd = gp.predict(xs, ys, add_noise=True, return_lpd=True)
    expected = scipy.stats.norm.logpdf(ys, loc=mu, scale=np.sqrt(s2))
    assert np.allclose(lpd, expected, atol=1e-9)


def test_iso_str_repr():
    gp = _mk_iso(kernel=MaternIsotropic(3))
    s = str(gp)
    assert "MaternIsotropic" in s or "Matern" in s
    assert "parameters" in s
    r = repr(gp)
    assert "self.D = 2" in r
