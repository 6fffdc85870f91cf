"""MATLAB-oracle extras: quantile prediction (gplite_qpred.m), GP
surface sampling (gplite_sample.m), posterior-mean minimization
(gplite_fmin.m)."""

import numpy as np
import pytest

import gpyreg_tpu as gpr


def _fitted_quadratic_gp(n_samples=3, seed=0):
    """GP trained on a known concave quadratic (peak at x=1)."""
    rng = np.random.default_rng(seed)
    N, D = 60, 2
    X = rng.uniform(-3, 3, (N, D))
    y = -np.sum((X - 1.0) ** 2, axis=1, keepdims=True)
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.NegativeQuadratic(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    base = np.concatenate(
        [[0.5, 0.5], [1.0], [-3.0], [0.0, 1.0, 1.0, 0.0, 0.0]]
    )
    hyp = base[None, :] + 0.02 * rng.normal(size=(n_samples, base.size))
    gp.update(X_new=X, y_new=y, hyp=hyp)
    return gp, rng


def test_predict_quantile_matches_gaussian():
    gp, rng = _fitted_quadratic_gp(n_samples=1)
    xs = rng.uniform(-2, 2, (25, 2))
    mu, s2 = gp.predict(xs, add_noise=True)
    # With one sample the predictive is Gaussian: the median matches mu
    # and the interquartile range matches 1.349 sigma.
    q = gp.predict_quantile([0.25, 0.5, 0.75], xs)
    assert q.shape == (25, 3)
    assert np.allclose(q[:, 1], mu.ravel(), atol=0.05)
    # The 10-point grid discretization biases the IQR ~10% narrow
    # (same in the MATLAB oracle); check within that envelope.
    iqr = q[:, 2] - q[:, 0]
    assert np.allclose(iqr, 1.349 * np.sqrt(s2.ravel()), rtol=0.2)
    # Monotone in the quantile level.
    assert np.all(q[:, 0] <= q[:, 1]) and np.all(q[:, 1] <= q[:, 2])
    # Scalar q squeezes.
    q50 = gp.predict_quantile(0.5, xs)
    assert q50.shape == (25,)
    assert np.allclose(q50, q[:, 1])


def test_fmin_finds_quadratic_peak():
    gp, _ = _fitted_quadratic_gp()
    np.random.seed(0)
    x_min, f_min = gp.fmin()  # minimum of the mean surface (far field)
    x_max, f_max = gp.fmin(max_flag=True)
    # The posterior-mean maximum should sit near the true peak x = 1.
    assert np.max(np.abs(x_max - 1.0)) < 0.3
    assert f_max > f_min


def test_sample_concentrates_near_peak():
    gp, _ = _fitted_quadratic_gp()
    np.random.seed(1)
    import jax

    s = gp.sample(
        1500,
        bounds=(np.array([-3.0, -3.0]), np.array([3.0, 3.0])),
        key=jax.random.key(0),
    )
    assert s.shape == (1500, 2)
    assert np.all((s >= -3) & (s <= 3))
    # exp(-(x-1)^2 - (y-1)^2) is a standard normal / sqrt(2) at (1, 1).
    assert np.max(np.abs(np.mean(s, axis=0) - 1.0)) < 0.2
    assert np.max(np.abs(np.std(s, axis=0) - np.sqrt(0.5))) < 0.15


def test_sample_beta_penalty_pulls_towards_data():
    gp, rng = _fitted_quadratic_gp()
    np.random.seed(2)
    import jax

    s_plain = gp.sample(
        600,
        bounds=(np.array([-3.0, -3.0]), np.array([3.0, 3.0])),
        key=jax.random.key(1),
    )
    s_lcb = gp.sample(
        600,
        beta=3.0,
        bounds=(np.array([-3.0, -3.0]), np.array([3.0, 3.0])),
        key=jax.random.key(1),
    )
    # The uncertainty penalty must not break sampling; both stay in box.
    assert np.all((s_lcb >= -3) & (s_lcb <= 3))
    assert not np.allclose(s_plain, s_lcb)


def test_predict_full_heteroskedastic_noise_is_diagonal():
    """add_noise with per-point sn2 must touch ONLY the covariance
    diagonal.  The reference's np.dot(np.eye(N), sn2) broadcasts an
    (N,1) heteroskedastic sn2 across every column
    (gaussian_process.py:1659) — this pins the corrected behavior."""
    rng = np.random.default_rng(5)
    N, D = 30, 2
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, 1, keepdims=True))
    s2 = 0.05 + 0.1 * rng.uniform(size=(N, 1))
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(
            constant_add=True, user_provided_add=True
        ),
    )
    hyp = np.concatenate([[0.3, 0.3], [0.0], [-2.0], [0.0]])[None, :]
    gp.update(X_new=X, y_new=y, s2_new=s2, hyp=hyp)

    xs = rng.uniform(-3, 3, (7, D))
    s2_star = 0.2 + 0.1 * rng.uniform(size=(7, 1))
    _, cov_plain = gp.predict_full(xs, s2_star=s2_star, add_noise=False)
    _, cov_noise = gp.predict_full(xs, s2_star=s2_star, add_noise=True)
    delta = cov_noise[:, :, 0] - cov_plain[:, :, 0]
    off = delta - np.diag(np.diag(delta))
    assert np.max(np.abs(off)) == 0.0  # off-diagonals untouched
    assert np.all(np.diag(delta) > 0)  # per-point noise on the diag


def test_fmin_and_sample_raise_cleanly_on_matrix_free():
    """Matrix-free (CG) posteriors have no factors to stack; fmin/
    sample must raise the same clear ValueError quad does instead of a
    jnp TypeError deep in stacking."""
    rng = np.random.default_rng(6)
    X = rng.uniform(-3, 3, (50, 2))
    y = np.sin(np.sum(X, 1, keepdims=True))
    gp = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    np.random.seed(2)
    gp.fit(X=X, y=y, options={
        "n_samples": 0, "opts_N": 1, "init_N": 16, "method": "cg"})
    with pytest.raises(ValueError, match="posterior factors"):
        gp.fmin()
    with pytest.raises(ValueError, match="posterior factors"):
        gp.sample(10)


def test_fit_warns_when_other_models_pin_device_factors():
    """Large-N fit pre-flight: other live GP instances' device
    posterior factors compete with the fit's HBM working set (a second
    17k fit beside a live 17k posterior dies RESOURCE_EXHAUSTED) —
    fit() warns and points at .clean()."""
    import warnings as _w

    import gpyreg_tpu as gpr
    import gpyreg_tpu.gp as gpm

    rng = np.random.default_rng(3)
    X = rng.uniform(-3, 3, (30, 2))
    y = np.sin(X).sum(1, keepdims=True)

    def make():
        return gpr.GP(
            D=2,
            covariance=gpr.covariance_functions.SquaredExponential(),
            mean=gpr.mean_functions.ConstantMean(),
            noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        )

    gp1 = make()
    gp1.fit(X=X, y=y, options={"n_samples": 2, "opts_N": 1, "init_N": 8})
    assert gp1._device_factor_bytes() > 0  # factors live on device

    gp2 = make()
    orig_b, orig_n = (
        gpm._OTHER_GP_FACTOR_WARN_BYTES,
        gpm._OTHER_GP_FACTOR_WARN_MIN_N,
    )
    gpm._OTHER_GP_FACTOR_WARN_BYTES = 0
    gpm._OTHER_GP_FACTOR_WARN_MIN_N = 1
    try:
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            gp2.fit(
                X=X, y=y,
                options={"n_samples": 0, "opts_N": 1, "init_N": 8},
            )
        assert any("clean()" in str(r.message) for r in rec)
        # After clean(), the pinned bytes drop to zero and a fresh fit
        # does not warn.
        gp1.clean()
        assert gp1._device_factor_bytes() == 0
        gpm._OTHER_GP_FACTOR_WARN_BYTES = orig_b
        with _w.catch_warnings(record=True) as rec2:
            _w.simplefilter("always")
            gp2.fit(
                X=X, y=y,
                options={"n_samples": 0, "opts_N": 1, "init_N": 8},
            )
        assert not any("clean()" in str(r.message) for r in rec2)
    finally:
        gpm._OTHER_GP_FACTOR_WARN_BYTES = orig_b
        gpm._OTHER_GP_FACTOR_WARN_MIN_N = orig_n
