"""Output warping (MATLAB-oracle feature, outwarp_negpow.m /
outwarp_negpowc1.m / outwarp_negscaledpow.m): warp math against the
oracle's closed forms, inverse round-trips, derivative checks, Jacobian
correction in the NLML, gradients via finite differences, and an
end-to-end fit."""

import numpy as np
import pytest

import gpyreg_tpu as gpr
from gpyreg_tpu.outwarp_functions import (
    NegativePower,
    NegativePowerC1,
    NegativeScaledPower,
)

WARPS = [NegativePower(), NegativePowerC1(), NegativeScaledPower()]


def _hyp_for(warp, y0=0.5, logk=0.4, loga=0.3):
    if isinstance(warp, NegativeScaledPower):
        return np.array([y0, loga, logk])
    return np.array([y0, logk])


@pytest.mark.parametrize("warp", WARPS)
def test_matches_matlab_closed_forms(warp):
    rng = np.random.default_rng(0)
    y = rng.normal(size=(40, 1)) * 2.0
    hyp = _hyp_for(warp)
    y0 = hyp[0]
    k = np.exp(hyp[-1])
    g = warp.compute(hyp, y)
    idx = (y < y0).ravel()
    # Identity above the threshold (all three warps).
    assert np.allclose(g[~idx], y[~idx])
    if isinstance(warp, NegativePower):
        expected = y0 - (y0 - y[idx]) ** k
    elif isinstance(warp, NegativePowerC1):
        expected = y0 - ((1 + y0 - y[idx]) ** k - 1) / k
    else:
        a = np.exp(hyp[1])
        expected = y0 - (a * (y0 - y[idx])) ** k
    assert np.allclose(g[idx], expected, atol=1e-12)


@pytest.mark.parametrize("warp", WARPS)
def test_inverse_roundtrip(warp):
    rng = np.random.default_rng(1)
    y = rng.normal(size=(50, 1)) * 3.0
    hyp = _hyp_for(warp)
    g = warp.compute(hyp, y)
    y_back = warp.compute(hyp, g, inverse=True)
    assert np.allclose(y_back, y, atol=1e-9)


@pytest.mark.parametrize("warp", WARPS)
def test_dt_matches_finite_differences(warp):
    rng = np.random.default_rng(2)
    y = rng.normal(size=(30, 1))
    hyp = _hyp_for(warp)
    # Stay away from the non-smooth threshold point.
    y = np.where(np.abs(y - hyp[0]) < 0.05, hyp[0] + 0.2, y)
    g, dt = warp.compute(hyp, y, compute_grad=True)
    h = 1e-6
    num = (warp.compute(hyp, y + h) - warp.compute(hyp, y - h)) / (2 * h)
    assert np.allclose(dt, num, atol=1e-5)


@pytest.mark.parametrize("warp", WARPS)
def test_c1_continuity_only_for_c1(warp):
    hyp = _hyp_for(warp)
    y0 = hyp[0]
    eps = 1e-9
    _, dt_below = warp.compute(
        hyp, np.array([[y0 - eps]]), compute_grad=True
    )
    if isinstance(warp, NegativePowerC1):
        assert abs(dt_below[0, 0] - 1.0) < 1e-6


def _gp_with_warp(warp, rng, constant_noise=True):
    N, D = 35, 2
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, axis=1, keepdims=True)) + 0.1 * rng.normal(
        size=(N, 1)
    )
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        outwarp=warp,
    )
    gp.X, gp.y = X, y
    return gp, X, y


def test_nlml_jacobian_correction():
    """nlZ(warped GP at hyp) == nlZ(plain GP on g(y)) - sum log g'(y)
    (gplite_core.m:115)."""
    rng = np.random.default_rng(3)
    warp = NegativePower()
    gp, X, y = _gp_with_warp(warp, rng)
    hyp_base = np.array([0.2, 0.1, 0.3, -1.2, 0.0])
    hyp_ow = _hyp_for(warp, y0=float(np.median(y)), logk=0.5)
    hyp = np.concatenate([hyp_base, hyp_ow])

    ll_warped = gp.log_likelihood(hyp)

    yw, dt = warp.compute(hyp_ow, y, compute_grad=True)
    gp_plain = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp_plain.X, gp_plain.y = X, yw
    ll_plain = gp_plain.log_likelihood(hyp_base)

    assert np.isclose(
        ll_warped, ll_plain + np.sum(np.log(np.abs(dt))), atol=1e-9
    )


def test_identity_region_equals_plain():
    """If all y >= y0 the warp is the identity and nlZ matches the
    unwarped model exactly."""
    rng = np.random.default_rng(4)
    warp = NegativePowerC1()
    gp, X, y = _gp_with_warp(warp, rng)
    hyp_base = np.array([0.1, 0.2, 0.4, -1.0, 0.1])
    hyp_ow = np.array([float(np.min(y)) - 1.0, 0.7])  # y0 below all y
    hyp = np.concatenate([hyp_base, hyp_ow])

    gp_plain = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp_plain.X, gp_plain.y = X, y
    assert np.isclose(
        gp.log_likelihood(hyp), gp_plain.log_likelihood(hyp_base)
    )


def test_nlml_gradient_finite_differences():
    rng = np.random.default_rng(5)
    warp = NegativeScaledPower()
    gp, X, y = _gp_with_warp(warp, rng)
    # Place the threshold strictly between data points: finite
    # differences across a data point hit the warp's kink in y0.
    ys = np.sort(y.ravel())
    mid = ys.size // 2
    y0 = 0.5 * (ys[mid] + ys[mid + 1])
    assert np.min(np.abs(y.ravel() - y0)) > 1e-4
    hyp = np.concatenate(
        [
            [0.2, 0.1, 0.3, -1.2, 0.0],
            [y0, 0.2, 0.4],
        ]
    )
    v, g = gp.log_likelihood(hyp, compute_grad=True)
    eps = 1e-6
    for i in range(hyp.size):
        e = np.zeros_like(hyp)
        e[i] = eps
        num = (gp.log_likelihood(hyp + e) - gp.log_likelihood(hyp - e)) / (
            2 * eps
        )
        assert abs(g[i] - num) < 1e-4 * max(1.0, abs(num)), (i, g[i], num)


def test_fit_and_predict_with_outwarp():
    """End-to-end: fit a warped GP on heavy-lower-tail data; predictions
    are finite and the latent mean tracks the (unwarpable) truth in the
    benign region."""
    rng = np.random.default_rng(6)
    N, D = 40, 1
    X = rng.uniform(-3, 3, (N, D))
    f = np.sin(X)
    y = f.copy()
    tail = y < -0.5
    y[tail] = -0.5 - 3.0 * (-0.5 - y[tail]) ** 2  # heavy lower tail
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        outwarp=gpr.outwarp_functions.NegativePower(),
    )
    hyp, _, _ = gp.fit(
        X=X, y=y, options={"n_samples": 2, "opts_N": 1, "init_N": 32}
    )
    assert hyp.shape[1] == 1 + 1 + 1 + 1 + 2  # ell, sf, noise, mean, ow
    xs = np.linspace(-3, 3, 30)[:, None]
    mu, s2 = gp.predict(xs)
    assert np.all(np.isfinite(mu)) and np.all(s2 >= 0)
    # lpd IS supported under warping (change of variables; beyond the
    # oracle, which errors at gplite_pred.m:107) — see
    # test_outwarp_lpd_is_proper_density for correctness.
    _, _, lpd = gp.predict(xs, y_star=np.zeros((30, 1)), return_lpd=True)
    assert lpd.shape == (30, 1) and np.all(np.isfinite(lpd))
    # Unsupported combinations raise (oracle parity).
    with pytest.raises(ValueError):
        gp.predict_full(xs)
    with pytest.raises(ValueError):
        gp.quad(np.zeros((2, 1)), np.ones((2, 1)))


def test_outwarp_lpd_is_proper_density():
    """The warped-GP log predictive density is a PROPER density in the
    original y space: exp(lpd) integrates to 1 over y* (this pins the
    change-of-variables Jacobian), and the mixture reduction equals the
    log-mean of the per-sample densities."""
    rng = np.random.default_rng(8)
    N, D = 35, 1
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(X)
    y[y < -0.3] = -0.3 - 4.0 * (-0.3 - y[y < -0.3])
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        outwarp=NegativePower(),
    )
    gp.X, gp.y = X, y
    hyp = np.array(
        [
            [0.1, 0.2, -1.5, 0.0, -0.3, 0.5],
            [0.2, 0.1, -1.3, 0.1, -0.2, 0.3],
        ]
    )
    gp.update(hyp=hyp)
    x0 = np.array([[0.7]])
    # Integrate the predictive density over a wide y grid (the warp
    # stretches the lower tail, so go far down).
    ys = np.linspace(-40.0, 8.0, 20001)[:, None]
    lpd = np.array(
        [
            gp.predict(
                x0, y_star=ys[i : i + 1], return_lpd=True
            )[2][0, 0]
            for i in range(0, ys.shape[0], 100)
        ]
    )
    grid = ys[::100, 0]
    mass = np.trapezoid(np.exp(lpd), grid)
    assert abs(mass - 1.0) < 2e-2, mass

    # Mixture lpd == log-mean of per-sample densities.
    y_star = np.array([[-1.2]])
    _, _, lpd_mix = gp.predict(x0, y_star=y_star, return_lpd=True)
    _, _, lpd_sep = gp.predict(
        x0, y_star=y_star, return_lpd=True, separate_samples=True
    )
    from scipy.special import logsumexp

    expected = logsumexp(np.asarray(lpd_sep).ravel()) - np.log(2)
    assert np.isclose(float(lpd_mix), float(expected), atol=1e-12)


def test_predict_quantile_with_outwarp():
    """Quantiles of a warped GP live in the original y space and are
    monotone (gplite_qpred.m:40-46: per-sample inverse-warped grids)."""
    rng = np.random.default_rng(7)
    N, D = 40, 1
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(X)
    y[y < -0.3] = -0.3 - 4.0 * (-0.3 - y[y < -0.3])  # stretched lower tail
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        outwarp=NegativePower(),
    )
    gp.X, gp.y = X, y
    hyp = np.array([[0.1, 0.2, -2.0, 0.0, -0.3, 0.5]])
    gp.update(hyp=hyp)
    xs = np.linspace(-3, 3, 25)[:, None]
    q = gp.predict_quantile([0.1, 0.5, 0.9], xs, observed=False)
    assert q.shape == (25, 3)
    assert np.all(np.isfinite(q))
    assert np.all(q[:, 0] <= q[:, 1]) and np.all(q[:, 1] <= q[:, 2])
    # The median of the warped predictive should roughly track the data
    # range in ORIGINAL space (i.e., the inverse warp was applied).
    assert q[:, 1].min() > y.min() - 2.0
    assert q[:, 1].max() < y.max() + 2.0


def test_quantile_inverse_warp_consistency():
    """Median of the warped-GP predictive == inverse-warp of the
    warped-space latent mean (exact for the median of a Gaussian)."""
    rng = np.random.default_rng(8)
    N, D = 35, 1
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(X)
    y[y < -0.2] *= 3.0
    warp = NegativePower()
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        outwarp=warp,
    )
    gp.X, gp.y = X, y
    hyp = np.array([[0.1, 0.2, -2.0, 0.0, -0.2, 0.4]])
    gp.update(hyp=hyp)
    xs = np.linspace(-3, 3, 20)[:, None]
    # Single sample: pooled median == middle of the nx grid == the
    # inverse-warped warped-space mean (within grid discretization).
    q50 = gp.predict_quantile(0.5, xs, observed=False, nx=101)
    mu_w, _ = gp._group_predict(xs)
    expect = warp.compute(hyp[0][-2:], mu_w, inverse=True)[:, 0]
    assert np.max(np.abs(q50 - expect)) < 1e-6


def test_fit_time_outwarp_fun_option():
    """The MATLAB oracle's OutwarpFun train option (gplite_train.m:39):
    fit(options={"outwarp_fun": ...}) attaches the warp at fit time on
    a GP constructed without one, extending the hyperparameter layout
    and resetting bounds/priors to the new width."""
    rng = np.random.default_rng(7)
    N, D = 40, 1
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(X) + 0.05 * rng.normal(size=(N, 1))
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    hyp, _, _ = gp.fit(
        X=X,
        y=y,
        options={
            "n_samples": 2,
            "opts_N": 1,
            "init_N": 32,
            "outwarp_fun": gpr.outwarp_functions.NegativePower(),
        },
    )
    assert gp.outwarp is not None
    assert hyp.shape[1] == 1 + 1 + 1 + 1 + 2  # ell, sf, noise, mean, ow
    mu, s2 = gp.predict(np.linspace(-3, 3, 20)[:, None])
    assert np.all(np.isfinite(mu)) and np.all(s2 >= 0)
