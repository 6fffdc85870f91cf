"""Shape bucketing (pad_bucket): padded NLML/gradients/posteriors/
predictions equal the unpadded ones exactly, including with user noise,
priors, output warping, and jitter escalation; compiled-program reuse
across growing N within a bucket."""

import numpy as np
import pytest

import gpyreg_tpu as gpr


def _data(rng, N=37, D=2, with_s2=False):
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, axis=1, keepdims=True)) + 0.1 * rng.normal(
        size=(N, 1)
    )
    s2 = 0.01 + 0.01 * rng.random((N, 1)) if with_s2 else None
    return X, y, s2


def _mk(pad_bucket=None, with_s2=False, outwarp=None):
    return gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(
            constant_add=True, user_provided_add=with_s2
        ),
        pad_bucket=pad_bucket,
        outwarp=outwarp,
    )


@pytest.mark.parametrize("with_s2", [False, True])
def test_padded_nlml_and_grad_match(with_s2):
    rng = np.random.default_rng(0)
    X, y, s2 = _data(rng, with_s2=with_s2)
    hyp = np.array([0.2, 0.1, 0.3, -1.2, 0.05])

    gp = _mk(None, with_s2)
    gpp = _mk(64, with_s2)  # pads 37 -> 64
    for g in (gp, gpp):
        g.X, g.y, g.s2 = X, y, s2

    v0, g0 = gp.log_likelihood(hyp, compute_grad=True)
    v1, g1 = gpp.log_likelihood(hyp, compute_grad=True)
    assert abs(v0 - v1) < 1e-9 * max(1, abs(v0))
    assert np.max(np.abs(g0 - g1)) < 1e-8

    lp0 = gp.log_posterior(hyp)
    lp1 = gpp.log_posterior(hyp)
    assert abs(lp0 - lp1) < 1e-9 * max(1, abs(lp0))


def test_padded_posteriors_and_predictions_match():
    rng = np.random.default_rng(1)
    X, y, _ = _data(rng)
    hyp = np.array([[0.2, 0.1, 0.3, -1.2, 0.05],
                    [0.25, 0.15, 0.35, -1.0, 0.0]])

    gp, gpp = _mk(None), _mk(32)
    gp.update(X_new=X, y_new=y, hyp=hyp)
    gpp.update(X_new=X, y_new=y, hyp=hyp)

    p0, p1 = gp.posteriors[0], gpp.posteriors[0]
    assert p1.alpha.shape == p0.alpha.shape  # sliced back to true N
    assert np.allclose(p0.alpha, p1.alpha, atol=1e-10)
    assert np.allclose(np.asarray(p0.L), np.asarray(p1.L), atol=1e-10)

    xs = rng.uniform(-3, 3, (25, 2))
    mu0, s20 = gp.predict(xs)
    mu1, s21 = gpp.predict(xs)
    assert np.allclose(mu0, mu1, atol=1e-10)
    assert np.allclose(s20, s21, atol=1e-10)


def test_padded_jitter_escalation_match():
    """Duplicate rows with ~zero noise force the Cholesky retry; the
    padded NLML must still equal the unpadded one (the mult-dependent
    pad correction)."""
    rng = np.random.default_rng(2)
    X, y, _ = _data(rng, N=20)
    X = np.concatenate([X, X[:5]])  # exact duplicates -> singular K
    y = np.concatenate([y, y[:5]])
    hyp = np.array([0.2, 0.1, 0.3, -12.0, 0.05])  # sn2 ~ 4e-11

    gp, gpp = _mk(None), _mk(32)
    for g in (gp, gpp):
        g.X, g.y = X, y

    v0 = gp.log_likelihood(hyp)
    v1 = gpp.log_likelihood(hyp)
    assert np.isfinite(v0)
    assert abs(v0 - v1) < 1e-6 * max(1, abs(v0))


def test_padded_outwarp_match():
    rng = np.random.default_rng(3)
    X, y, _ = _data(rng)
    y[y < 0] *= 2.0
    ow = gpr.outwarp_functions.NegativePower()
    gp = _mk(None, outwarp=ow)
    gpp = _mk(64, outwarp=gpr.outwarp_functions.NegativePower())
    for g in (gp, gpp):
        g.X, g.y = X, y
    hyp = np.array([0.2, 0.1, 0.3, -1.2, 0.05, float(np.median(y)), 0.3])
    v0, g0 = gp.log_likelihood(hyp, compute_grad=True)
    v1, g1 = gpp.log_likelihood(hyp, compute_grad=True)
    assert abs(v0 - v1) < 1e-9 * max(1, abs(v0))
    assert np.max(np.abs(g0 - g1)) < 1e-8


def test_bucket_reuse_across_growth():
    """Growing N within one bucket keeps the same compiled programs
    (shape check) and fit stays correct."""
    rng = np.random.default_rng(4)
    X, y, _ = _data(rng, N=30)
    gp = _mk(64)
    np.random.seed(0)
    gp.fit(X=X, y=y, options={"n_samples": 2, "opts_N": 1, "init_N": 16})
    shape0 = self_args = gp._device()[2][0].shape
    for k in range(3):
        Xn, yn, _ = _data(rng, N=5)
        gp.update(X_new=Xn, y_new=yn, compute_posterior=False)
        gp.fit(options={"n_samples": 2, "opts_N": 1, "init_N": 0})
        assert gp._device()[2][0].shape == shape0  # same padded shape
    mu, s2 = gp.predict(rng.uniform(-3, 3, (10, 2)))
    assert np.all(np.isfinite(mu)) and np.all(s2 >= 0)
    assert gp.X.shape[0] == 45
