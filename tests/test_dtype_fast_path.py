"""float32 fast path: GP(dtype=np.float32) tracks the f64 reference
computation to single-precision accuracy (the TPU production dtype —
f64 matmul/Cholesky are emulated on TPU)."""

import numpy as np

import gpyreg_tpu as gpr


def _make(dtype, D=2):
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        dtype=dtype,
    )
    return gp


def test_f32_nlml_and_predict_track_f64():
    rng = np.random.default_rng(0)
    N, D = 60, 2
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, axis=1, keepdims=True)) + 0.1 * rng.normal(
        size=(N, 1)
    )
    hyp = np.array([[0.2, 0.1, 0.4, -1.5, 0.05]])

    gp64 = _make(None)
    gp32 = _make(np.float32)
    for gp in (gp64, gp32):
        gp.update(X_new=X, y_new=y, hyp=hyp)

    ll64 = gp64.log_likelihood(hyp[0])
    ll32 = gp32.log_likelihood(hyp[0])
    assert abs(ll64 - ll32) / abs(ll64) < 1e-4

    xs = rng.uniform(-3, 3, (50, D))
    mu64, s264 = gp64.predict(xs)
    mu32, s232 = gp32.predict(xs)
    assert np.max(np.abs(mu64 - mu32)) < 1e-3
    assert np.max(np.abs(s264 - s232)) < 1e-3


def test_f32_gradients_finite_and_close():
    rng = np.random.default_rng(1)
    N, D = 40, 2
    X = rng.uniform(-2, 2, (N, D))
    y = np.cos(np.sum(X, axis=1, keepdims=True))
    hyp = np.array([0.1, 0.0, 0.2, -1.0, 0.0])

    gp64, gp32 = _make(None), _make(np.float32)
    for gp in (gp64, gp32):
        gp.X, gp.y = X, y

    _, g64 = gp64.log_likelihood(hyp, compute_grad=True)
    _, g32 = gp32.log_likelihood(hyp, compute_grad=True)
    assert np.all(np.isfinite(g32))
    denom = np.maximum(np.abs(g64), 1.0)
    assert np.max(np.abs(g64 - g32) / denom) < 1e-3


def test_f32_fit_smoke():
    rng = np.random.default_rng(2)
    N, D = 30, 1
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(X) + 0.05 * rng.normal(size=(N, 1))
    gp = _make(np.float32, D=1)
    hyp, _, _ = gp.fit(
        X=X, y=y, options={"n_samples": 2, "opts_N": 1, "init_N": 16}
    )
    mu, s2 = gp.predict(np.linspace(-3, 3, 20)[:, None])
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(s2))
    assert np.all(s2 >= 0)
