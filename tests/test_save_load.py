"""GP serialization round-trip: save/load reconstructs the exact state
(data, bounds, priors, hyperparameter samples) and identical posterior
factors/predictions — the npz analog of the reference's clean()/update
reconstruction contract."""

import numpy as np

import gpyreg_tpu as gpr


def _fitted_gp(tmp_path):
    rng = np.random.default_rng(0)
    N, D = 30, 2
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, axis=1, keepdims=True)) + 0.1 * rng.normal(
        size=(N, 1)
    )
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.Matern(degree=5),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp.set_priors(
        {
            "covariance_log_lengthscale": None,
            "covariance_log_outputscale": ("student_t", (0.0, 1.0, 3)),
            "noise_log_scale": ("gaussian", (np.log(1e-2), 1.0)),
            "mean_const": None,
        }
    )
    hyp = np.array(
        [[0.2, 0.1, 0.4, -1.5, 0.05], [0.25, 0.12, 0.35, -1.4, 0.0]]
    )
    gp.update(X_new=X, y_new=y, hyp=hyp)
    return gp, rng


def test_roundtrip_predictions_identical(tmp_path):
    gp, rng = _fitted_gp(tmp_path)
    path = tmp_path / "gp.npz"
    gp.save(path)
    gp2 = gpr.GP.load(path)

    xs = rng.uniform(-3, 3, (20, 2))
    mu1, s21 = gp.predict(xs)
    mu2, s22 = gp2.predict(xs)
    assert np.allclose(mu1, mu2, atol=1e-12)
    assert np.allclose(s21, s22, atol=1e-12)

    h = gp.get_hyperparameters(as_array=True)[0]
    assert np.isclose(gp.log_posterior(h), gp2.log_posterior(h))
    assert gp2.covariance.degree == 5
    assert str(gp2) == str(gp)


def test_roundtrip_without_posteriors(tmp_path):
    gp = gpr.GP(
        D=1,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ZeroMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    path = tmp_path / "empty.npz"
    gp.save(path)
    gp2 = gpr.GP.load(path)
    assert gp2.D == 1
    assert gp2.posteriors is None
    assert np.all(np.isnan(gp2.lower_bounds))


def test_roundtrip_isotropic_and_s2(tmp_path):
    rng = np.random.default_rng(1)
    X = rng.uniform(-2, 2, (20, 2))
    s2 = 0.01 + 0.01 * rng.random((20, 1))
    y = np.cos(np.sum(X, axis=1, keepdims=True))
    gp = gpr.GP(
        D=2,
        covariance=gpr.isotropic_covariance_functions.SquaredExponentialIsotropic(),
        mean=gpr.mean_functions.ZeroMean(),
        noise=gpr.noise_functions.GaussianNoise(
            constant_add=True, user_provided_add=True
        ),
    )
    gp.X, gp.y, gp.s2 = X, y, s2
    gp.update(hyp=np.array([[0.1, 0.2, -2.0]]))
    path = tmp_path / "iso.npz"
    gp.save(path)
    gp2 = gpr.GP.load(path)
    xs = rng.uniform(-2, 2, (10, 2))
    assert np.allclose(gp.predict(xs)[0], gp2.predict(xs)[0], atol=1e-12)


def test_roundtrip_with_outwarp(tmp_path):
    rng = np.random.default_rng(2)
    X = rng.uniform(-3, 3, (25, 1))
    y = np.sin(X)
    y[y < 0] *= 3.0
    gp = gpr.GP(
        D=1,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        outwarp=gpr.outwarp_functions.NegativePower(),
    )
    gp.X, gp.y = X, y
    gp.update(hyp=np.array([[0.1, 0.2, -2.0, 0.0, 0.0, 0.3]]))
    path = tmp_path / "warped.npz"
    gp.save(path)
    gp2 = gpr.GP.load(path)
    assert gp2.outwarp is not None and gp2.outwarp._kind == "negpow"
    xs = np.linspace(-2, 2, 15)[:, None]
    assert np.allclose(gp.predict(xs)[0], gp2.predict(xs)[0], atol=1e-12)
