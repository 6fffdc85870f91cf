"""Noise function tests: flag combinations, shapes, gradients
(reference testing/test_noise_functions.py extended with value and
gradient checks)."""

import numpy as np
import pytest

from gpyreg_tpu.noise_functions import GaussianNoise


def test_counts_and_info():
    assert GaussianNoise().hyperparameter_count() == 0
    assert GaussianNoise(constant_add=True).hyperparameter_count() == 1
    assert (
        GaussianNoise(
            user_provided_add=True, scale_user_provided=True
        ).hyperparameter_count()
        == 1
    )
    assert GaussianNoise(user_provided_add=True).hyperparameter_count() == 0
    n = GaussianNoise(True, True, True, True)
    assert n.hyperparameter_count() == 4
    assert n.hyperparameter_info() == [
        ("noise_log_scale", 1),
        ("noise_provided_log_multiplier", 1),
        ("noise_rectified_log_multiplier", 2),
    ]


def test_validation():
    n = GaussianNoise(True, True, True, True)
    X = np.random.randn(5, 2)
    y = np.random.randn(5, 1)
    with pytest.raises(ValueError):
        n.compute(np.zeros(3), X, y)
    with pytest.raises(ValueError):
        n.compute(np.zeros((1, 4)), X, y)


def test_values():
    rng = np.random.default_rng(0)
    N = 12
    X = rng.normal(size=(N, 2))
    y = rng.normal(size=(N, 1))
    s2 = np.abs(rng.normal(size=(N, 1)))

    # constant only -> scalar
    sn2 = GaussianNoise(constant_add=True).compute(np.array([-0.5]), X, y)
    assert np.isscalar(sn2)
    assert np.isclose(sn2, np.exp(-1.0))

    # nothing -> machine-epsilon floor
    sn2 = GaussianNoise().compute(np.zeros(0), X, y)
    assert np.isclose(sn2, np.spacing(1.0))

    # user-provided as-is
    sn2 = GaussianNoise(user_provided_add=True).compute(
        np.zeros(0), X, y, s2
    )
    assert np.allclose(sn2, np.spacing(1.0) + s2)

    # scaled user-provided
    sn2 = GaussianNoise(
        user_provided_add=True, scale_user_provided=True
    ).compute(np.array([0.7]), X, y, s2)
    assert np.allclose(sn2, np.spacing(1.0) + np.exp(0.7) * s2)

    # rectified output-dependent
    hyp = np.array([0.2, -0.4])
    sn2 = GaussianNoise(
        rectified_linear_output_dependent_add=True
    ).compute(hyp, X, y)
    zz = np.maximum(0, 0.2 - y)
    assert np.allclose(sn2, np.spacing(1.0) + np.exp(-0.8) * zz**2)


def test_gradients():
    rng = np.random.default_rng(1)
    N = 10
    X = rng.normal(size=(N, 2))
    y = rng.normal(size=(N, 1))
    s2 = np.abs(rng.normal(size=(N, 1)))

    n = GaussianNoise(True, True, True, True)
    hyp = rng.normal(size=4) * 0.3
    sn2, dsn2 = n.compute(hyp, X, y, s2, compute_grad=True)
    assert dsn2.shape == (N, 4)
    eps = 1e-7
    for i in [0, 1, 3]:  # skip the kink-prone threshold hyp (index 2)
        e = np.zeros(4)
        e[i] = eps
        num = (
            n.compute(hyp + e, X, y, s2) - n.compute(hyp - e, X, y, s2)
        ) / (2 * eps)
        assert np.max(np.abs(dsn2[:, i : i + 1] - num)) < 1e-5


def test_bounds_info():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(15, 3))
    y = rng.normal(size=(15, 1))
    for n in [
        GaussianNoise(constant_add=True),
        GaussianNoise(True, True, True, True),
    ]:
        info = n.get_bounds_info(X, y)
        noise_N = n.hyperparameter_count()
        for key in ("LB", "UB", "PLB", "PUB", "x0"):
            assert info[key].shape == (noise_N,)
        assert np.all(info["LB"] <= info["UB"])


def test_all_noise_flags_end_to_end_fit():
    """Full fit with every noise feature enabled: constant + scaled user
    s2 + rectified output-dependent (reference noise_functions.py:26-41),
    exercising the complete hyperparameter layout through the jitted
    pipeline."""
    import gpyreg_tpu as gpr

    rng = np.random.default_rng(0)
    N, D = 30, 2
    X = rng.uniform(-3, 3, (N, D))
    s2 = 0.01 + 0.01 * rng.random((N, 1))
    y = np.sin(np.sum(X, axis=1, keepdims=True)) + 0.1 * rng.normal(
        size=(N, 1)
    )
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(
            constant_add=True,
            user_provided_add=True,
            scale_user_provided=True,
            rectified_linear_output_dependent_add=True,
        ),
    )
    # cov (3) + noise (1 const + 1 scale + 2 rectified) + mean (1)
    hyp, _, _ = gp.fit(
        X=X, y=y, s2=s2,
        options={"n_samples": 2, "opts_N": 1, "init_N": 16},
    )
    assert hyp.shape[1] == 3 + 4 + 1
    mu, s2p = gp.predict(rng.uniform(-3, 3, (10, D)), add_noise=True)
    assert np.all(np.isfinite(mu)) and np.all(s2p >= 0)
