"""Custom (user-supplied) mean functions — the MATLAB oracle's function
-handle capability (gplite_meanfun.m:10-18,43-50), absent from the
Python reference.  The user provides one jittable value function;
gradients, fitting, prediction and the dict ABI all flow through the
standard machinery."""

import numpy as np
import pytest

import jax.numpy as jnp

import gpyreg_tpu as gpr
from gpyreg_tpu.core.model import ModelSpec, register_custom_mean
from gpyreg_tpu.mean_functions import CustomMean, LinearMean


def _linear_value(hyp_mean, X):
    # Same model as LinearMean: m0 + X @ a  (1 + D hyps).
    D = X.shape[1]
    return hyp_mean[0] + X @ hyp_mean[1 : 1 + D]


def _make_gp(mean):
    return gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=mean,
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )


def test_compute_value_and_autodiff_grad():
    cm = CustomMean(_linear_value, lambda D: 1 + D, name="lin_test")
    rng = np.random.default_rng(0)
    X = rng.normal(size=(7, 2))
    hyp = np.array([0.3, -1.2, 2.0])
    ref = LinearMean()
    m, dm = cm.compute(hyp, X, compute_grad=True)
    m_ref, dm_ref = ref.compute(hyp, X, compute_grad=True)
    assert np.allclose(m, m_ref, atol=1e-12)
    assert np.allclose(dm, dm_ref, atol=1e-12)


def test_registry_name_collision():
    CustomMean(_linear_value, 3, name="collide_test")
    # Same callable, same name: fine (idempotent).
    CustomMean(_linear_value, 3, name="collide_test")
    with pytest.raises(ValueError, match="already registered"):
        CustomMean(lambda h, X: h[0] * X[:, 0], 1, name="collide_test")
    with pytest.raises(ValueError, match="not registered"):
        ModelSpec(
            D=1,
            cov="se",
            mean="custom:never_registered",
            noise_constant=True,
            noise_user=0,
            noise_rectified=False,
        )


def test_fit_predict_with_custom_mean():
    """End-to-end fit with a user-defined cosine mean."""

    def cos_mean(hyp_mean, X):
        return hyp_mean[0] + hyp_mean[1] * jnp.cos(
            jnp.sum(X, axis=1)
        )

    cm = CustomMean(cos_mean, 2, name="cos_test")
    gp = _make_gp(cm)
    rng = np.random.default_rng(1)
    X = rng.uniform(-3, 3, (50, 2))
    y = (2.0 + 1.5 * np.cos(np.sum(X, 1)))[:, None] + 0.05 * rng.normal(
        size=(50, 1)
    )
    np.random.seed(0)
    hyp, _, _ = gp.fit(
        X=X, y=y, options={"n_samples": 0, "opts_N": 2, "init_N": 32}
    )
    assert hyp.shape[1] == 3 + 1 + 2  # SE-ARD cov 3 | noise 1 | mean 2
    mu, s2 = gp.predict(X[:10])
    assert np.all(np.isfinite(mu)) and np.all(s2 >= 0)
    assert np.max(np.abs(mu.ravel() - y[:10, 0])) < 0.5
    # The dict ABI carries the custom group.
    d = gp.get_hyperparameters()[0]
    assert "mean_custom" in d and np.size(d["mean_custom"]) == 2


def test_custom_matches_builtin_fit():
    """A custom linear mean reproduces the builtin LinearMean NLML."""
    cm = CustomMean(_linear_value, lambda D: 1 + D, name="lin_test")
    gp_c = _make_gp(cm)
    gp_b = _make_gp(LinearMean())
    rng = np.random.default_rng(2)
    X = rng.uniform(-2, 2, (30, 2))
    y = (0.5 + X @ np.array([1.0, -0.7]))[:, None] + 0.1 * rng.normal(
        size=(30, 1)
    )
    gp_c.X, gp_c.y = X, y
    gp_b.X, gp_b.y = X, y
    hyp = np.array([0.1, -0.2, 0.0, -1.5, 0.4, 1.1, -0.6])
    ll_c = gp_c.log_likelihood(hyp)
    ll_b = gp_b.log_likelihood(hyp)
    assert np.isclose(ll_c, ll_b, rtol=1e-12)


def test_save_refuses_custom_mean(tmp_path):
    cm = CustomMean(_linear_value, lambda D: 1 + D, name="lin_test")
    gp = _make_gp(cm)
    rng = np.random.default_rng(3)
    gp.X = rng.normal(size=(5, 2))
    gp.y = rng.normal(size=(5, 1))
    with pytest.raises(ValueError, match="CustomMean"):
        gp.save(tmp_path / "gp.npz")


def test_quad_refuses_custom_mean():
    cm = CustomMean(_linear_value, lambda D: 1 + D, name="lin_test")
    gp = _make_gp(cm)
    rng = np.random.default_rng(4)
    X = rng.uniform(-2, 2, (20, 2))
    y = np.sum(X, 1)[:, None]
    np.random.seed(0)
    gp.fit(X=X, y=y, options={"n_samples": 0, "opts_N": 1, "init_N": 8})
    with pytest.raises(ValueError, match="quadrature"):
        gp.quad(np.zeros((1, 2)), np.ones((1, 2)))
