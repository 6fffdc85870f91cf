"""Smoke tests for GP.plot (reference gaussian_process.py:1985-2215):
panel layout for D=1 and D=2, with and without data overlay."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

import gpyreg_tpu as gpr


def _fitted_gp(D):
    rng = np.random.default_rng(0)
    N = 25
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, axis=1, keepdims=True)) + 0.1 * rng.normal(
        size=(N, 1)
    )
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    hyp = np.concatenate([np.zeros(D), [0.0], [-2.0], [0.0]])[None, :]
    gp.update(X_new=X, y_new=y, hyp=hyp)
    return gp


def test_plot_1d():
    gp = _fitted_gp(1)
    gp.plot()
    assert plt.gcf().axes, "plot produced no axes"
    plt.close("all")


def test_plot_2d():
    gp = _fitted_gp(2)
    gp.plot(delta_y=2.0)
    # D x D panel matrix (diagonal profiles + off-diagonal contours).
    assert len(plt.gcf().axes) >= 4
    plt.close("all")
