"""2-D GP regression, refitting after new data arrives.

Workflow parity with reference examples/example_2.py: SE-ARD kernel,
constant mean, constant Gaussian noise, mixed prior families, fit +
predict on a grid, then incremental update() and refit.
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import gpyreg_tpu as gpr

np.random.seed(1235)
N, D = 20, 2
X = np.random.uniform(low=-3, high=3, size=(N, D))
y = np.reshape(
    np.sin(np.sum(X, 1)) + np.random.normal(scale=0.1, size=N), (-1, 1)
)

gp = gpr.GP(
    D=D,
    covariance=gpr.covariance_functions.SquaredExponential(),
    mean=gpr.mean_functions.ConstantMean(),
    noise=gpr.noise_functions.GaussianNoise(constant_add=True),
)

gp.set_priors(
    {
        "covariance_log_outputscale": ("student_t", (0, np.log(10), 3)),
        "covariance_log_lengthscale": (
            "gaussian",
            (np.log(np.std(X, ddof=1)), np.log(10)),
        ),
        "noise_log_scale": ("gaussian", (np.log(1e-3), 1.0)),
        "mean_const": ("smoothbox", (np.min(y), np.max(y), 1.0)),
    }
)

gp.fit(X=X, y=y, options={"n_samples": 10})

# Predict on a regular 20x20 grid.
xx, yy = np.meshgrid(np.linspace(-5, 5, 20), np.linspace(-5, 5, 20))
x_star = np.array((xx.ravel(), yy.ravel())).T
fmu, fs2 = gp.predict(x_star, add_noise=False)
print("latent mean/variance ranges:", fmu.min(), fmu.max(), fs2.max())

# New data arrive: update the training set without recomputing the
# posterior (we refit immediately after).
X_new = np.random.uniform(low=-5, high=5, size=(N, D))
y_new = np.reshape(
    np.sin(np.sum(X_new, 1)) + np.random.normal(scale=0.1, size=N), (-1, 1)
)
gp.update(X_new=X_new, y_new=y_new, compute_posterior=False)
gp.fit(options={"n_samples": 10})

if __name__ == "__main__":
    gp.plot()
