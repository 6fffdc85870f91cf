"""Heteroskedastic 1-D GP regression with hyperparameter priors.

Workflow parity with reference examples/example_1.py: Matern-3/2 kernel,
negative-quadratic mean, constant + user-provided observation noise,
student-t prior on the noise scale, 10 slice-sampled hyperposterior
samples.  On TPU the whole fit pipeline (space-filling design, multistart
MAP, MCMC) evaluates the NLML on device; the MCMC chain itself is a
single jitted XLA program.
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from scipy.stats import norm

import gpyreg_tpu as gpr

# Example data in 1-D with input-dependent observation noise.
np.random.seed(1234)
N, D = 31, 1
X = -5 + np.random.rand(N, 1) * 10
s2 = 0.05 * np.exp(0.5 * X)
y = np.sin(X) + np.sqrt(s2) * norm.ppf(np.random.random_sample(X.shape))
y[y < 0] = -np.abs(3 * y[y < 0]) ** 2

gp = gpr.GP(
    D=D,
    covariance=gpr.covariance_functions.Matern(degree=3),
    mean=gpr.mean_functions.NegativeQuadratic(),
    noise=gpr.noise_functions.GaussianNoise(
        constant_add=True, user_provided_add=True
    ),
)

# Hyperparameter priors: None leaves a flat prior; supported families are
# 'gaussian', 'student_t', 'smoothbox', 'smoothbox_student_t'.
gp.set_priors(
    {
        "covariance_log_lengthscale": None,
        "covariance_log_outputscale": None,
        "mean_const": None,
        "mean_location": None,
        "mean_log_scale": None,
        "noise_log_scale": ("student_t", (np.log(1e-3), 1.0, 7)),
    }
)

gp.fit(X=X, y=y, s2=s2, options={"n_samples": 10})

x_star = np.reshape(np.linspace(-15, 15, 200), (-1, 1))
fmu, fs2 = gp.predict(x_star, add_noise=False)
print("predictive mean head:", fmu[:5].ravel())

if __name__ == "__main__":
    gp.plot()
