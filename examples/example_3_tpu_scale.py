"""TPU-scale features (no reference analog).

Demonstrates the production path for large datasets and refit loops:
float32 compute, shape bucketing for compile reuse, fast_predict
explicit-inverse factors, the device samplers, and matrix-free CG
inference past the Cholesky size limit.
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import gpyreg_tpu as gpr

rng = np.random.default_rng(0)
N, D = 1024, 8  # scale N up freely on a TPU host
X = rng.normal(size=(N, D))
y = np.sum(np.sin(X), axis=1, keepdims=True) + 0.1 * rng.normal(
    size=(N, 1)
)

# Production configuration: f32 (TPU fast path), shape bucketing (warm
# refits reuse compiled programs as data grows), fast_predict (pure-MXU
# prediction).
gp = gpr.GP(
    D=D,
    covariance=gpr.covariance_functions.SquaredExponential(),
    mean=gpr.mean_functions.ConstantMean(),
    noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    dtype=np.float32,
    pad_bucket=512,
    fast_predict=True,
)

hyp, opt_res, samp_res = gp.fit(
    X=X, y=y, options={"n_samples": 4, "opts_N": 1, "init_N": 128}
)
print("fit phases (s):", {k: round(v, 2) for k, v in gp.fit_timings.items()})

# Online growth: new data lands in the same shape bucket -> no recompile.
Xn = rng.normal(size=(100, D))
yn = np.sum(np.sin(Xn), axis=1, keepdims=True)
gp.update(X_new=Xn, y_new=yn, compute_posterior=False)
gp.fit(options={"n_samples": 4, "opts_N": 1, "init_N": 0})
print("warm refit phases (s):", {k: round(v, 2) for k, v in gp.fit_timings.items()})

# Large test batches stream through device-side chunk loops.
xs = rng.normal(size=(20_000, D))
mu, s2 = gp.predict(xs)
print("predicted", xs.shape[0], "points; mean var:", float(s2.mean()))

# Past the Cholesky limit: matrix-free CG (kernel never materialized).
from gpyreg_tpu.core.model import ModelSpec
from gpyreg_tpu.ops.iterative import cg_predict

hyp0 = gp.get_hyperparameters(as_array=True)[0]
spec = gp._spec()
mu_cg, _, info = cg_predict(
    spec, hyp0, X.astype(np.float32), y.astype(np.float32), None,
    xs[:1000].astype(np.float32), tol=1e-4, row_chunk=1024,
)
print("CG predict info:", info)
