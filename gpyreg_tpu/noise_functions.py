"""Composable Gaussian observation-noise function.

API parity with reference noise_functions.py: three independently
toggleable noise features summed into the total variance —

- constant noise ``exp(2*hyp)`` (1 hyp),
- user-provided variance ``s2``, optionally scaled by ``exp(hyp)``
  (0 or 1 hyp),
- rectified-linear output-dependent noise ``w^2 * max(0, y_thresh - y)^2``
  (2 hyps).

Returns a scalar when noise is input/output independent, else (N, 1).
The jitted training path uses the pure-JAX twin in
gpyreg_tpu/core/model.py (noise_variance).
"""

import numpy as np

from .covariance_functions import _validate_hyp


class GaussianNoise:
    """Gaussian noise function with composable features."""

    def __init__(
        self,
        constant_add: bool = False,
        user_provided_add: bool = False,
        scale_user_provided: bool = False,
        rectified_linear_output_dependent_add: bool = False,
    ):
        # Flag encoding matches reference noise_functions.py:26-41
        # (parameters[1] == 2 means "scaled user-provided").
        self.parameters = np.zeros((3,))
        if constant_add:
            self.parameters[0] = 1
        if user_provided_add:
            self.parameters[1] = 1
            if scale_user_provided:
                self.parameters[1] += 1
        if rectified_linear_output_dependent_add:
            self.parameters[2] = 1

    def hyperparameter_count(self):
        noise_N = 0
        if self.parameters[0] == 1:
            noise_N += 1
        if self.parameters[1] == 2:
            noise_N += 1
        if self.parameters[2] == 1:
            noise_N += 2
        return noise_N

    def hyperparameter_info(self):
        hyper_info = []
        if self.parameters[0] == 1:
            hyper_info.append(("noise_log_scale", 1))
        if self.parameters[1] == 2:
            hyper_info.append(("noise_provided_log_multiplier", 1))
        if self.parameters[2] == 1:
            hyper_info.append(("noise_rectified_log_multiplier", 2))
        return hyper_info

    def get_bounds_info(self, X: np.ndarray, y: np.ndarray):
        """Recommended bounds (reference noise_functions.py:82-177)."""
        _, D = X.shape
        noise_N = self.hyperparameter_count()
        tol = 1e-6
        LB = np.full((noise_N,), -np.inf)
        UB = np.full((noise_N,), np.inf)
        PLB = np.full((noise_N,), -np.inf)
        PUB = np.full((noise_N,), np.inf)
        x0 = np.full((noise_N,), np.nan)

        if np.size(y) <= 1:
            y = np.array([0, 1])
        height = np.max(y) - np.min(y)

        i = 0
        if self.parameters[0] == 1:  # constant noise (log std)
            LB[i] = np.log(tol)
            UB[i] = np.log(height)
            PLB[i] = 0.5 * np.log(tol)
            PUB[i] = np.log(np.std(y, ddof=1))
            x0[i] = np.log(1e-3)
            i += 1

        if self.parameters[1] == 2:  # user-provided scale multiplier
            LB[i] = np.log(1e-3)
            UB[i] = np.log(1e3)
            PLB[i] = np.log(0.5)
            PUB[i] = np.log(2)
            x0[i] = np.log(1)
            i += 1

        if self.parameters[2] == 1:  # output-dependent noise
            min_y, max_y = np.min(y), np.max(y)
            LB[i] = min_y
            UB[i] = max_y
            PLB[i] = min_y
            PUB[i] = np.maximum(max_y - 5 * D, min_y)
            x0[i] = np.maximum(max_y - 10 * D, min_y)
            i += 1

            LB[i] = np.log(1e-3)
            UB[i] = np.log(0.1)
            PLB[i] = np.log(0.01)
            PUB[i] = np.log(0.1)
            x0[i] = np.log(0.1)
            i += 1

        i_nan = np.isnan(x0)
        x0[i_nan] = 0.5 * (PLB[i_nan] + PUB[i_nan])

        return {"LB": LB, "PLB": PLB, "PUB": PUB, "UB": UB, "x0": x0}

    def compute(
        self,
        hyp: np.ndarray,
        X: np.ndarray,
        y: np.ndarray,
        s2: np.ndarray = None,
        compute_grad: bool = False,
    ):
        """Noise variance at the given points, optionally with the
        hyperparameter gradient (reference noise_functions.py:179-283)."""
        N, _ = X.shape
        noise_N = self.hyperparameter_count()
        hyp = np.asarray(hyp)

        _validate_hyp(hyp, noise_N, kind="noise")

        dsn2 = None
        if compute_grad:
            if any(x > 0 for x in self.parameters[1:]):
                dsn2 = np.zeros((N, noise_N))
            else:
                dsn2 = np.zeros((1, noise_N))

        i = 0
        if self.parameters[0] == 0:
            sn2 = np.spacing(1.0)
        else:
            sn2 = np.exp(2 * hyp[i])
            if compute_grad:
                dsn2[:, i] = 2 * sn2
            i += 1

        if s2 is None:
            s2 = 0
        if self.parameters[1] == 1:
            sn2 = sn2 + s2
        elif self.parameters[1] == 2:
            sn2 = sn2 + np.exp(hyp[i]) * s2
            if compute_grad:
                dsn2[:, i : i + 1] = np.exp(hyp[i]) * s2
            i += 1

        if self.parameters[2] == 1:
            if y is not None:
                y_thresh = hyp[i]
                w2 = np.exp(2 * hyp[i + 1])
                zz = np.maximum(0, y_thresh - y)
                sn2 = sn2 + w2 * zz**2
                if compute_grad:
                    dsn2[:, i : i + 1] = 2 * w2 * (y_thresh - y) * (zz > 0)
                    dsn2[:, i + 1 : i + 2] = 2 * w2 * zz**2
            i += 2

        if compute_grad:
            return sn2, dsn2
        return sn2
