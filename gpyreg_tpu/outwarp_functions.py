"""Output-warping functions (MATLAB-oracle capability absent from the
Python reference port; SURVEY.md section 5).

A warp ``g`` maps observations so the GP models ``g(y)``; the marginal
likelihood gains the Jacobian term ``-sum(log |g'(y)|)`` and user noise
scales by ``g'(y)^2`` (matlab/gplite/private/gplite_core.m:13-30, :115).
All three oracle warps act only below a learned threshold ``y0``,
stretching the lower tail by a learned power — designed for PyVBMC-style
log-density targets with heavy negative tails:

- ``negpow`` (outwarp_negpow.m:86-101):
    g(y) = y0 - (y0 - y)^k              for y < y0, identity above.
- ``negpowc1`` (outwarp_negpowc1.m, C1-continuous at y0):
    g(y) = y0 - ((1 + y0 - y)^k - 1)/k  for y < y0.
- ``negscaledpow`` (outwarp_negscaledpow.m, extra scale a):
    g(y) = y0 - (a*(y0 - y))^k          for y < y0.

Hyperparameters are stored in the order (y0, log k[, log a inserted
before log k for negscaledpow]) at the END of the GP hyperparameter
vector (cov | noise | mean | outwarp), matching gplite_core.m:16.
Gradients come from autodiff; the MATLAB hand-derived dwarp_dtheta /
d2warp_dthetadt are the test oracle.
"""

import numpy as np

from .covariance_functions import _validate_hyp

import jax.numpy as jnp

OUTWARP_KINDS = ("negpow", "negpowc1", "negscaledpow")


def outwarp_hyp_count(kind: str) -> int:
    return 3 if kind == "negscaledpow" else 2


def warp_value_and_dt(kind: str, hyp_ow, y):
    """(g(y), g'(y)) as pure jax expressions; y of any shape.

    The below-threshold branch is computed with a NaN-safe masked delta
    so autodiff stays finite on the identity branch.
    """
    y0 = hyp_ow[0]
    if kind == "negscaledpow":
        a = jnp.exp(hyp_ow[1])
        k = jnp.exp(hyp_ow[2])
    else:
        a = 1.0
        k = jnp.exp(hyp_ow[1])

    below = y < y0
    delta_raw = y0 - y
    delta = jnp.where(below, delta_raw, 1.0)  # safe base for powers

    if kind == "negpow":
        g_below = y0 - delta**k
        dt_below = k * delta ** (k - 1.0)
    elif kind == "negpowc1":
        base = 1.0 + delta
        g_below = y0 - (base**k - 1.0) / k
        dt_below = base ** (k - 1.0)
    elif kind == "negscaledpow":
        g_below = y0 - (a * delta) ** k
        dt_below = a * k * (a * delta) ** (k - 1.0)
    else:
        raise ValueError(f"Unknown output warping kind: {kind}")

    g = jnp.where(below, g_below, y)
    dt = jnp.where(below, dt_below, jnp.ones_like(y))
    return g, dt


def warp_inverse(kind: str, hyp_ow, z):
    """g^{-1}(z) (outwarp_*.m invflag branches)."""
    y0 = hyp_ow[0]
    if kind == "negscaledpow":
        a = jnp.exp(hyp_ow[1])
        k = jnp.exp(hyp_ow[2])
    else:
        a = 1.0
        k = jnp.exp(hyp_ow[1])

    below = z < y0
    delta_raw = y0 - z
    delta = jnp.where(below, delta_raw, 1.0)

    if kind == "negpow":
        inv_below = y0 - delta ** (1.0 / k)
    elif kind == "negpowc1":
        inv_below = y0 + 1.0 - (1.0 + k * delta) ** (1.0 / k)
    elif kind == "negscaledpow":
        inv_below = y0 - (delta ** (1.0 / k)) / a
    else:
        raise ValueError(f"Unknown output warping kind: {kind}")

    return jnp.where(below, inv_below, z)


class _AbstractOutputWarping:
    """API-compatible wrapper (hyperparameter_count / hyperparameter_info
    / get_bounds_info / compute), duck-typing the covariance/mean/noise
    protocol of the reference."""

    _kind: str = None

    def hyperparameter_count(self):
        return outwarp_hyp_count(self._kind)

    def hyperparameter_info(self):
        if self._kind == "negscaledpow":
            return [
                ("outwarp_threshold", 1),
                ("outwarp_log_scale", 1),
                ("outwarp_log_power", 1),
            ]
        return [("outwarp_threshold", 1), ("outwarp_log_power", 1)]

    def get_bounds_info(self, X, y):
        """Data-driven bounds (outwarp_negpow.m:31-64): the threshold
        spans the observed y range; log-power plausibly in [-3, 3]."""
        n = self.hyperparameter_count()
        LB = np.full((n,), -np.inf)
        UB = np.full((n,), np.inf)
        PLB = np.full((n,), -np.inf)
        PUB = np.full((n,), np.inf)
        x0 = np.full((n,), np.nan)

        LB[0] = PLB[0] = np.min(y)
        UB[0] = PUB[0] = np.max(y)

        PLB[1:] = -3.0
        PUB[1:] = 3.0
        x0[1:] = 0.0

        i_nan = np.isnan(x0)
        x0[i_nan] = 0.5 * (PLB[i_nan] + PUB[i_nan])
        return {"LB": LB, "UB": UB, "PLB": PLB, "PUB": PUB, "x0": x0}

    def compute(self, hyp, y, inverse: bool = False, compute_grad=False):
        """Host-facing evaluation: g(y) (or g^{-1}(y)); with
        ``compute_grad`` also g'(y)."""
        hyp = np.asarray(hyp, dtype=np.float64)
        _validate_hyp(
            hyp, self.hyperparameter_count(), kind="output warping"
        )
        hyp = hyp.ravel()
        yj = jnp.asarray(y, dtype=jnp.float64)
        if inverse:
            if compute_grad:
                raise ValueError(
                    "When calling for the inverse output warping "
                    "function, only one function output is expected."
                )
            return np.asarray(warp_inverse(self._kind, hyp, yj))
        g, dt = warp_value_and_dt(self._kind, hyp, yj)
        if compute_grad:
            return np.asarray(g), np.asarray(dt)
        return np.asarray(g)


class NegativePower(_AbstractOutputWarping):
    """g(y) = y0 - (y0 - y)^k below y0 (outwarp_negpow.m)."""

    _kind = "negpow"


class NegativePowerC1(_AbstractOutputWarping):
    """C1-continuous variant (outwarp_negpowc1.m)."""

    _kind = "negpowc1"


class NegativeScaledPower(_AbstractOutputWarping):
    """Scaled variant g(y) = y0 - (a (y0 - y))^k (outwarp_negscaledpow.m)."""

    _kind = "negscaledpow"
