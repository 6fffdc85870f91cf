"""Hyperprior log-density as a pure, differentiable JAX function.

The reference implements four prior families per hyperparameter —
gaussian, student_t, smoothbox, smoothbox_student_t — plus fixed
(LB == UB) and improper-uniform, selected by finiteness patterns of the
SoA prior table (reference gaussian_process.py:1275-1466).  Here the
family masks are precomputed on the host into a :class:`PriorPack` pytree;
the log density is a single vectorized, where-masked expression whose
gradient comes from autodiff (the reference's hand-derived ``dlp`` is
used only as a test oracle).
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import gammaln

_LOG_2PI = float(np.log(2.0 * np.pi))


class PriorPack(NamedTuple):
    """Device-side prior table + family masks (a pytree of arrays)."""

    mu: jnp.ndarray
    sigma: jnp.ndarray  # abs() applied
    df: jnp.ndarray
    a: jnp.ndarray
    b: jnp.ndarray
    lb: jnp.ndarray
    ub: jnp.ndarray
    f_mask: jnp.ndarray  # fixed: lb == ub
    sb_mask: jnp.ndarray  # smoothbox
    sbt_mask: jnp.ndarray  # smoothbox student-t
    g_mask: jnp.ndarray  # gaussian
    t_mask: jnp.ndarray  # student-t
    log_norm: jnp.ndarray  # sum(log(normalization_constants)), scalar


def build_prior_pack(hyper_priors, lower_bounds, upper_bounds, log_norm=0.0):
    """Build a PriorPack from the host-side SoA prior dict.

    Mask logic mirrors reference gaussian_process.py:1289-1312.
    """
    mu = np.asarray(hyper_priors["mu"], dtype=np.float64)
    sigma = np.abs(np.asarray(hyper_priors["sigma"], dtype=np.float64))
    df = np.asarray(hyper_priors["df"], dtype=np.float64)
    a = np.asarray(hyper_priors["a"], dtype=np.float64)
    b = np.asarray(hyper_priors["b"], dtype=np.float64)
    lb = np.asarray(lower_bounds, dtype=np.float64)
    ub = np.asarray(upper_bounds, dtype=np.float64)

    fin = np.isfinite
    f_mask = lb == ub
    df_gauss = (df == 0) | ~fin(df)
    sb_mask = fin(a) & fin(b) & df_gauss & ~fin(mu) & fin(sigma)
    sbt_mask = fin(a) & fin(b) & (df > 0) & ~fin(mu) & fin(sigma) & fin(df)
    u_mask = ~fin(mu) & ~fin(sigma)
    g_mask = ~u_mask & ~sb_mask & df_gauss & fin(sigma)
    t_mask = ~u_mask & ~sbt_mask & (df > 0) & fin(df)

    def dev(x):
        # Host-side leaves: the pack rides along as a (tiny) traced jit
        # argument, so jit folds the upload into each dispatch.  Eager
        # jnp.asarray here would cost ~10 remote-tunnel round trips per
        # prior rebuild (every warm refit).
        return np.asarray(x)

    # NaN-safe parameter substitutions so that unmasked lanes cannot
    # poison gradients through jnp.where.
    any_loc = sb_mask | sbt_mask | g_mask | t_mask
    return PriorPack(
        mu=dev(np.where(g_mask | t_mask, mu, 0.0)),
        sigma=dev(np.where(any_loc, sigma, 1.0)),
        df=dev(np.where(sbt_mask | t_mask, df, 1.0)),
        a=dev(np.where(sb_mask | sbt_mask, a, 0.0)),
        b=dev(np.where(sb_mask | sbt_mask, b, 0.0)),
        lb=dev(np.where(np.isfinite(lb), lb, 0.0)),
        ub=dev(np.where(np.isfinite(ub), ub, 0.0)),
        f_mask=dev(f_mask),
        sb_mask=dev(sb_mask),
        sbt_mask=dev(sbt_mask),
        g_mask=dev(g_mask),
        t_mask=dev(t_mask),
        log_norm=np.float64(log_norm),
    )


def log_prior(pack: PriorPack, hyp):
    """Unnormalized-then-truncation-normalized log prior density.

    Vectorized counterpart of reference __compute_log_priors
    (gaussian_process.py:1275-1466).  Returns a scalar; -inf when a fixed
    hyperparameter deviates from its pinned value.
    """
    mu, sigma, df, a, b = pack.mu, pack.sigma, pack.df, pack.a, pack.b

    # Gaussian / student-t quadratic form.
    z2 = ((hyp - mu) / sigma) ** 2

    # --- Gaussian ---
    lp_g = -0.5 * (_LOG_2PI + 2.0 * jnp.log(sigma) + z2)

    # --- Student-t ---
    t_norm = (
        gammaln(0.5 * (df + 1.0))
        - gammaln(0.5 * df)
        - 0.5 * jnp.log(jnp.pi * df)
        - jnp.log(sigma)
    )
    lp_t = t_norm - 0.5 * (df + 1.0) * jnp.log1p(z2 / df)

    # --- Smoothbox (gaussian flanks, flat core) ---
    C_sb = 1.0 + (b - a) / (sigma * jnp.sqrt(2.0 * jnp.pi))
    below = hyp < a
    above = hyp > b
    edge = jnp.where(below, a, b)
    z2_sb = jnp.where(below | above, ((hyp - edge) / sigma) ** 2, 0.0)
    lp_sb_out = -0.5 * (
        jnp.log(C_sb**2) + _LOG_2PI + 2.0 * jnp.log(sigma) + z2_sb
    )
    lp_sb_in = -(jnp.log(C_sb * sigma) + 0.5 * _LOG_2PI)
    lp_sb = jnp.where(below | above, lp_sb_out, lp_sb_in)

    # --- Smoothbox student-t (t flanks, flat core) ---
    c_t = jnp.exp(
        gammaln(0.5 * (df + 1.0))
        - gammaln(0.5 * df)
        - jnp.log(sigma)
        - 0.5 * jnp.log(df * jnp.pi)
    )
    C_sbt = 1.0 + (b - a) * c_t
    lp_sbt_out = (
        gammaln(0.5 * (df + 1.0))
        - gammaln(0.5 * df)
        - 0.5 * jnp.log(jnp.pi * df)
        - jnp.log(C_sbt * sigma)
        - 0.5 * (df + 1.0) * jnp.log1p(z2_sb / df)
    )
    lp_sbt_in = (
        gammaln(0.5 * (df + 1.0))
        - gammaln(0.5 * df)
        - 0.5 * jnp.log(jnp.pi * df)
        - jnp.log(C_sbt * sigma)
    )
    lp_sbt = jnp.where(below | above, lp_sbt_out, lp_sbt_in)

    per_dim = (
        jnp.where(pack.g_mask, lp_g, 0.0)
        + jnp.where(pack.t_mask, lp_t, 0.0)
        + jnp.where(pack.sb_mask, lp_sb, 0.0)
        + jnp.where(pack.sbt_mask, lp_sbt, 0.0)
    )
    lp = jnp.sum(per_dim) - pack.log_norm

    # Fixed hyperparameters: -inf off the pinned value
    # (reference gaussian_process.py:1321-1325).
    bad_fixed = jnp.any(jnp.logical_and(pack.f_mask, hyp != pack.lb))
    return jnp.where(bad_fixed, -jnp.inf, lp)
