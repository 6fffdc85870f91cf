"""The functional exact-GP core: NLML, gradients, posterior factors.

Replaces the reference's ``GP.__core_computation``
(gaussian_process.py:2357-2521).  Key TPU-first changes:

- A single Cholesky of ``G = K + mult*diag(sn2)`` serves both of the
  reference's parametrizations: the NLML is parametrization-independent
  (``nlZ = 0.5 r^T G^{-1} r + sum(log diag chol(G)) + N/2 log(2pi)``), so
  the hot path is branch-free.  The high/low-noise split
  (gaussian_process.py:2404) only affects the *stored* posterior factors
  and is applied once per fit, on concrete values.
- All hyperparameter gradients come from ``jax.grad`` through the
  custom-VJP :func:`~gpyreg_tpu.ops.linalg.jittered_cholesky` (multiplier
  treated as constant — same semantics as the reference's analytic
  gradients evaluated at the successful multiplier).
- Batched evaluation over many hyperparameter vectors is a ``vmap``; the
  N x N Cholesky batches onto the MXU-backed XLA batched Cholesky.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..ops.linalg import chol_solve, jittered_cholesky
from .model import ModelSpec, cov_matrix, mean_value, noise_variance
from .priors import log_prior

import math

_LOG_2PI = math.log(2.0 * math.pi)


def gp_parts(spec: ModelSpec, hyp, X, y, s2):
    """Common sub-expressions: sn2 (raw), m, K, L=chol(G), mult, alpha,
    and the output-warping log-Jacobian.

    ``hyp`` is cast to the data dtype so a float32 X/y (the TPU fast
    path; f64 is emulated on TPU) keeps the whole computation in f32
    even when the caller passes f64 hyperparameters.

    With output warping (spec.outwarp), the GP models g(y): the noise
    function sees the ORIGINAL y (for the rectified output-dependent
    branch) but warped user variance s2 * g'(y)^2, matching
    matlab/gplite/private/gplite_core.m:13-37.
    """
    N = X.shape[0]
    hyp = jnp.asarray(hyp).astype(X.dtype)
    hyp_cov, hyp_noise, hyp_mean = spec.split_hyp(hyp)

    log_jacobian = jnp.asarray(0.0, dtype=X.dtype)
    y_eff, s2_eff = y, s2
    if spec.outwarp is not None:
        from ..outwarp_functions import warp_value_and_dt

        hyp_ow = spec.outwarp_hyp(hyp)
        y_eff, dwarp = warp_value_and_dt(spec.outwarp, hyp_ow, y)
        if s2 is not None:
            s2_eff = s2 * dwarp**2
        log_jacobian = jnp.sum(jnp.log(jnp.abs(dwarp)))

    sn2 = noise_variance(spec, hyp_noise, y, s2_eff, X.dtype)
    m = mean_value(spec, hyp_mean, X)[:, None]
    K = cov_matrix(spec, hyp_cov, X)
    sn2_vec = jnp.broadcast_to(jnp.reshape(sn2, (-1,)), (N,))
    L, mult = jittered_cholesky(K, sn2_vec)
    r = y_eff - m
    alpha = chol_solve(L, r)
    return sn2_vec, m, L, mult, r, alpha, log_jacobian


def nlz(spec: ModelSpec, hyp, X, y, s2):
    """Negative log marginal likelihood (branch-free; see module doc).

    Includes the output-warping Jacobian correction
    ``- sum(log |g'(y)|)`` (gplite_core.m:115) when spec.outwarp is set.
    """
    N = X.shape[0]
    _, _, L, _, r, alpha, log_jac = gp_parts(spec, hyp, X, y, s2)
    return (
        0.5 * jnp.sum(r * alpha)
        + jnp.sum(jnp.log(jnp.diag(L)))
        + 0.5 * N * _LOG_2PI
        - log_jac
    )


def posterior_factors(spec: ModelSpec, hyp, X, y, s2):
    """Device part of Posterior construction.

    Returns (alpha, L_G_lower, mult, sn2_min).  The host converts these to
    the reference's stored-factor convention (upper Cholesky of the scaled
    matrix, or explicit negative inverse) based on the concrete
    ``sn2_min >= 1e-6`` flag — reference gaussian_process.py:2404-2448.
    """
    sn2_vec, _, L, mult, _, alpha, _ = gp_parts(spec, hyp, X, y, s2)
    return alpha, L, mult, jnp.min(sn2_vec)


@lru_cache(maxsize=None)
def get_fns(spec: ModelSpec, has_s2: bool, has_prior: bool):
    """Jitted function bundle for a model family.

    Returns a dict with:
      nlz(hyp, X, y, s2?)                      -> scalar nlZ
      obj(hyp, X, y, s2?, pack?)               -> nlZ - log_prior
      obj_grad(hyp, X, y, s2?, pack?)          -> (value, grad)
      obj_batch(hyps, X, y, s2?, pack?)        -> (B,) values
      obj_grad_batch(hyps, X, y, s2?, pack?)   -> ((B,), (B,hyp_N))
      post(hyp, X, y, s2?)                     -> posterior factors
      post_batch(hyps, X, y, s2?)              -> batched factors
    ``s2``/``pack`` arguments are present iff the corresponding flag.
    """

    if has_s2 and has_prior:

        def _obj(hyp, X, y, s2, pack):
            return nlz(spec, hyp, X, y, s2) - log_prior(pack, hyp)

        def _nlz(hyp, X, y, s2, pack=None):
            return nlz(spec, hyp, X, y, s2)

    elif has_s2:

        def _obj(hyp, X, y, s2):
            return nlz(spec, hyp, X, y, s2)

        _nlz = _obj
    elif has_prior:

        def _obj(hyp, X, y, pack):
            return nlz(spec, hyp, X, y, None) - log_prior(pack, hyp)

        def _nlz(hyp, X, y, pack=None):
            return nlz(spec, hyp, X, y, None)

    else:

        def _obj(hyp, X, y):
            return nlz(spec, hyp, X, y, None)

        _nlz = _obj

    if has_s2:

        def _post(hyp, X, y, s2):
            return posterior_factors(spec, hyp, X, y, s2)

        post_axes = (0, None, None, None)
    else:

        def _post(hyp, X, y):
            return posterior_factors(spec, hyp, X, y, None)

        post_axes = (0, None, None)

    def _log_post_raw(hyp, *args):
        """Positive (unnormalized) log posterior for MCMC samplers.

        Unjitted on purpose: identity-stable (this bundle is lru_cached
        per spec), so the device slice sampler's jit cache keys on it and
        warm-started refits (reference gaussian_process.py:1076-1078) hit
        the compile cache.
        """
        return -_obj(hyp, *args)

    obj_grad = jax.value_and_grad(_obj)
    n_extra = 2 + int(has_s2) + int(has_prior)
    in_axes = (0,) + (None,) * n_extra
    return {
        "log_post_raw": _log_post_raw,
        "obj_raw": _obj,
        "nlz": jax.jit(_nlz),
        "nlz_grad": jax.jit(jax.value_and_grad(_nlz)),
        "obj": jax.jit(_obj),
        "obj_grad": jax.jit(obj_grad),
        "obj_batch": jax.jit(jax.vmap(_obj, in_axes=in_axes)),
        "obj_grad_batch": jax.jit(jax.vmap(obj_grad, in_axes=in_axes)),
        "post": jax.jit(_post),
        "post_batch": jax.jit(jax.vmap(_post, in_axes=post_axes)),
    }
