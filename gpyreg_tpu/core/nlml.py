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
- Optional SHAPE BUCKETING: data padded to a bucketed N with a row mask
  (``n_real``) so that incrementally growing datasets (the PyVBMC refit
  loop, reference gaussian_process.py:691) reuse compiled programs
  instead of recompiling at every new N.  Padded rows contribute an
  identity block to G and zero residual, and the constant they add to
  the log-determinant / 2pi terms is subtracted exactly, so the padded
  NLML equals the unpadded one to rounding.
"""

import math
from functools import lru_cache

import jax
import jax.numpy as jnp

from .._config import CHOL_MAX_TRIES
from ..ops.linalg import chol_solve, jittered_cholesky, quad_logdet
from .model import ModelSpec, cov_matrix, mean_value, noise_variance
from .priors import log_prior

_LOG_2PI = math.log(2.0 * math.pi)


def _cov_masked(spec: ModelSpec, hyp_cov, X, mask):
    """Masked kernel matrix (the padded-bucket zeroing of
    :func:`assemble`, factored out so the chain path's jitter-retry
    body can REBUILD K instead of carrying it across the loop)."""
    K = cov_matrix(spec, hyp_cov, X)
    if mask is not None:
        K = K * (mask[:, None] * mask[None, :])
    return K


def assemble(spec: ModelSpec, hyp, X, y, s2, n_real=None):
    """Model assembly shared by the NLML and posterior paths: returns
    ``(K, sn2_vec, r, m, log_jacobian)`` with padding masks applied (see
    :func:`gp_parts` for the masking semantics)."""
    N = X.shape[0]
    hyp = jnp.asarray(hyp).astype(X.dtype)
    hyp_cov, hyp_noise, hyp_mean = spec.split_hyp(hyp)

    mask = None
    if n_real is not None:
        mask = (jnp.arange(N) < n_real).astype(X.dtype)

    log_jacobian = jnp.asarray(0.0, dtype=X.dtype)
    y_eff, s2_eff = y, s2
    if spec.outwarp is not None:
        from ..outwarp_functions import warp_value_and_dt

        hyp_ow = spec.outwarp_hyp(hyp)
        y_eff, dwarp = warp_value_and_dt(spec.outwarp, hyp_ow, y)
        if s2 is not None:
            s2_eff = s2 * dwarp**2
        log_jac_terms = jnp.log(jnp.abs(dwarp))
        if mask is not None:
            # where, not multiply: at extreme warp hyperparameters the
            # padded rows' log|g'(0)| can be +/-inf and inf*0 = NaN
            # would poison the whole padded NLML.
            log_jac_terms = jnp.where(
                mask[:, None] > 0, log_jac_terms, 0.0
            )
        log_jacobian = jnp.sum(log_jac_terms)

    sn2 = noise_variance(spec, hyp_noise, y, s2_eff, X.dtype)
    m = mean_value(spec, hyp_mean, X)[:, None]
    K = _cov_masked(spec, hyp_cov, X, mask)
    sn2_vec = jnp.broadcast_to(jnp.reshape(sn2, (-1,)), (N,))
    r = y_eff - m

    if mask is not None:
        sn2_vec = jnp.where(mask > 0, sn2_vec, 1.0)
        # where, not multiply: a warped padded row can be non-finite
        # (g(0) = -inf at extreme hyperparameters) and inf*0 = NaN.
        r = jnp.where(mask[:, None] > 0, r, 0.0)

    return K, sn2_vec, r, m, log_jacobian


def gp_parts(spec: ModelSpec, hyp, X, y, s2, n_real=None):
    """Common sub-expressions: sn2 (raw), m, K, L=chol(G), mult, alpha,
    and the output-warping log-Jacobian.

    ``hyp`` is cast to the data dtype so a float32 X/y (the TPU fast
    path; f64 is emulated on TPU) keeps the whole computation in f32
    even when the caller passes f64 hyperparameters.

    With output warping (spec.outwarp), the GP models g(y): the noise
    function sees the ORIGINAL y (for the rectified output-dependent
    branch) but warped user variance s2 * g'(y)^2, matching
    matlab/gplite/private/gplite_core.m:13-37.

    ``n_real`` (traced scalar or None): rows >= n_real are padding.
    Masking turns G block-diagonal ([[G_real, 0], [0, mult*I]]) with
    zero padded residual, so alpha's padded entries are exactly zero and
    the real block's factor is exactly the unpadded factor.
    """
    K, sn2_vec, r, m, log_jacobian = assemble(spec, hyp, X, y, s2, n_real)
    L, mult = jittered_cholesky(K, sn2_vec)
    alpha = chol_solve(L, r)
    return sn2_vec, m, L, mult, r, alpha, log_jacobian


def nlz(spec: ModelSpec, hyp, X, y, s2, n_real=None):
    """Negative log marginal likelihood (branch-free; see module doc).

    Includes the output-warping Jacobian correction
    ``- sum(log |g'(y)|)`` (gplite_core.m:115) when spec.outwarp is set.
    With padding, the padded rows' exact contributions
    (0.5*log(mult) per row to the log-determinant, 0.5*log(2pi) per row
    to the constant) are subtracted.

    The factorize+solve+logdet block runs through the fused
    :func:`~gpyreg_tpu.ops.linalg.quad_logdet` primitive, whose custom
    VJP produces the analytic ``0.5*(G^{-1} - alpha alpha^T)`` cotangent
    on the MXU instead of the generic trsm-bound Cholesky adjoint.
    """
    N = X.shape[0]
    K, sn2_vec, r, _, log_jac = assemble(spec, hyp, X, y, s2, n_real)
    quad, logdet_half, mult = quad_logdet(K, sn2_vec, r)
    if n_real is None:
        n_eff = N
    else:
        n_pad = N - n_real
        logdet_half = logdet_half - 0.5 * n_pad * jnp.log(mult)
        n_eff = n_real
    return 0.5 * quad + logdet_half + 0.5 * n_eff * _LOG_2PI - log_jac


def nlz_chain(spec: ModelSpec, hyp, X, y, s2, n_real=None):
    """Forward-only NLML with a minimal live-buffer schedule for
    chain-batched MCMC evaluation (``fit(options={"n_chains": B})``).

    Same value as :func:`nlz` — bit-identical when the first
    factorization succeeds, identical multiplier/attempt semantics on
    retry (reference gaussian_process.py:2413-2421) — but scheduled so
    far fewer live (B, N, N) buffers exist under vmap:

    - the jitter-escalation body REBUILDS the masked kernel matrix from
      ``hyp`` (~6.9 ms at N=16384 vs a ~69 ms factorization) instead of
      carrying K across the loop, so K is dead after attempt 0;
    - no ``lax.cond`` wrapper around the retry loop (under vmap the
      cond lowers to a select that keeps BOTH branches' (B, N, N)
      outputs live);
    - NaN detection reads only the factor DIAGONAL (a failed pivot
      always lands NaN on the diagonal and poisons every later one;
      ``cov_matrix`` emits a symmetric K so strict-upper-only NaNs
      cannot occur).

    The general path (:func:`nlz` via ``quad_logdet``) held ~5 live
    copies of the (B, N, N) array — the round-4 compile-time OOM log
    measured 41.03 GB at B=8, N=16384 f32, capping chain parallelism
    at B=2 on a 16 GB chip (BASELINE.md round-4; VERDICT r4 #2).
    No gradient path: MCMC needs values only (grads go through
    :func:`nlz`'s fused ``quad_logdet`` VJP).
    """
    N = X.shape[0]
    hyp_t = jnp.asarray(hyp).astype(X.dtype)
    hyp_cov = spec.split_hyp(hyp_t)[0]
    mask = None
    if n_real is not None:
        mask = (jnp.arange(N) < n_real).astype(X.dtype)
    K0, sn2_vec, r, _, log_jac = assemble(spec, hyp, X, y, s2, n_real)

    def _L_of(mult, Kin):
        G = Kin + mult * sn2_vec * jnp.eye(N, dtype=Kin.dtype)
        return jax.lax.linalg.cholesky(G, symmetrize_input=False)

    L0 = _L_of(jnp.asarray(1.0, dtype=X.dtype), K0)

    def cond(carry):
        _, L, i = carry
        return jnp.logical_and(
            jnp.any(jnp.isnan(jnp.diagonal(L))), i < CHOL_MAX_TRIES
        )

    def body(carry):
        mult, _, i = carry
        mult_new = mult * 10.0
        L_new = _L_of(mult_new, _cov_masked(spec, hyp_cov, X, mask))
        return mult_new, L_new, i + 1

    mult, L, _ = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(1.0, dtype=X.dtype),
            L0,
            jnp.asarray(1, dtype=jnp.int32),
        ),
    )
    alpha = chol_solve(L, r)
    quad = jnp.sum(r * alpha)
    logdet_half = jnp.sum(jnp.log(jnp.diagonal(L)))
    if n_real is None:
        n_eff = N
    else:
        n_pad = N - n_real
        logdet_half = logdet_half - 0.5 * n_pad * jnp.log(mult)
        n_eff = n_real
    return 0.5 * quad + logdet_half + 0.5 * n_eff * _LOG_2PI - log_jac


def nlz_design(spec: ModelSpec, hyp, X, y, s2, n_real=None):
    """Single-attempt NLML for design RANKING (space-filling phase).

    Under vmap, the jitter-escalation while_loop steps every batch lane
    until the worst lane converges: one hopeless candidate in a
    1024-wide design makes the whole batch pay up to CHOL_MAX_TRIES
    batched factorizations (measured 200 vs 40 ms at N=100/B=1024 on
    v5e).  For ranking, a candidate whose kernel cannot factor at the
    nominal noise is a bad start regardless of its escalated value —
    return +inf and sort it last (the reference evaluates escalated
    values, gaussian_process.py:2413-2421; only the ordering among
    near-degenerate candidates can differ)."""
    N = X.shape[0]
    K, sn2_vec, r, _, log_jac = assemble(spec, hyp, X, y, s2, n_real)
    G = K + sn2_vec * jnp.eye(N, dtype=K.dtype)
    # G is symmetric by construction: skip XLA's defensive O(N^2)
    # input symmetrization per candidate (cf. ops/linalg._chol_of).
    L = jax.lax.linalg.cholesky(G, symmetrize_input=False)
    alpha = chol_solve(L, r)
    n_eff = N if n_real is None else n_real
    val = (
        0.5 * jnp.sum(r * alpha)
        + jnp.sum(jnp.log(jnp.diag(L)))
        + 0.5 * n_eff * _LOG_2PI
        - log_jac
    )
    return jnp.where(jnp.isnan(val), jnp.inf, val)


def posterior_factors(spec: ModelSpec, hyp, X, y, s2, n_real=None):
    """Device part of Posterior construction.

    Returns (alpha, L_G_lower, mult, sn2_min).  The host converts these to
    the reference's stored-factor convention (upper Cholesky of the scaled
    matrix, or explicit negative inverse) based on the concrete
    ``sn2_min >= 1e-6`` flag — reference gaussian_process.py:2404-2448.
    With padding, sn2_min is computed over the real rows only; the
    factors' real block equals the unpadded factors exactly (block
    diagonality), so the host slices them back to the true size.
    """
    sn2_vec, _, L, mult, _, alpha, _ = gp_parts(
        spec, hyp, X, y, s2, n_real
    )
    if n_real is not None:
        big = jnp.asarray(jnp.finfo(X.dtype).max, dtype=X.dtype)
        mask = jnp.arange(X.shape[0]) < n_real
        sn2_min = jnp.min(jnp.where(mask, sn2_vec, big))
    else:
        sn2_min = jnp.min(sn2_vec)
    return alpha, L, mult, sn2_min


@lru_cache(maxsize=None)
def get_fns(
    spec: ModelSpec,
    has_s2: bool,
    has_prior: bool,
    padded: bool = False,
):
    """Jitted function bundle for a model family.

    All functions take ``(hyp, X, y[, s2][, n_real][, pack])`` — the
    optional arguments present iff the corresponding flag.  Returns:
      nlz / nlz_grad                 -> scalar nlZ (no prior)
      obj / obj_grad / obj_batch / obj_grad_batch  -> nlZ - log_prior
      obj_raw / log_post_raw         -> unjitted, identity-stable
      post / post_batch              -> posterior factors
    """

    def _split(args):
        X, y = args[0], args[1]
        i = 2
        s2 = None
        n_real = None
        pack = None
        if has_s2:
            s2 = args[i]
            i += 1
        if padded:
            n_real = args[i]
            i += 1
        if has_prior and i < len(args):
            # Posterior-factor calls omit the prior pack (it does not
            # enter the factors); objective calls include it.
            pack = args[i]
            i += 1
        return X, y, s2, n_real, pack

    def _obj(hyp, *args):
        X, y, s2, n_real, pack = _split(args)
        v = nlz(spec, hyp, X, y, s2, n_real)
        if pack is not None:
            v = v - log_prior(pack, hyp)
        return v

    def _nlz(hyp, *args):
        X, y, s2, n_real, _ = _split(args)
        return nlz(spec, hyp, X, y, s2, n_real)

    def _post(hyp, *args):
        X, y, s2, n_real, _ = _split(args)
        return posterior_factors(spec, hyp, X, y, s2, n_real)

    def _obj_design(hyp, *args):
        X, y, s2, n_real, pack = _split(args)
        v = nlz_design(spec, hyp, X, y, s2, n_real)
        if pack is not None:
            v = v - log_prior(pack, hyp)
        return v

    def _log_post_raw(hyp, *args):
        """Positive (unnormalized) log posterior for MCMC samplers.

        Unjitted on purpose: identity-stable (this bundle is lru_cached
        per spec), so the device slice sampler's jit cache keys on it and
        warm-started refits (reference gaussian_process.py:1076-1078) hit
        the compile cache.
        """
        return -_obj(hyp, *args)

    def _log_post_chain_raw(hyp, *args):
        """Identity-stable log posterior on the memory-lean
        :func:`nlz_chain` schedule — the gradient-free samplers' eval
        (same value as ``log_post_raw``; ~3 instead of ~5 live
        (B, N, N) buffers when vmapped over chains/walkers)."""
        X, y, s2, n_real, pack = _split(args)
        v = nlz_chain(spec, hyp, X, y, s2, n_real)
        if pack is not None:
            v = v - log_prior(pack, hyp)
        return -v

    def _log_prior_raw(hyp, *args):
        """Log hyperprior alone (for samplers reporting per-sample
        log-prior values, reference slice_sample.py:281-284).  Takes the
        same ``(hyp, *obj_args)`` signature as every bundle function;
        identity-stable like log_post_raw."""
        _, _, _, _, pack = _split(args)
        if pack is None:
            return jnp.zeros((), dtype=hyp.dtype)
        return log_prior(pack, hyp)

    obj_grad = jax.value_and_grad(_obj)
    n_extra = 2 + int(has_s2) + int(padded) + int(has_prior)
    in_axes = (0,) + (None,) * n_extra
    n_post_extra = 2 + int(has_s2) + int(padded)
    post_axes = (0,) + (None,) * n_post_extra
    return {
        "log_post_raw": _log_post_raw,
        "log_post_chain_raw": _log_post_chain_raw,
        "log_prior_raw": _log_prior_raw,
        "obj_raw": _obj,
        "obj_design_raw": _obj_design,
        "nlz": jax.jit(_nlz),
        "nlz_grad": jax.jit(jax.value_and_grad(_nlz)),
        "obj": jax.jit(_obj),
        "obj_grad": jax.jit(obj_grad),
        "obj_batch": jax.jit(jax.vmap(_obj, in_axes=in_axes)),
        "obj_grad_batch": jax.jit(jax.vmap(obj_grad, in_axes=in_axes)),
        "post": jax.jit(_post),
        "post_batch": jax.jit(jax.vmap(_post, in_axes=post_axes)),
    }
