"""Device rank-1 posterior updates.

Implements the reference's O(N^2) single-point posterior update
(reference gaussian_process.py:737-844) as one jitted program per
(model spec, parametrization), batched over the hyperparameter samples
with ``vmap`` and operating IN PLACE on the bucket-padded device
factors:

- The new point's row/column is written into the padding region at
  index ``n`` (the current number of real rows) with ``.at[]`` dynamic
  updates, so the factor arrays never change shape and the compiled
  program is reused for every update within a shape bucket.
- No factor ever crosses the device->host boundary (the reference
  version, and the round-1 port, pulled the (N, N) factor to the host
  per sample per update — ~100 s/GB through a remote-TPU tunnel).

Math (high-noise Cholesky parametrization; L is the upper factor of
the sn2-scaled matrix): with k* the cross-covariance against the new
point and c = L^-T k*,

    sqrt_arg = sn2_eff^2 + k(x*,x*) sn2_eff - c^T c
    L'       = [[L, c/sn2_eff], [0, sqrt(sqrt_arg)/sn2_eff]]

``sqrt_arg <= 0`` flags numerical instability; the caller falls back to
a full recompute for that sample (reference :784-798).  Low-noise
explicit-negative-inverse parametrization: with u = -L k* (which equals
(K + sigma^2 I)^{-1} k*) and v = -u / v*,

    L' = [[L + v u^T, -v], [-v^T, -1/v*]]

Both parametrizations append 1/sqrt(sn2_eff) to sW and update

    alpha' = [alpha; 0] + (m* - y*)/v* * [u; -1].

Padding invariants (see core/nlml.py): alpha and k* are zero on padded
rows and the factors are block-diagonal there, so every triangular
solve / matvec above leaves the padding untouched and the updated real
block is exactly the unpadded update.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .model import ModelSpec, cov_matrix, mean_value


@lru_cache(maxsize=None)
def get_rank1_fns(spec: ModelSpec):
    """Jitted batched rank-1 updaters for a model family.

    Each function takes ``(hyps (S,h), alphas (S,Np,1), Ls (S,Np,Np),
    sWs (S,Np,1), X_pad (Np,D), n (traced int), x_new (1,D),
    y_new (scalar), sn2_effs (S,))`` and returns ``(L' (S,Np,Np),
    alpha' (S,Np,1), sW' (S,Np,1), ok (S,))``.

    The per-sample predictive mean/variance at the new point (with
    observation noise; reference gaussian_process.py:756) is computed
    INSIDE the program from the same cross-covariance — the round-1/2
    code paid a separate ``predict`` dispatch (a full remote round
    trip) per update just to obtain these two scalars.
    """

    def _common(hyp, X, n, x_new):
        dtype = X.dtype
        hyp_cov, _, hyp_mean = spec.split_hyp(hyp.astype(dtype))
        ar = jnp.arange(X.shape[0])
        mask = (ar < n).astype(dtype)
        e_n = (ar == n).astype(dtype)
        k_star = cov_matrix(spec, hyp_cov, X, Z=x_new)[:, 0] * mask
        k_new = cov_matrix(spec, hyp_cov, x_new, diag=True)[0]
        m_star = mean_value(spec, hyp_mean, x_new)[0]
        return mask, e_n, k_star, k_new, m_star

    def _append(alpha, sW, e_n, mask, upd, delta, sn2_eff):
        alpha_new = alpha[:, 0] + delta * (upd * mask - e_n)
        sW_new = sW[:, 0] * (1.0 - e_n) + e_n / jnp.sqrt(sn2_eff)
        return alpha_new[:, None], sW_new[:, None]

    def chol_one(hyp, alpha, L, sW, X, n, x_new, y_new, sn2_eff):
        dtype = X.dtype
        mask, e_n, k_star, k_new, m_star = _common(hyp, X, n, x_new)
        # Predictive moments at x_new (chol parametrization, mirrors
        # _predict_fns.chol_branch + observation noise).
        m_pred = m_star + jnp.sum(k_star * alpha[:, 0])
        Vc = solve_triangular(
            L, (sW[:, 0] * k_star)[:, None], lower=False, trans=1
        )[:, 0]
        v_pred = jnp.maximum(k_new - jnp.sum(Vc * Vc), 0.0) + sn2_eff

        c = solve_triangular(L, k_star[:, None], lower=False, trans=1)[:, 0]
        sqrt_arg = sn2_eff**2 + k_new * sn2_eff - jnp.sum(c * c)
        ok = sqrt_arg > 0
        safe = jnp.maximum(sqrt_arg, jnp.asarray(jnp.finfo(dtype).tiny, dtype))
        col = (c / sn2_eff) * mask + e_n * (jnp.sqrt(safe) / sn2_eff)
        L_new = L.at[:, n].set(col)
        upd = (
            solve_triangular(L, c[:, None], lower=False, trans=0)[:, 0]
            / sn2_eff
        )
        delta = (m_pred - y_new) / v_pred
        alpha_new, sW_new = _append(alpha, sW, e_n, mask, upd, delta, sn2_eff)
        return L_new, alpha_new, sW_new, ok

    def inv_one(hyp, alpha, L, sW, X, n, x_new, y_new, sn2_eff):
        dtype = X.dtype
        mask, e_n, k_star, k_new, m_star = _common(hyp, X, n, x_new)
        Lk = jnp.matmul(L, k_star[:, None])[:, 0]
        # Predictive moments (explicit-negative-inverse parametrization,
        # mirrors _predict_fns.inv_branch + observation noise).
        m_pred = m_star + jnp.sum(k_star * alpha[:, 0])
        v_pred = (
            jnp.maximum(k_new + jnp.sum(k_star * Lk), 0.0) + sn2_eff
        )
        # Stability guard the reference LACKS on this branch (it checks
        # sqrt_arg only on the Cholesky path, :784-798): v* comes from a
        # catastrophic cancellation (k_new + k*'(-G^-1)k*), so below
        # ~sqrt(eps) of the kernel scale it carries at most half the
        # dtype's digits and the -1/v* pivot and (m*-y*)/v* residual
        # scale poison the factor (and every downstream quad/predict)
        # with garbage-magnitude values.  Flag it and let the caller
        # fall back to a full recompute, like the Cholesky branch.
        eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
        floor = jnp.sqrt(eps) * (k_new + sn2_eff + eps)
        ok = v_pred > floor
        v_safe = jnp.maximum(v_pred, floor)
        upd = -Lk
        v = -upd / v_safe
        L_new = L + jnp.outer(v, upd)
        L_new = L_new.at[:, n].set(-v)
        L_new = L_new.at[n, :].set(-v)
        L_new = L_new.at[n, n].set(-1.0 / v_safe)
        delta = (m_pred - y_new) / v_safe
        alpha_new, sW_new = _append(alpha, sW, e_n, mask, upd, delta, sn2_eff)
        return L_new, alpha_new, sW_new, ok

    def mixed_one(flag, hyp, alpha, L, sW, X, n, x_new, y_new, sn2_eff):
        """Both parametrization branches in one program, where-selected
        per sample — mixed-parametrization posteriors otherwise cost a
        second dispatch+pull round trip per update."""
        Lc, ac, sc, okc = chol_one(
            hyp, alpha, L, sW, X, n, x_new, y_new, sn2_eff
        )
        Li, ai, si, oki = inv_one(
            hyp, alpha, L, sW, X, n, x_new, y_new, sn2_eff
        )
        return (
            jnp.where(flag, Lc, Li),
            jnp.where(flag, ac, ai),
            jnp.where(flag, sc, si),
            jnp.where(flag, okc, oki),
        )

    axes = (0, 0, 0, 0, None, None, None, None, 0)
    return {
        "chol": jax.jit(jax.vmap(chol_one, in_axes=axes)),
        "inv": jax.jit(jax.vmap(inv_one, in_axes=axes)),
        "mixed": jax.jit(jax.vmap(mixed_one, in_axes=(0,) + axes)),
    }
