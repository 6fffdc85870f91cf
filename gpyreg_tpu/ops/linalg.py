"""Linear-algebra primitives for the exact-GP core.

The centerpiece is :func:`jittered_cholesky`, a custom-VJP primitive that
reproduces the reference's Cholesky jitter-escalation retry loop
(reference gaussian_process.py:2413-2421, 2430-2438: up to 10 attempts,
noise multiplier x10 per failed attempt) *inside* jit.  XLA's Cholesky
emits NaNs instead of raising on an indefinite matrix, which lets the
retry run as a masked ``lax.while_loop``.  The custom VJP treats the found
multiplier as a constant — exactly the semantics of the reference's
hand-derived gradients, which are evaluated at the successful multiplier —
and costs a single Cholesky per NLML evaluation in the common case.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from .._config import CHOL_MAX_TRIES


def _chol_of(K, sn2_vec, mult):
    """Lower Cholesky factor of G(mult) = K + mult * diag(sn2)."""
    N = K.shape[-1]
    G = K + mult * sn2_vec * jnp.eye(N, dtype=K.dtype)
    return jnp.linalg.cholesky(G)


@jax.custom_vjp
def jittered_cholesky(K, sn2_vec):
    """Factorize ``G(m) = K + m*diag(sn2)`` for the smallest working m.

    m runs over {1, 10, ..., 10**9} (CHOL_MAX_TRIES attempts).  Returns
    ``(L, m)`` with ``L`` the *lower* Cholesky factor of G(m).  If every
    attempt fails, L is all-NaN (callers detect and treat as +inf
    objective, or raise on the host — reference raises LinAlgError,
    gaussian_process.py:2450-2453).

    Differentiable in K and sn2_vec (m is treated as a constant).
    Safe under vmap: the escalation loop is masked per-sample.
    """
    # Single Cholesky instance in the graph (the loop body): iteration 0
    # factors G(1); each retry multiplies the noise by 10.  Keeping one
    # cholesky call (instead of one outside + one inside the loop) halves
    # the compile time of the dominant op at large N.
    def cond(carry):
        mult, L, i = carry
        return jnp.logical_and(
            jnp.logical_or(i == 0, jnp.any(jnp.isnan(L))),
            i < CHOL_MAX_TRIES,
        )

    def body(carry):
        mult, L, i = carry
        mult_new = jnp.where(i == 0, mult, mult * 10.0)
        L_new = _chol_of(K, sn2_vec, mult_new)
        return mult_new, L_new, i + 1

    mult, L, _ = lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(1.0, dtype=K.dtype),
            jnp.full_like(K, jnp.nan),
            jnp.asarray(0, dtype=jnp.int32),
        ),
    )
    return L, mult


def _cholesky_vjp_core(L, L_bar):
    """Reverse-mode adjoint of A -> L = cholesky(A) (lower).

    A_bar = L^{-T} Phi(L^T L_bar) L^{-1}, symmetrized, where Phi takes the
    lower triangle with the diagonal halved.
    """
    P = jnp.tril(jnp.matmul(L.T, L_bar, precision=lax.Precision.HIGHEST))
    P = P - 0.5 * jnp.diag(jnp.diag(P))
    # X = L^{-T} P
    X = solve_triangular(L, P, lower=True, trans=1)
    # A_bar_raw = X L^{-1} = (L^{-T} X^T)^T
    A_bar = solve_triangular(L, X.T, lower=True, trans=1).T
    return 0.5 * (A_bar + A_bar.T)


def _jittered_cholesky_fwd(K, sn2_vec):
    L, mult = jittered_cholesky(K, sn2_vec)
    return (L, mult), (L, mult)


def _jittered_cholesky_bwd(res, cotangents):
    L, mult = res
    L_bar, _mult_bar = cotangents  # mult is piecewise constant: no gradient
    # Replace NaN cotangent/factor combinations gracefully: if the factor
    # itself is NaN (total failure) the gradient is NaN anyway.
    A_bar = _cholesky_vjp_core(L, L_bar)
    K_bar = A_bar
    sn2_bar = mult * jnp.diag(A_bar)
    return K_bar, sn2_bar


jittered_cholesky.defvjp(_jittered_cholesky_fwd, _jittered_cholesky_bwd)


def chol_solve(L, b):
    """Solve (L L^T) x = b given a lower Cholesky factor."""
    return solve_triangular(
        L, solve_triangular(L, b, lower=True, trans=0), lower=True, trans=1
    )


@partial(jax.jit, static_argnames=("max_rhs",))
def neg_inverse_from_chol(L, max_rhs: int = 512):
    """-(L L^T)^{-1} from a lower Cholesky factor.

    Used for the reference's low-noise explicit-inverse parametrization
    (gaussian_process.py:2440-2448) and the fast_predict path.

    The solve runs over COLUMN CHUNKS of the identity, written in place
    into one output buffer inside a fori_loop: XLA's blocked triangular
    solve materializes one live update slice per ROW block of the solve
    (~n_row_blocks * N * rhs_width elements), so a single (N, N) solve at
    N=16k wants ~59 GB of HLO temps and even a 2048-wide chunk ~7 GB;
    512-wide chunks keep the live set under ~2 GB on top of L + out.
    """
    N = L.shape[-1]
    if N <= max_rhs:
        eye = jnp.eye(N, dtype=L.dtype)
        return -chol_solve(L, eye)
    n_chunks = -(-N // max_rhs)
    rows = jnp.arange(N, dtype=jnp.int32)[:, None]

    def body(i, out):
        start = i * max_rhs
        cols = start + jnp.arange(max_rhs, dtype=jnp.int32)[None, :]
        eye_block = (rows == cols).astype(L.dtype)
        blk = -chol_solve(L, eye_block)
        return lax.dynamic_update_slice(out, blk, (0, start))

    out = jnp.zeros((N, n_chunks * max_rhs), dtype=L.dtype)
    out = lax.fori_loop(0, n_chunks, body, out)
    return out[:, :N]


@partial(jax.jit, static_argnames=("lower",))
def robust_cholesky(sigma, lower=False):
    """Cholesky-like factor T with T^T T = sigma, eigh fallback.

    Mirrors reference __robust_cholesky (gaussian_process.py:2331-2355):
    on an indefinite matrix, eigendecompose, drop tiny eigenvalues, and if
    negative eigenvalues remain return zeros.  Returns an upper-triangular
    factor on success (scipy convention of the reference); the fallback
    returns a non-triangular square root with the same contract.
    """
    Lc = jnp.linalg.cholesky(sigma)  # lower
    ok = jnp.logical_not(jnp.any(jnp.isnan(Lc)))

    def _fallback(_):
        S = 0.5 * (sigma + sigma.T)
        w, U = jnp.linalg.eigh(S)
        # Sign-fix columns by their largest-|.| entry (reference parity).
        maxidx = jnp.argmax(jnp.abs(U), axis=0)
        signs = jnp.sign(U[maxidx, jnp.arange(U.shape[1])])
        signs = jnp.where(signs == 0, 1.0, signs)
        U = U * signs[None, :]
        tol = jnp.abs(jnp.finfo(sigma.dtype).eps * jnp.max(w)) * sigma.shape[0]
        keep = jnp.abs(w) > tol
        any_negative = jnp.any(jnp.logical_and(keep, w < 0))
        w_safe = jnp.where(keep, jnp.maximum(w, 0.0), 0.0)
        T = jnp.sqrt(w_safe)[:, None] * U.T
        return jnp.where(any_negative, jnp.zeros_like(T), T)

    T = lax.cond(ok, lambda _: Lc.T, _fallback, operand=None)
    return T.T if lower else T
