"""Matrix-free iterative GP inference (conjugate gradients).

Beyond-reference capability for N past the single-chip Cholesky limit
(the reference materializes the full N x N kernel in RAM,
covariance_functions.py:165; a 65k^2 f32 kernel alone is 17 GB).  The
kernel matrix is never materialized: matvecs stream MXU-sized row
panels — build K[rows, :] for one panel, multiply, discard — so the
live working set is O(row_chunk * N) while the math stays exact GP
inference up to CG tolerance.  This is the matrix-free half of the
BBMM/iterative-GP approach (Gardner et al. 2018, arXiv:1809.11165;
Lin et al. 2024, arXiv:2405.18457) mapped to TPU: each panel is one
(chunk, D) x (D, N) distance matmul plus a (chunk, N) x (N, B) product,
both on the systolic array.

Provided: CG solves against (K + sn2 I), posterior weights (alpha),
and predictive mean/variance.  The marginal-likelihood value itself
(log-determinant estimation) stays on the Cholesky path — fit at
Cholesky-feasible N, then serve predictions at any N here.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..core.model import ModelSpec, cov_matrix, mean_value, noise_variance


def _panel_matvec(spec: ModelSpec, hyp_cov, X, V, sn2_vec, row_chunk):
    """(K + diag(sn2)) @ V without materializing K.

    X: (N, D) with N a multiple of row_chunk; V: (N, B).
    One lax.map step builds a (row_chunk, N) kernel panel and contracts
    it with V on the MXU.
    """
    N = X.shape[0]
    n_panels = N // row_chunk
    X_panels = X.reshape(n_panels, row_chunk, -1)

    def panel(Xp):
        Kp = cov_matrix(spec, hyp_cov, Xp, Z=X)  # (chunk, N)
        return jnp.matmul(Kp, V, precision=lax.Precision.HIGHEST)

    out = lax.map(panel, X_panels)  # (n_panels, chunk, B)
    out = out.reshape(N, -1)
    return out + sn2_vec[:, None] * V


def _cg(matvec, B, tol, max_iter):
    """Batched conjugate gradients: solve A X = B for PSD A.

    B: (N, nrhs).  Runs until every column's relative residual drops
    below tol or max_iter; columns that converge early are frozen.
    """
    X0 = jnp.zeros_like(B)
    R0 = B
    P0 = B
    b_norm2 = jnp.sum(B * B, axis=0)
    rs0 = jnp.sum(R0 * R0, axis=0)

    def cond(c):
        X, R, P, rs, i = c
        return jnp.logical_and(
            i < max_iter,
            jnp.any(rs > (tol**2) * jnp.maximum(b_norm2, 1e-30)),
        )

    def body(c):
        X, R, P, rs, i = c
        AP = matvec(P)
        denom = jnp.sum(P * AP, axis=0)
        active = rs > (tol**2) * jnp.maximum(b_norm2, 1e-30)
        alpha = jnp.where(
            active, rs / jnp.where(denom > 0, denom, 1.0), 0.0
        )
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        rs_new = jnp.sum(R * R, axis=0)
        beta = jnp.where(active, rs_new / jnp.where(rs > 0, rs, 1.0), 0.0)
        P = R + beta[None, :] * P
        return X, R, P, rs_new, i + 1

    X, R, _, rs, iters = lax.while_loop(cond, body, (X0, R0, P0, rs0, 0))
    return X, jnp.sqrt(rs / jnp.maximum(b_norm2, 1e-30)), iters


def _pad_rows(X, row_chunk):
    N = X.shape[0]
    Np = -(-N // row_chunk) * row_chunk
    if Np == N:
        return X, N
    return (
        jnp.concatenate(
            [X, jnp.broadcast_to(X[-1:], (Np - N,) + X.shape[1:])]
        ),
        N,
    )


@partial(
    jax.jit,
    static_argnames=("spec", "row_chunk", "max_iter"),
)
def cg_posterior_weights(
    spec: ModelSpec,
    hyp,
    X,
    y,
    s2,
    tol=1e-6,
    row_chunk: int = 1024,
    max_iter: int = 1000,
):
    """alpha = (K + sn2 I)^{-1} (y - m) via matrix-free CG.

    X must have N divisible by row_chunk (pad upstream; cg_predict
    handles padding).  Returns (alpha (N,1), rel_residual, iters).
    """
    N = X.shape[0]
    hyp = jnp.asarray(hyp).astype(X.dtype)
    hyp_cov, hyp_noise, hyp_mean = spec.split_hyp(hyp)
    sn2 = noise_variance(spec, hyp_noise, y, s2, X.dtype)
    sn2_vec = jnp.broadcast_to(jnp.reshape(sn2, (-1,)), (N,))
    m = mean_value(spec, hyp_mean, X)[:, None]
    r = y - m

    mv = lambda V: _panel_matvec(spec, hyp_cov, X, V, sn2_vec, row_chunk)
    alpha, res, iters = _cg(mv, r, tol, max_iter)
    return alpha, res, iters


def cg_predict(
    spec: ModelSpec,
    hyp,
    X,
    y,
    s2,
    xs,
    compute_var: bool = False,
    tol: float = 1e-6,
    row_chunk: int = 1024,
    test_chunk: int = 1024,
    max_iter: int = 1000,
):
    """Exact-GP prediction with a never-materialized kernel matrix.

    Mean: m(xs) + K(X, xs)^T alpha with alpha from CG.
    Variance: kss - K(X,xs)^T (K + sn2 I)^{-1} K(X,xs), the per-column
    solves batched through the same matrix-free CG, chunked over test
    points.

    Host-facing: accepts numpy, returns numpy (mu (M,1), s2 (M,1) or
    None, info dict).  Accuracy is CG-tolerance-limited; at tol=1e-6 it
    matches the Cholesky path to ~1e-5 relative (see
    tests/test_iterative.py).
    """
    dtype = jnp.asarray(X).dtype
    Xj = jnp.asarray(X)
    yj = jnp.asarray(y, dtype=dtype)
    s2j = None if s2 is None else jnp.asarray(s2, dtype=dtype)
    hyp = jnp.asarray(hyp).astype(dtype)
    M = xs.shape[0]

    # Pad N to the panel size (padded rows duplicate the last row; their
    # alpha entries are solved but unused: cross-covariances below are
    # computed against the TRUE X only).
    Xp, N_true = _pad_rows(Xj, row_chunk)
    if Xp.shape[0] != N_true:
        pad = Xp.shape[0] - N_true
        yj = jnp.concatenate([yj, jnp.zeros((pad, 1), dtype)])
        if s2j is not None:
            s2j = jnp.concatenate([s2j, jnp.ones((pad, 1), dtype)])
    # NOTE: padding duplicates rows, making K singular without noise —
    # but CG solves (K + sn2 I), and the padded residual (y - m) rows
    # are the only contamination.  Zero them exactly:
    mask = (jnp.arange(Xp.shape[0]) < N_true).astype(dtype)

    hyp_cov, hyp_noise, hyp_mean = spec.split_hyp(hyp)
    sn2 = noise_variance(spec, hyp_noise, yj, s2j, dtype)
    sn2_vec = jnp.broadcast_to(jnp.reshape(sn2, (-1,)), (Xp.shape[0],))
    sn2_vec = jnp.where(mask > 0, sn2_vec, 1.0)

    m_train = mean_value(spec, hyp_mean, Xp)[:, None]
    r = (yj - m_train) * mask[:, None]

    def mv(V):
        out = _panel_matvec(
            spec,
            hyp_cov,
            Xp,
            V * mask[:, None],
            jnp.zeros_like(sn2_vec),
            row_chunk,
        )
        return out * mask[:, None] + sn2_vec[:, None] * V

    solve = jax.jit(lambda b: _cg(mv, b, tol, max_iter))
    alpha, res_a, it_a = solve(r)

    info = {"alpha_rel_residual": float(jnp.max(res_a)),
            "alpha_iters": int(it_a)}

    mu_parts, var_parts = [], []
    xsj = jnp.asarray(xs, dtype=dtype)
    for start in range(0, M, test_chunk):
        xs_c = xsj[start : start + test_chunk]
        Ks = cov_matrix(spec, hyp_cov, Xp, Z=xs_c) * mask[:, None]
        m_star = mean_value(spec, hyp_mean, xs_c)[:, None]
        mu_parts.append(np.asarray(m_star + Ks.T @ alpha))
        if compute_var:
            V, res_v, _ = solve(Ks)
            info["var_rel_residual"] = max(
                info.get("var_rel_residual", 0.0), float(jnp.max(res_v))
            )
            kss = cov_matrix(spec, hyp_cov, xs_c, diag=True)[:, None]
            var_parts.append(
                np.asarray(kss - jnp.sum(Ks * V, axis=0)[:, None])
            )

    mu = np.concatenate(mu_parts)
    var = np.concatenate(var_parts) if compute_var else None
    if var is not None:
        var = np.maximum(var, 0.0)
    return mu, var, info
