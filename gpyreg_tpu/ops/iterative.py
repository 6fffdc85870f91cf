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
predictive mean/variance, and — completing the BBMM training story —
a stochastic-Lanczos-quadrature log-determinant plus a Hutchinson
trace-estimator NLML gradient (``cg_nlml``), so FITTING also works past
the Cholesky N limit (Gardner et al. 2018 §2.2; Ubaru/Chen/Saad 2017).
"""

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..core.model import ModelSpec, cov_matrix, mean_value, noise_variance


def _cross_pallas_ok(spec: ModelSpec, X):
    """Gate for the fused Pallas CROSS-panel build inside the CG/SLQ
    matvec (f32 TPU, every kernel family in the Pallas zoo).

    The matrix-free tier's cost is overwhelmingly kernel-panel
    REBUILDS — dozens of CG iterations and Lanczos steps per NLML
    evaluation, each one full pass over the implicit N x N operator.
    None of those passes are ever differentiated (the Hutchinson
    gradient flows only through the single `surrogate` matvec in
    `_cg_nlml_impl`, which keeps the XLA build), so the forward-only
    one-pass Pallas tile (ops/pallas_kernels.kernel_cross_pallas,
    no custom VJP needed) serves them: it skips the materialized
    (chunk, N) distance matrix and its extra HBM round trips.
    """
    import os

    if X.dtype != jnp.float32:
        return False
    if os.environ.get("GPYREG_TPU_NO_FUSED_KERNEL"):
        return False
    iso = spec.cov.endswith("_iso")
    base = spec.cov[:-4] if iso else spec.cov
    if base not in ("se", "m1", "m3", "m5", "rq"):
        return False
    if X.shape[1] >= 128:
        return False
    from .pallas_kernels import INTERPRET

    return bool(INTERPRET) or jax.default_backend() == "tpu"


def _panel_matvec(
    spec: ModelSpec, hyp_cov, X, V, sn2_vec, row_chunk, pallas=False
):
    """(K + diag(sn2)) @ V without materializing K.

    X: (N, D) with N a multiple of row_chunk; V: (N, B).
    One lax.map step builds a (row_chunk, N) kernel panel and contracts
    it with V on the MXU.  ``pallas`` selects the one-pass fused panel
    build (forward-only — see :func:`_cross_pallas_ok`).
    """
    N = X.shape[0]
    n_panels = N // row_chunk
    X_panels = X.reshape(n_panels, row_chunk, -1)

    def panel(Xp):
        if pallas:
            from .pallas_kernels import kernel_matrix_pallas

            Kp = kernel_matrix_pallas(spec.cov, hyp_cov, Xp, Z=X)
        else:
            Kp = cov_matrix(spec, hyp_cov, Xp, Z=X)  # (chunk, N)
        return jnp.matmul(Kp, V, precision=lax.Precision.HIGHEST)

    # Rematerialize each panel under autodiff: without this, reverse
    # mode through the lax.map saves every (chunk, N) kernel panel —
    # the full N x N matrix this module exists to avoid (17 GB at 65k).
    out = lax.map(jax.checkpoint(panel), X_panels)  # (n_panels, chunk, B)
    out = out.reshape(N, -1)
    return out + sn2_vec[:, None] * V


def _cg(matvec, B, tol, max_iter, precond=None, x0=None):
    """Batched (preconditioned) conjugate gradients: solve A X = B.

    B: (N, nrhs).  Runs until every column's relative residual drops
    below tol or max_iter; columns that converge early are frozen.
    ``precond``: optional M^{-1} apply (the PCG preconditioner).
    ``x0``: optional initial guess (N, nrhs) — warm starting from a
    nearby solve's solution (Lin et al. 2024, arXiv:2405.18457 §3:
    successive hyperparameter steps change the system slowly, so the
    previous solutions start CG far down its convergence curve).  The
    stopping criterion stays RELATIVE TO ||B|| (not the initial
    residual), so warm and cold starts solve to the same accuracy.
    """
    if precond is None:
        precond = lambda v: v
    if x0 is None:
        X0 = jnp.zeros_like(B)
        R0 = B
    else:
        X0 = x0
        R0 = B - matvec(x0)
    Z0 = precond(R0)
    P0 = Z0
    b_norm2 = jnp.sum(B * B, axis=0)
    rz0 = jnp.sum(R0 * Z0, axis=0)
    rs0 = jnp.sum(R0 * R0, axis=0)

    def cond(c):
        X, R, P, rz, rs, i = c
        return jnp.logical_and(
            i < max_iter,
            jnp.any(rs > (tol**2) * jnp.maximum(b_norm2, 1e-30)),
        )

    def body(c):
        X, R, P, rz, rs, i = c
        AP = matvec(P)
        denom = jnp.sum(P * AP, axis=0)
        active = rs > (tol**2) * jnp.maximum(b_norm2, 1e-30)
        alpha = jnp.where(
            active, rz / jnp.where(denom > 0, denom, 1.0), 0.0
        )
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        Z = precond(R)
        rz_new = jnp.sum(R * Z, axis=0)
        rs_new = jnp.sum(R * R, axis=0)
        beta = jnp.where(active, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        P = Z + beta[None, :] * P
        return X, R, P, rz_new, rs_new, i + 1

    X, R, _, _, rs, iters = lax.while_loop(
        cond, body, (X0, R0, P0, rz0, rs0, 0)
    )
    return X, jnp.sqrt(rs / jnp.maximum(b_norm2, 1e-30)), iters


def pivoted_cholesky(spec: ModelSpec, hyp_cov, X, rank: int, mask=None):
    """Partial pivoted Cholesky of the kernel matrix, matrix-free.

    Greedy diagonal pivoting builds a rank-``rank`` factor Lk with
    K ~= Lk Lk^T using only ``rank`` kernel COLUMNS (each an O(N D)
    cross-covariance build) — the BBMM preconditioner construction
    (Gardner et al. 2018, arXiv:1809.11165 §3.2; Harbrecht et al. 2012).

    Returns Lk of shape (N, rank).
    """
    N = X.shape[0]
    kss = cov_matrix(spec, hyp_cov, X, diag=True)  # (N,)
    if mask is not None:
        kss = kss * mask
    Lk0 = jnp.zeros((N, rank), dtype=X.dtype)

    def body(j, carry):
        Lk, d = carry
        i = jnp.argmax(d)
        # Column i of K (built on the fly).
        xi = lax.dynamic_slice_in_dim(X, i, 1, axis=0)
        col = cov_matrix(spec, hyp_cov, X, Z=xi)[:, 0]  # (N,)
        li = lax.dynamic_slice_in_dim(Lk, i, 1, axis=0)[0]  # (rank,)
        col = col - Lk @ li
        piv = jnp.sqrt(jnp.maximum(d[i], jnp.finfo(X.dtype).tiny))
        newcol = col / piv
        if mask is not None:
            newcol = newcol * mask
        # Zero out already-processed contributions' numerical noise at
        # the pivot itself is unnecessary; update the Schur diagonal.
        Lk = lax.dynamic_update_slice(
            Lk, newcol[:, None], (0, j)
        )
        d = jnp.maximum(d - newcol**2, 0.0)
        d = d.at[i].set(0.0)
        return Lk, d

    Lk, _ = lax.fori_loop(0, rank, body, (Lk0, kss))
    return Lk


def woodbury_preconditioner(Lk, sn2_vec):
    """M^{-1} apply for M = Lk Lk^T + diag(sn2) via Woodbury.

    M^{-1} v = D^{-1} v - D^{-1} Lk (I_k + Lk^T D^{-1} Lk)^{-1} Lk^T D^{-1} v
    with D = diag(sn2).  The k x k core is Cholesky-factorized once.
    """
    Dinv = 1.0 / sn2_vec[:, None]  # (N, 1)
    DiL = Lk * Dinv  # (N, k)
    k = Lk.shape[1]
    core = jnp.eye(k, dtype=Lk.dtype) + jnp.matmul(
        Lk.T, DiL, precision=lax.Precision.HIGHEST
    )
    C = jnp.linalg.cholesky(core)

    def apply(v):
        Div = v * Dinv
        t = jnp.matmul(Lk.T, Div, precision=lax.Precision.HIGHEST)
        from jax.scipy.linalg import solve_triangular

        t = solve_triangular(C, t, lower=True)
        t = solve_triangular(C, t, lower=True, trans=1)
        return Div - jnp.matmul(
            DiL, t, precision=lax.Precision.HIGHEST
        )

    return apply


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


def _pad_panel_batch(Xj, yj, s2j, row_chunk):
    """Mask-pad ``(X, y[, s2])`` to a whole number of ``row_chunk``
    panels — the ONE construction every matrix-free entry point shares.

    Padded rows duplicate the last X row and carry ``y = 0``,
    ``s2 = 1``; with the ``n_real`` row mask applied by the panel
    matvec the padded operator is block-diagonal ``[[A, 0], [0, I]]``,
    so the quadratic term (zero padded residual), the log-determinant
    (log 1 = 0 per padded row) and the trace estimator are all exact.
    Returns ``(Xp, yp, s2p, n_real)``; ``n_real`` is ``None`` when no
    padding was needed (shapes are trace-static, so callers branch on
    it in Python).
    """
    Xp, N = _pad_rows(Xj, row_chunk)
    if Xp.shape[0] == N:
        return Xj, yj, s2j, None
    pad = Xp.shape[0] - N
    dtype = Xj.dtype
    yp = jnp.concatenate([yj, jnp.zeros((pad, 1), dtype)])
    s2p = (
        None
        if s2j is None
        else jnp.concatenate([s2j, jnp.ones((pad, 1), dtype)])
    )
    return Xp, yp, s2p, jnp.asarray(N, dtype=jnp.int32)


def lanczos_tridiag(matvec, Z, n_steps: int):
    """Batched Lanczos tridiagonalization with full reorthogonalization.

    ``Z``: (N, P) starting block (each column an independent probe).
    Runs ``n_steps`` three-term recurrences per probe — one batched
    matvec per step — and returns the tridiagonal coefficients
    (alphas (steps, P), betas (steps-1, P)).  Full reorthogonalization
    against the stored basis keeps the Ritz values usable in float32.
    """
    N, P = Z.shape
    norms = jnp.sqrt(jnp.sum(Z * Z, axis=0))
    Q0 = Z / norms[None, :]
    basis = jnp.zeros((n_steps, N, P), dtype=Z.dtype)
    basis = basis.at[0].set(Q0)

    def body(carry, j):
        basis, q_prev, q, beta_prev = carry
        w = matvec(q)
        alpha = jnp.sum(q * w, axis=0)
        w = w - alpha[None, :] * q - beta_prev[None, :] * q_prev
        # Reorthogonalize against every stored vector (two passes of
        # classical Gram-Schmidt are overkill; one suffices with f32
        # probes at the accuracies SLQ needs).
        coeffs = jnp.einsum("knp,np->kp", basis, w)
        w = w - jnp.einsum("knp,kp->np", basis, coeffs)
        beta = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=0), 0.0))
        safe = jnp.where(beta > 0, beta, 1.0)
        q_next = jnp.where(beta[None, :] > 0, w / safe[None, :], 0.0)
        # The final iteration's write lands on the last row after its
        # only use — harmless; rows not yet written are zero, so the
        # reorthogonalization above ignores them.
        basis = basis.at[jnp.minimum(j + 1, n_steps - 1)].set(q_next)
        return (basis, q, q_next, beta), (alpha, beta)

    (_, _, _, _), (alphas, betas) = lax.scan(
        body,
        (basis, jnp.zeros_like(Q0), Q0, jnp.zeros(P, dtype=Z.dtype)),
        jnp.arange(n_steps),
    )
    return alphas, betas[:-1]


def slq_logdet(matvec, N: int, key, dtype, n_probes: int = 8,
               n_lanczos: int = 32, probes=None):
    """log det(A) by stochastic Lanczos quadrature.

    ``matvec`` applies the SPD operator A to an (N, P) block.  Rademacher
    probes; each probe's Gauss quadrature uses the eigen-decomposition of
    its Lanczos tridiagonal: logdet ~= (N/P) sum_i sum_k tau_ik^2
    log(theta_ik) with tau the first eigenvector components.

    ``probes`` supplies an explicit (N, n_probes) probe block —
    _cg_nlml_impl shares one block between its Hutchinson solves and
    this quadrature (same-key re-draws would silently decouple if this
    function's internal draw ever changed).
    """
    if probes is not None:
        Z = probes
    else:
        Z = jax.random.rademacher(key, (N, n_probes), dtype=dtype)
    alphas, betas = lanczos_tridiag(matvec, Z, n_lanczos)

    def one(al, be):
        T = (
            jnp.diag(al)
            + jnp.diag(be, 1)
            + jnp.diag(be, -1)
        )
        theta, V = jnp.linalg.eigh(T)
        tau2 = V[0, :] ** 2
        theta = jnp.maximum(theta, jnp.finfo(dtype).tiny)
        return jnp.sum(tau2 * jnp.log(theta))

    quads = jax.vmap(one, in_axes=(1, 1))(alphas, betas)
    return (N / n_probes) * jnp.sum(quads)


def cg_nlml(
    spec: ModelSpec,
    hyp,
    X,
    y,
    s2=None,
    key=None,
    compute_grad: bool = False,
    tol: float = 1e-5,
    row_chunk: int = 1024,
    max_iter: int = 500,
    n_probes: int = 8,
    n_lanczos: int = 32,
    sol0=None,
    return_sol: bool = False,
):
    """Estimated negative log marginal likelihood (and gradient) with a
    never-materialized kernel matrix — the BBMM training objective:

    - quadratic term 0.5 r^T alpha with alpha from matrix-free CG;
    - 0.5 logdet by stochastic Lanczos quadrature (``slq_logdet``);
    - gradient from the exact identity dnlZ = 0.5 tr((A^{-1} - aa^T) dA)
      - dm^T a, with tr(A^{-1} dA) replaced by the Hutchinson estimator
      (1/P) sum_i u_i^T dA z_i, u_i = A^{-1} z_i from the same CG batch.
      The directional kernel derivatives come from autodiff of a
      stop-gradient surrogate, never from materialized dK.

    Fixed ``key`` => deterministic objective (common random numbers), so
    a quasi-Newton optimizer can run on it.  Host-facing; returns float
    (and a numpy gradient).  Accuracy: ~0.1% relative on the logdet at
    the defaults (see tests/test_iterative.py).

    ``return_sol=True`` additionally returns the device-resident CG
    solution block (padded (N', 1+P)) and the iteration count; pass it
    back as ``sol0`` on the next call to warm-start the solves across
    optimizer steps (Lin et al. 2024, arXiv:2405.18457) — the probes
    are common random numbers, so successive solves differ only by the
    hyperparameter step and the previous solutions start CG far down
    its convergence curve.  The solution never leaves the device.
    """
    if key is None:
        key = jax.random.key(0)
    Xj = jnp.asarray(X)
    dtype = Xj.dtype
    N = Xj.shape[0]
    # Mask-padded rows make any N work with a fixed panel size (see
    # _pad_panel_batch for the exactness argument).
    row_chunk = int(min(row_chunk, N))
    yj = jnp.asarray(y, dtype=dtype)
    s2j = None if s2 is None else jnp.asarray(s2, dtype=dtype)
    Xj, yj, s2j, n_real = _pad_panel_batch(Xj, yj, s2j, row_chunk)
    fn = _cg_nlml_fn(spec, bool(compute_grad), int(row_chunk),
                     int(max_iter), int(n_probes), int(n_lanczos),
                     s2 is not None, n_real is not None,
                     carry_sol=bool(return_sol))
    args = [jnp.asarray(hyp), Xj, yj,
            key, jnp.asarray(tol, dtype=dtype)]
    if s2j is not None:
        args.append(s2j)
    if n_real is not None:
        args.append(n_real)
    if return_sol and sol0 is None:
        # Zeros init keeps the first call on the SAME compiled program
        # as every warm call (one extra matvec: R0 = B - A@0 = B).
        sol0 = jnp.zeros((Xj.shape[0], 1 + n_probes), dtype=dtype)
    out = fn(*args, sol0=sol0)
    if return_sol:
        if compute_grad:
            nlml, grad, sol, iters = out
            return float(nlml), np.asarray(grad), sol, iters
        nlml, sol, iters = out
        return float(nlml), sol, iters
    if compute_grad:
        return float(out[0]), np.asarray(out[1])
    return float(out)


@partial(jax.jit, static_argnames=("spec", "compute_grad", "row_chunk",
                                   "max_iter", "n_probes", "n_lanczos",
                                   "has_s2", "has_mask", "carry_sol"))
def _cg_nlml_impl(spec, compute_grad, row_chunk, max_iter, n_probes,
                  n_lanczos, has_s2, has_mask, hyp, X, y, key, tol,
                  s2=None, n_real=None, carry_sol=False, sol0=None):
    N = X.shape[0]
    dtype = X.dtype
    hyp = jnp.asarray(hyp).astype(dtype)
    if has_mask:
        # Mask-padded rows: the effective operator is block-diagonal
        # [[A, 0], [0, I]] — zero padded residual (quadratic term),
        # log 1 = 0 per padded row (logdet), and the Hutchinson /
        # SLQ estimators stay exact (tr log [[A,0],[0,I]] = tr log A).
        mask = (jnp.arange(N) < n_real).astype(dtype)
        n_eff = n_real.astype(dtype)
    else:
        mask = None
        n_eff = N

    def parts(h):
        hyp_cov, hyp_noise, hyp_mean = spec.split_hyp(h)
        sn2 = noise_variance(spec, hyp_noise, y, s2, dtype)
        sn2_vec = jnp.broadcast_to(jnp.reshape(sn2, (-1,)), (N,))
        m = mean_value(spec, hyp_mean, X)[:, None]
        if mask is not None:
            sn2_vec = jnp.where(mask > 0, sn2_vec, 1.0)
            m = m * mask[:, None] + y * (1.0 - mask[:, None])
        return hyp_cov, sn2_vec, m

    def make_mv(hyp_cov_h, sn2_h, pallas=False):
        if mask is None:
            return lambda V: _panel_matvec(
                spec, hyp_cov_h, X, V, sn2_h, row_chunk, pallas=pallas
            )

        def mv_masked(V):
            out = _panel_matvec(
                spec,
                hyp_cov_h,
                X,
                V * mask[:, None],
                jnp.zeros_like(sn2_h),
                row_chunk,
                pallas=pallas,
            )
            return out * mask[:, None] + sn2_h[:, None] * V

        return mv_masked

    hyp_cov, sn2_vec, m = parts(hyp)
    r = y - m
    # The CG iterations + SLQ Lanczos passes below are forward-only:
    # the fused Pallas panel build serves them (the `surrogate` matvec
    # — the ONE differentiated pass — keeps the XLA build).
    mv = make_mv(hyp_cov, sn2_vec, pallas=_cross_pallas_ok(spec, X))

    # Shared CG batch: [r | probes]; u = A^{-1} z reused by the gradient.
    Z = jax.random.rademacher(key, (N, n_probes), dtype=dtype)
    B = jnp.concatenate([r, Z], axis=1)
    sol, _, cg_iters = _cg(
        mv, B, tol, max_iter, x0=sol0 if carry_sol else None
    )
    alpha, U = sol[:, :1], sol[:, 1:]

    logdet = slq_logdet(mv, N, key, dtype, n_probes, n_lanczos, probes=Z)
    nlml = (
        0.5 * jnp.sum(r * alpha)
        + 0.5 * logdet
        + 0.5 * n_eff * jnp.log(2.0 * jnp.pi)
    )
    if not compute_grad:
        if carry_sol:
            return nlml, sol, cg_iters
        return nlml

    # Surrogate whose autodiff gradient equals the estimator:
    #   psi(h) = r(h)^T sg(alpha) - 0.5 sg(alpha)^T A(h) sg(alpha)
    #   phi(h) = 0.5/P sum_i sg(u_i)^T A(h) sg(z_i)
    alpha_c = lax.stop_gradient(alpha)
    U_c = lax.stop_gradient(U)
    Z_c = lax.stop_gradient(Z)

    def surrogate(h):
        hyp_cov_h, sn2_h, m_h = parts(h)
        mv_h = make_mv(hyp_cov_h, sn2_h)
        r_h = y - m_h
        A_cols = mv_h(jnp.concatenate([alpha_c, Z_c], axis=1))
        A_alpha, A_Z = A_cols[:, :1], A_cols[:, 1:]
        psi = jnp.sum(r_h * alpha_c) - 0.5 * jnp.sum(alpha_c * A_alpha)
        phi = 0.5 / n_probes * jnp.sum(U_c * A_Z)
        return psi + phi

    grad = jax.grad(surrogate)(hyp)
    if carry_sol:
        return nlml, grad, sol, cg_iters
    return nlml, grad


@lru_cache(maxsize=None)
def _cg_nlml_fn(spec, compute_grad, row_chunk, max_iter, n_probes,
                n_lanczos, has_s2, has_mask=False, carry_sol=False):
    def run(hyp, X, y, key, tol, *rest, sol0=None):
        rest = list(rest)
        n_real = rest.pop() if has_mask else None
        s2 = rest[0] if rest else None
        return _cg_nlml_impl(spec, compute_grad, row_chunk, max_iter,
                             n_probes, n_lanczos, has_s2, has_mask, hyp,
                             X, y, key, tol, s2, n_real,
                             carry_sol=carry_sol, sol0=sol0)

    return run


@lru_cache(maxsize=None)
def cg_log_post_raw(
    spec: ModelSpec,
    tol: float,
    row_chunk: int,
    max_iter: int,
    n_probes: int,
    n_lanczos: int,
    has_s2: bool,
    has_prior: bool,
):
    """Identity-stable raw callables for MCMC on the matrix-free NLML:
    ``(log_post, log_prior)``, each taking
    ``(hyp, X, y[, s2][, prior_pack], probe_key)``.

    The probe key travels as an ARGUMENT and the caller passes ONE
    frozen key for the whole chain (common random numbers): the chain
    then targets a DETERMINISTIC fixed-probe surrogate of the
    hyperposterior whose log-density error is the SLQ/Hutchinson
    estimator error (<1% NLML error at defaults,
    tests/test_iterative.py) — the determinant-free fully-Bayesian GP
    construction (cf. arXiv:2412.20884), which neither the reference
    nor the MATLAB oracle offers at any N.  lru-cached so warm refits
    reuse the chain's compiled programs (the device samplers key their
    jit caches on the callable's identity)."""
    from ..core.priors import log_prior as _log_prior

    def _split(args):
        X, y = args[0], args[1]
        i = 2
        s2 = None
        if has_s2:
            s2 = args[i]
            i += 1
        pack = None
        if has_prior:
            pack = args[i]
            i += 1
        key = args[i]
        return X, y, s2, pack, key

    def log_post(hyp, *args):
        X, y, s2, pack, key = _split(args)
        Xj = jnp.asarray(X)
        dtype = Xj.dtype
        N = Xj.shape[0]
        # Mask-pad to a whole number of row panels (the shared
        # construction of the cg_nlml host wrapper).
        rc = int(min(row_chunk, N))
        yj = jnp.asarray(y, dtype=dtype)
        s2j = None if s2 is None else jnp.asarray(s2, dtype=dtype)
        Xj, yj, s2j, n_real = _pad_panel_batch(Xj, yj, s2j, rc)
        nl = _cg_nlml_impl(
            spec, False, rc, max_iter, n_probes, n_lanczos,
            has_s2, n_real is not None, hyp, Xj, yj, key,
            jnp.asarray(tol, dtype=dtype), s2=s2j, n_real=n_real,
        )
        v = -nl
        if pack is not None:
            v = v + _log_prior(pack, hyp)
        return v

    def prior_only(hyp, *args):
        _, _, _, pack, _ = _split(args)
        if pack is None:
            return jnp.zeros((), dtype=jnp.asarray(hyp).dtype)
        return _log_prior(pack, hyp)

    return log_post, prior_only


def fit_cg(
    spec: ModelSpec,
    X,
    y,
    s2=None,
    hyp0=None,
    LB=None,
    UB=None,
    key=None,
    tol: float = 1e-4,
    cg_tol: float = 1e-5,
    row_chunk: int = 1024,
    max_iter: int = 500,
    n_probes: int = 8,
    n_lanczos: int = 32,
    max_opt_iter: int = 100,
    ftol: float = 1e-9,
    warm_start: bool = True,
):
    """MAP hyperparameter fit past the Cholesky N limit.

    Bounded L-BFGS-B over the stochastic BBMM objective (``cg_nlml``)
    with common random numbers (one fixed probe ``key``), so the
    optimizer sees a smooth deterministic surface.  Per iteration: one
    device program = batched CG solve [r | probes] + SLQ logdet +
    Hutchinson gradient; the kernel matrix is never materialized, so
    N is bounded by O(row_chunk * N) workspace, not O(N^2).

    ``warm_start`` (default on) carries each evaluation's CG solution
    block device-resident into the next evaluation's initial guess
    (Lin et al. 2024, arXiv:2405.18457): the probes are fixed and
    L-BFGS steps move the system slowly, so most solves start far down
    the convergence curve.  Solves still run to the same relative
    tolerance — the objective values are unchanged up to ``cg_tol``;
    only the iteration count drops.  Per-evaluation CG iteration
    counts are attached to the result as ``res.cg_iters``.

    ``tol`` maps to L-BFGS-B's gradient tolerance; ``ftol`` (kept at
    scipy's tight default scale) governs the relative-decrease stop —
    looser values let the optimizer quit on the flat plateaus far from
    the optimum where early relative progress is slow.

    Returns (hyp (h,), scipy OptimizeResult).
    """
    import scipy.optimize as spo

    if key is None:
        key = jax.random.key(0)
    if hyp0 is None:
        raise ValueError("fit_cg requires an initial hyperparameter vector")
    hyp0 = np.asarray(hyp0, dtype=np.float64).ravel()

    state = {"sol": None}
    iter_counts = []  # device scalars; ONE packed pull at the end

    def fg(h):
        if warm_start:
            v, g, sol, iters = cg_nlml(
                spec, h, X, y, s2, key=key, compute_grad=True,
                tol=cg_tol, row_chunk=row_chunk, max_iter=max_iter,
                n_probes=n_probes, n_lanczos=n_lanczos,
                sol0=state["sol"], return_sol=True,
            )
            state["sol"] = sol
            iter_counts.append(iters)
            return v, g
        return cg_nlml(
            spec,
            h,
            X,
            y,
            s2,
            key=key,
            compute_grad=True,
            tol=cg_tol,
            row_chunk=row_chunk,
            max_iter=max_iter,
            n_probes=n_probes,
            n_lanczos=n_lanczos,
        )

    bounds = None
    if LB is not None or UB is not None:
        LB = np.full_like(hyp0, -np.inf) if LB is None else np.asarray(LB)
        UB = np.full_like(hyp0, np.inf) if UB is None else np.asarray(UB)
        bounds = list(zip(LB, UB))
    res = spo.minimize(
        fg,
        hyp0,
        jac=True,
        bounds=bounds,
        method="L-BFGS-B",
        options={"maxiter": max_opt_iter, "ftol": ftol, "gtol": tol},
    )
    if iter_counts:
        res.cg_iters = np.asarray(jnp.stack(iter_counts))
    return res.x, res


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

    mv = lambda V: _panel_matvec(
        spec, hyp_cov, X, V, sn2_vec, row_chunk,
        pallas=_cross_pallas_ok(spec, X),
    )
    alpha, res, iters = _cg(mv, r, tol, max_iter)
    return alpha, res, iters


@lru_cache(maxsize=None)
def _cg_solve_fn(spec: ModelSpec, row_chunk: int, max_iter: int,
                 use_precond: bool):
    """Compiled masked-CG solve against (K + sn2 I), identity-stable
    across calls (one program per (spec, row_chunk, rhs-shape)); the
    serving path dispatches it on every predict."""

    @jax.jit
    def solve(hyp_cov, Xp, b, sn2_vec, mask, tol, Lk):
        def mv(V):
            out = _panel_matvec(
                spec,
                hyp_cov,
                Xp,
                V * mask[:, None],
                jnp.zeros_like(sn2_vec),
                row_chunk,
                pallas=_cross_pallas_ok(spec, Xp),
            )
            return out * mask[:, None] + sn2_vec[:, None] * V

        precond = (
            woodbury_preconditioner(Lk, sn2_vec) if use_precond else None
        )
        return _cg(mv, b, tol, max_iter, precond)

    return solve


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
    precond_rank: int = 0,
    alpha0=None,
):
    """Exact-GP prediction with a never-materialized kernel matrix.

    ``precond_rank`` > 0 enables the BBMM pivoted-Cholesky/Woodbury
    preconditioner: it cuts CG iterations by 2x+ when the kernel
    spectrum is dominated by a few modes (smooth kernels, long
    lengthscales, low effective dimension) and is roughly neutral when
    the spectrum is already flat (high-D data with short lengthscales —
    measured neutral at D=10 random data, >2x on 2-D long-lengthscale
    problems); leave at 0 for flat-spectrum problems.

    Mean: m(xs) + K(X, xs)^T alpha with alpha from CG.
    Variance: kss - K(X,xs)^T (K + sn2 I)^{-1} K(X,xs), the per-column
    solves batched through the same matrix-free CG, chunked over test
    points.

    Host-facing: accepts numpy, returns numpy (mu (M,1), s2 (M,1) or
    None, info dict).  Accuracy is CG-tolerance-limited; at tol=1e-6 it
    matches the Cholesky path to ~1e-5 relative (see
    tests/test_iterative.py).

    ``alpha0``: a previously-computed padded weight vector (the
    ``info["alpha"]`` of an earlier call at the same hyp/data) — skips
    the alpha CG solve, so repeat serving pays only the per-test-chunk
    work.  ``info["alpha"]`` always carries the (device-resident)
    padded weights for this reuse.
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
    N_true = Xj.shape[0]
    Xp, yj, s2j, _ = _pad_panel_batch(Xj, yj, s2j, row_chunk)
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

    if precond_rank > 0:
        # BBMM-style pivoted-Cholesky preconditioner: a rank-k kernel
        # sketch + Woodbury inverse collapses the spectrum's top modes.
        Lk = pivoted_cholesky(spec, hyp_cov, Xp, precond_rank, mask)
    else:
        Lk = jnp.zeros((1, 1), dtype)  # unused traced arg (DCE'd)

    # Identity-stable compiled solve (lru-cached per spec/shape): a
    # fresh `jax.jit(lambda ...)` here would retrace the N-scale CG
    # while_loop on EVERY predict call — the warm serving path must
    # reuse the compiled program (CLAUDE.md: no fresh jit lambdas).
    solve_fn = _cg_solve_fn(
        spec, int(row_chunk), int(max_iter), precond_rank > 0
    )
    tol_t = jnp.asarray(tol, dtype)

    def solve(b):
        return solve_fn(hyp_cov, Xp, b, sn2_vec, mask, tol_t, Lk)
    if alpha0 is not None:
        alpha = jnp.asarray(alpha0, dtype=dtype)
        info = {"alpha_reused": True}
    else:
        alpha, res_a, it_a = solve(r)
        info = {"alpha_rel_residual": float(jnp.max(res_a)),
                "alpha_iters": int(it_a)}
    info["alpha"] = alpha

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
