"""Device serving programs: prediction / quadrature / random-function
factories shared by the GP shell (split out of gp.py, round 5 — the
serving programs are pure module-level jitted factories keyed on
ModelSpec and need none of the GP object state).

Reference semantics: prediction gaussian_process.py:1663-1816 /
predict_full :1561-1661, quadrature :1818-1981, random functions
:2241-2329.  See each factory's docstring for the TPU-first design
(packed single-pull outputs, on-device chunk loops, MXU pre-inverted
factors, mesh-sharded variants).
"""


import numpy as np

import jax
import jax.numpy as jnp

from .core.model import ModelSpec, cov_matrix, mean_value
from .ops.linalg import neg_inverse_from_chol, robust_cholesky

from functools import lru_cache
from jax.scipy.linalg import solve_triangular as _jsolve_tri

# MXU serving-path auto-gate (see GP.mxu_predict): below these the
# one-time ~N^3/3 triangular inversion doesn't amortize over the test
# points (estimated breakeven ~400 points at N=16k), and small-N trsm
# is latency-floor-bound anyway.
_MXU_PREDICT_MIN_N = 8192
_MXU_PREDICT_MIN_M = 1024


@lru_cache(maxsize=None)
def _predict_chunked_fn(
    spec: ModelSpec, flag: bool, chunk: int, pallas=False, mxu=False
):
    """Single-sample prediction over MANY test points with the chunk
    loop on DEVICE (lax.map): one dispatch per posterior sample instead
    of one per (sample, chunk) — the per-call latency of a remote-TPU
    tunnel (~0.1 s) otherwise dominates large-M prediction.

    ``mxu`` (Cholesky parametrization only): invert the triangular
    factor ONCE per dispatch (``ops.linalg.tri_inv`` — divide-and-
    conquer MXU matmuls) and serve every chunk's whitened
    cross-covariance as a dense matmul instead of a triangular solve.
    XLA's trsm is the chip's slowest primitive (~4.7 effective TFLOP/s,
    sequential row-block substitution — the round-2 serving-study
    roofline), while the MXU runs dense matmuls an order of magnitude
    faster; the one-time ~N^3/3 inversion amortizes over the M test
    points.  The padded factor's pad block is exact identity (zero
    masked K rows + unit sn2, core/nlml.assemble), so the inverse's
    real block equals the unpadded inverse and padded V rows stay
    harmless in the variance sum."""
    pfns = _predict_fns(spec, pallas)
    one = pfns[
        ("chol_mxu" if flag and mxu else "chol" if flag else "inv")
        + "_one_raw"
    ]

    def chunked(hyp, alpha, L, sW, X, n_real, xs_padded):
        if flag and mxu:
            from .ops.linalg import tri_inv

            # (L_upper^T)^{-1}, lower triangular: V = Wl @ (sW * Ks)
            # replaces solve_triangular(L, ., trans=1) exactly.
            L = tri_inv(jnp.swapaxes(L, -1, -2))
        n_chunks = xs_padded.shape[0] // chunk
        xs_r = xs_padded.reshape(n_chunks, chunk, xs_padded.shape[1])

        def body(xs_c):
            return one(hyp, alpha, L, sW, X, n_real, xs_c)

        mu, s2 = jax.lax.map(body, xs_r)
        # One packed output -> one device->host transfer (fixed tunnel
        # latency per pull; see _predict_fns._packed_multi).
        return jnp.stack([mu.reshape(-1), s2.reshape(-1)])

    return jax.jit(chunked)


@lru_cache(maxsize=None)
def _predict_sharded_fn(
    spec: ModelSpec, flag: bool, mesh, pallas: bool = False, mxu=False
):
    """Single-sample prediction with the TEST-POINT axis sharded over a
    device mesh (the sequence-parallel analog for GP serving, SURVEY.md
    section 2.3): each device holds the full padded posterior factors —
    the factors the GP actually stores — and computes the predictive
    moments of its own slab of test points.  Zero per-point collectives;
    one program, one packed pull."""
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    pfns = _predict_fns(spec, pallas)
    one = pfns[
        ("chol_mxu" if flag and mxu else "chol" if flag else "inv")
        + "_one_raw"
    ]

    def local(hyp, alpha, L, sW, X, n_real, xs_local):
        if flag and mxu:
            from .ops.linalg import tri_inv

            # Each device inverts the replicated factor itself (same
            # wall-clock as one device + a broadcast; no collective).
            L = tri_inv(jnp.swapaxes(L, -1, -2))
        mu, s2 = one(hyp, alpha, L, sW, X, n_real, xs_local)
        return jnp.stack([mu, s2])

    repl = P()
    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(repl,) * 6 + (P("batch", None),),
        out_specs=P(None, "batch"),
    )
    return jax.jit(sharded)


# ----------------------------------------------------------------------
# Batched posterior finalization.  One host sync for the whole sample
# batch (the per-sample scalars), factor transforms batched at the
# PADDED shape so the compiled programs are reused across the growing-N
# refit loop (a sliced-to-true-N transform would recompile per refit —
# a multi-second remote-compile stall on the tunnel toolchain).
# ----------------------------------------------------------------------


@jax.jit
def _post_small(alphas, mults, sn2mins):
    """Bundle of per-sample scalars the host needs, in ONE transfer:
    rows [sn2_mult, sn2_min, any-NaN flag]."""
    bad = jnp.any(jnp.isnan(alphas), axis=(1, 2))
    f64 = jnp.float64
    return jnp.stack(
        [
            mults.astype(f64),
            sn2mins.astype(f64),
            bad.astype(f64),
        ]
    )


@jax.jit
def _scaled_upper_batch(Ls, sls):
    """Upper Cholesky factors of the sn2-scaled matrices, batched
    (reference stores chol(K/sl + I) upper, gaussian_process.py:2413)."""
    sls = sls.astype(Ls.dtype)
    return jnp.transpose(Ls, (0, 2, 1)) / jnp.sqrt(sls)[:, None, None]


@jax.jit
def _neg_inverse_batch(Ls):
    """Batched -(L L^T)^{-1} (reference's low-noise explicit-inverse
    parametrization, gaussian_process.py:2440-2448)."""
    return jax.vmap(neg_inverse_from_chol)(Ls)


@jax.jit
def _sw_batch(Ls, sn2mins, mults):
    """sW column vectors (1/sqrt(min(sn2)*mult), constant per sample;
    reference gaussian_process.py:2514) at the padded shape."""
    vals = 1.0 / jnp.sqrt(sn2mins * mults)
    S, Np = Ls.shape[0], Ls.shape[1]
    return jnp.broadcast_to(
        vals.astype(Ls.dtype)[:, None, None], (S, Np, 1)
    )


@lru_cache(maxsize=None)
def _predict_fns(spec: ModelSpec, pallas: bool = False):
    """Jitted vmapped per-sample predictive mean/variance, one function
    per posterior parametrization (reference gaussian_process.py:1727-1767).

    Every data-conditioned branch takes ``(hyp, alpha, L, sW, X, n_real,
    xs)`` where ``X`` and the factors may be PADDED past ``n_real`` real
    rows (shape bucketing): the cross-covariance rows beyond ``n_real``
    are masked to zero, which — together with alpha's zero padding and
    L's (block-)diagonal padding — makes the padded result exactly equal
    the unpadded one while letting one compiled program serve every true
    N within a bucket.  ``n_real`` is traced (pass N for unpadded data).

    ``pallas`` swaps the cross-covariance build for the fused Pallas
    tile kernel (ops/pallas_kernels.py: distance matmul + kernel profile
    in one VMEM-resident pass, ~2x the XLA composition on large builds).
    Used on the gradient-free serving path only; float32.
    """

    def _masked_ks(hyp_cov, X, n_real, xs):
        if pallas:
            from .ops.pallas_kernels import kernel_matrix_pallas

            Ks = kernel_matrix_pallas(spec.cov, hyp_cov, X, Z=xs).astype(
                X.dtype
            )
        else:
            Ks = cov_matrix(spec, hyp_cov, X, Z=xs)
        mask = (jnp.arange(X.shape[0]) < n_real).astype(X.dtype)
        return Ks * mask[:, None]

    def chol_branch(hyp, alpha, L_upper, sW, X, n_real, xs):
        hyp = hyp.astype(X.dtype)
        hyp_cov, _, hyp_mean = spec.split_hyp(hyp)
        m_star = mean_value(spec, hyp_mean, xs)
        kss = cov_matrix(spec, hyp_cov, xs, diag=True)
        Ks = _masked_ks(hyp_cov, X, n_real, xs)
        mu = m_star + jnp.matmul(Ks.T, alpha)[:, 0]
        V = _jsolve_tri(L_upper, sW * Ks, lower=False, trans=1)
        s2 = kss - jnp.sum(V * V, axis=0)
        return mu, s2

    def chol_mxu_branch(hyp, alpha, Wl, sW, X, n_real, xs):
        """Cholesky-parametrization serving with a PRE-INVERTED factor:
        ``Wl = (L_upper^T)^{-1}`` (lower), so the whitened cross-
        covariance is a triangular-aware MXU matmul
        (ops.linalg.tri_lower_matmul, bf16x3 accumulation — the same
        precision the training adjoint's tri_inv products use) instead
        of XLA's slow trsm.  Mathematically identical to chol_branch;
        f32 rounding differs by ~cond(L)*eps (measured max |delta s2|
        vs the trsm path at N=16k: 2e-6 at HIGHEST, 2.5e-5 at bf16x3 —
        the 2.55x large-M throughput trade, benchmarks/mxu_serving.py)."""
        from .ops.linalg import tri_lower_matmul

        hyp = hyp.astype(X.dtype)
        hyp_cov, _, hyp_mean = spec.split_hyp(hyp)
        m_star = mean_value(spec, hyp_mean, xs)
        kss = cov_matrix(spec, hyp_cov, xs, diag=True)
        Ks = _masked_ks(hyp_cov, X, n_real, xs)
        mu = m_star + jnp.matmul(Ks.T, alpha)[:, 0]
        V = tri_lower_matmul(Wl, sW * Ks)
        s2 = kss - jnp.sum(V * V, axis=0)
        return mu, s2

    def inv_branch(hyp, alpha, L_neg_inv, sW, X, n_real, xs):
        hyp = hyp.astype(X.dtype)
        hyp_cov, _, hyp_mean = spec.split_hyp(hyp)
        m_star = mean_value(spec, hyp_mean, xs)
        kss = cov_matrix(spec, hyp_cov, xs, diag=True)
        Ks = _masked_ks(hyp_cov, X, n_real, xs)
        mu = m_star + jnp.matmul(Ks.T, alpha)[:, 0]
        s2 = kss + jnp.sum(Ks * jnp.matmul(L_neg_inv, Ks), axis=0)
        return mu, s2

    def chol_branch_full(hyp, alpha, L_upper, sW, X, n_real, xs):
        hyp = hyp.astype(X.dtype)
        hyp_cov, _, hyp_mean = spec.split_hyp(hyp)
        m_star = mean_value(spec, hyp_mean, xs)
        K_star = cov_matrix(spec, hyp_cov, xs)
        Ks = _masked_ks(hyp_cov, X, n_real, xs)
        mu = m_star + jnp.matmul(Ks.T, alpha)[:, 0]
        V = _jsolve_tri(L_upper, sW * Ks, lower=False, trans=1)
        C = K_star - jnp.matmul(V.T, V)
        return mu, 0.5 * (C + C.T)

    def inv_branch_full(hyp, alpha, L_neg_inv, sW, X, n_real, xs):
        hyp = hyp.astype(X.dtype)
        hyp_cov, _, hyp_mean = spec.split_hyp(hyp)
        m_star = mean_value(spec, hyp_mean, xs)
        K_star = cov_matrix(spec, hyp_cov, xs)
        Ks = _masked_ks(hyp_cov, X, n_real, xs)
        mu = m_star + jnp.matmul(Ks.T, alpha)[:, 0]
        C = K_star + jnp.matmul(Ks.T, jnp.matmul(L_neg_inv, Ks))
        return mu, 0.5 * (C + C.T)

    def prior_branch(hyp, xs):
        hyp = hyp.astype(xs.dtype)
        hyp_cov, _, hyp_mean = spec.split_hyp(hyp)
        m_star = mean_value(spec, hyp_mean, xs)
        kss = cov_matrix(spec, hyp_cov, xs, diag=True)
        return m_star, kss

    def prior_branch_full(hyp, xs):
        hyp = hyp.astype(xs.dtype)
        hyp_cov, _, hyp_mean = spec.split_hyp(hyp)
        m_star = mean_value(spec, hyp_mean, xs)
        K_star = cov_matrix(spec, hyp_cov, xs)
        return m_star, K_star

    vmap_axes = (0, 0, 0, 0, None, None, None)

    def _packed_multi(branch, axes):
        """Vmapped branch with mean/variance stacked into ONE (2, s, M)
        output: the remote tunnel charges a fixed ~30 ms per transfer,
        so a single device->host pull halves the small-M predict
        latency (measured 71 -> 45 ms at s=8, M=2000)."""
        vm = jax.vmap(branch, in_axes=axes)

        def f(*args):
            mu, s2 = vm(*args)
            return jnp.stack([mu, s2])

        return jax.jit(f)

    def mixed_branch(flag, hyp, alpha, L, sW, X, n_real, xs):
        # Posterior samples whose parametrization differs (reference
        # L_chol split, gaussian_process.py:2404) share ONE program:
        # both branches are evaluated and `where`-selected per sample.
        # The duplicated compute is trivial next to the per-dispatch
        # latency a second group call would cost.
        mu_c, s2_c = chol_branch(hyp, alpha, L, sW, X, n_real, xs)
        mu_i, s2_i = inv_branch(hyp, alpha, L, sW, X, n_real, xs)
        return (
            jnp.where(flag, mu_c, mu_i),
            jnp.where(flag, s2_c, s2_i),
        )

    mixed_axes = (0,) + vmap_axes
    return {
        "chol": jax.jit(jax.vmap(chol_branch, in_axes=vmap_axes)),
        "inv": jax.jit(jax.vmap(inv_branch, in_axes=vmap_axes)),
        "chol_packed": _packed_multi(chol_branch, vmap_axes),
        "inv_packed": _packed_multi(inv_branch, vmap_axes),
        "mixed_packed": _packed_multi(mixed_branch, mixed_axes),
        "prior_packed": _packed_multi(prior_branch, (0, None)),
        "chol_full": jax.jit(jax.vmap(chol_branch_full, in_axes=vmap_axes)),
        "inv_full": jax.jit(jax.vmap(inv_branch_full, in_axes=vmap_axes)),
        "prior": jax.jit(jax.vmap(prior_branch, in_axes=(0, None))),
        "prior_full": jax.jit(jax.vmap(prior_branch_full, in_axes=(0, None))),
        # Un-vmapped variants for the large-N path, where stacking the
        # per-sample N x N factors would copy (and double) HBM use.
        "chol_one": jax.jit(chol_branch),
        "inv_one": jax.jit(inv_branch),
        "chol_full_one": jax.jit(chol_branch_full),
        "inv_full_one": jax.jit(inv_branch_full),
        # Raw (unjitted) versions for composition into the device-side
        # chunk loop (_predict_chunked_fn).
        "chol_one_raw": chol_branch,
        "chol_mxu_one_raw": chol_mxu_branch,
        "inv_one_raw": inv_branch,
    }


@lru_cache(maxsize=None)
def _random_fns(spec: ModelSpec):
    """Jitted single-sample GP function draws (reference
    gaussian_process.py:2241-2329): predictive mean + covariance at the
    query points, robust Cholesky (eigh fallback on indefinite C,
    ops/linalg.py:148), and the affine transform of the supplied
    standard-normal vector — all in ONE device program.  The host only
    draws the normal vector (keeping the reference's NumPy RNG
    contract) and picks the posterior sample."""

    def _finish(C, zr, f_mu):
        C = 0.5 * (C + C.T)
        T = robust_cholesky(C)
        return jnp.matmul(T.T, zr) + f_mu

    def chol_one(hyp, alpha, L_upper, sW, X, n_real, xs, zr):
        hyp = hyp.astype(X.dtype)
        hyp_cov, _, hyp_mean = spec.split_hyp(hyp)
        m_star = mean_value(spec, hyp_mean, xs)[:, None]
        K_star = cov_matrix(spec, hyp_cov, xs)
        Ks = cov_matrix(spec, hyp_cov, X, Z=xs)
        mask = (jnp.arange(X.shape[0]) < n_real).astype(X.dtype)
        Ks = Ks * mask[:, None]
        f_mu = m_star + jnp.matmul(Ks.T, alpha)
        V = _jsolve_tri(L_upper, sW * Ks, lower=False, trans=1)
        return _finish(K_star - jnp.matmul(V.T, V), zr, f_mu)

    def inv_one(hyp, alpha, L_neg_inv, sW, X, n_real, xs, zr):
        hyp = hyp.astype(X.dtype)
        hyp_cov, _, hyp_mean = spec.split_hyp(hyp)
        m_star = mean_value(spec, hyp_mean, xs)[:, None]
        K_star = cov_matrix(spec, hyp_cov, xs)
        Ks = cov_matrix(spec, hyp_cov, X, Z=xs)
        mask = (jnp.arange(X.shape[0]) < n_real).astype(X.dtype)
        Ks = Ks * mask[:, None]
        f_mu = m_star + jnp.matmul(Ks.T, alpha)
        C = K_star + jnp.matmul(Ks.T, jnp.matmul(L_neg_inv, Ks))
        return _finish(C, zr, f_mu)

    def prior_one(hyp, xs, zr):
        hyp = hyp.astype(xs.dtype)
        hyp_cov, _, hyp_mean = spec.split_hyp(hyp)
        f_mu = mean_value(spec, hyp_mean, xs)[:, None]
        K_star = cov_matrix(spec, hyp_cov, xs)
        eps = jnp.asarray(jnp.finfo(xs.dtype).eps, xs.dtype)
        C = K_star + eps * jnp.eye(xs.shape[0], dtype=xs.dtype)
        return _finish(C, zr, f_mu)

    return {
        "chol": jax.jit(chol_one),
        "inv": jax.jit(inv_one),
        "prior": jax.jit(prior_one),
    }


@lru_cache(maxsize=None)
def _quad_fns(spec: ModelSpec):
    """Jitted vmapped Bayesian-quadrature integrals, batched over the
    posterior samples (reference gaussian_process.py:1818-1981).

    TPU-first rebuild of the reference's host loop: one XLA dispatch per
    parametrization group instead of per-sample SciPy triangular solves,
    with the Gaussian-smoothed kernel integrals z built as one fused
    (M, N, D) broadcast and the padded training rows masked out of z (so
    the program is reused across the growing-N bucket, like predict).

    Entries: ``mean`` (hyp, alpha, X, n_real, mu, sigma) -> F (S, M) and
    ``chol_var`` / ``inv_var`` (hyp, alpha, L, mult, X, n_real, mu,
    sigma) -> (F, J_kk) with J_kk the per-sample integral variances.
    """
    D = spec.D
    cov_N, noise_N = spec.cov_N, spec.noise_N
    iso = spec.cov.endswith("_iso")

    def _z_and_mean(hyp, alpha, X, n_real, mu, sigma):
        dtype = X.dtype
        hyp = hyp.astype(dtype)
        if iso:
            # Single shared lengthscale (correct closed form; the
            # reference's quad silently misreads iso hyps for D > 1).
            ell = jnp.broadcast_to(jnp.exp(hyp[0]), (D,))
            ln_sf2 = 2.0 * hyp[1]
            sum_lnell = D * hyp[0]
        else:
            ell = jnp.exp(hyp[:D])
            ln_sf2 = 2.0 * hyp[D]
            sum_lnell = jnp.sum(hyp[:D])
        # Gaussian-smoothed SE kernel row integrals (the closed form
        # behind reference :1925-1936).
        tau = jnp.sqrt(sigma**2 + ell[None, :] ** 2)  # (M, D)
        lnnf = ln_sf2 + sum_lnell - jnp.sum(jnp.log(tau), axis=1)  # (M,)
        mask = (jnp.arange(X.shape[0]) < n_real).astype(dtype)
        d2 = jnp.sum(
            ((mu[:, None, :] - X[None, :, :]) / tau[:, None, :]) ** 2,
            axis=2,
        )
        z = jnp.exp(lnnf[:, None] - 0.5 * d2) * mask[None, :]  # (M, Np)
        if spec.mean == "zero":
            m0 = jnp.asarray(0.0, dtype=dtype)
        else:
            m0 = hyp[cov_N + noise_N]
        F = jnp.matmul(z, alpha)[:, 0] + m0
        if spec.mean == "negquad":
            lo = cov_N + noise_N + 1
            xm = hyp[lo : lo + D]
            omega = jnp.exp(hyp[lo + D : lo + 2 * D])
            # E[-(x - xm)^2 / (2 omega^2)] under N(mu, sigma^2), :1937-1946.
            nu_k = -0.5 * jnp.sum(
                (mu**2 + sigma**2 - 2.0 * mu * xm[None, :] + xm[None, :] ** 2)
                / omega[None, :] ** 2,
                axis=1,
            )
            F = F + nu_k
        return z, F, ell, ln_sf2, sum_lnell

    def mean_one(hyp, alpha, X, n_real, mu, sigma):
        _, F, _, _, _ = _z_and_mean(hyp, alpha, X, n_real, mu, sigma)
        return F

    def _var_tail(z, ell, ln_sf2, sum_lnell, sigma, invKzk, dtype):
        tau_kk = jnp.sqrt(2.0 * sigma**2 + ell[None, :] ** 2)
        nf_kk = jnp.exp(ln_sf2 + sum_lnell - jnp.sum(jnp.log(tau_kk), axis=1))
        J_kk = nf_kk - jnp.sum(z * invKzk.T, axis=1)
        return jnp.maximum(jnp.asarray(jnp.finfo(dtype).eps, dtype), J_kk)

    def chol_var_one(hyp, alpha, L, mult, X, n_real, mu, sigma):
        dtype = X.dtype
        z, F, ell, ln_sf2, sum_lnell = _z_and_mean(
            hyp, alpha, X, n_real, mu, sigma
        )
        # Reference :1922 uses the constant noise hyperparameter for the
        # scaled-factor solve.
        if spec.noise_constant:
            sn2 = jnp.exp(2.0 * hyp[cov_N].astype(dtype))
        else:
            sn2 = jnp.asarray(jnp.finfo(jnp.float64).eps, dtype=dtype)
        sn2_eff = sn2 * mult.astype(dtype)
        invKzk = (
            _jsolve_tri(
                L,
                _jsolve_tri(L, z.T, lower=False, trans=1),
                lower=False,
                trans=0,
            )
            / sn2_eff
        )
        return F, _var_tail(z, ell, ln_sf2, sum_lnell, sigma, invKzk, dtype)

    def inv_var_one(hyp, alpha, L, mult, X, n_real, mu, sigma):
        dtype = X.dtype
        z, F, ell, ln_sf2, sum_lnell = _z_and_mean(
            hyp, alpha, X, n_real, mu, sigma
        )
        invKzk = -jnp.matmul(L, z.T)
        return F, _var_tail(z, ell, ln_sf2, sum_lnell, sigma, invKzk, dtype)

    mean_axes = (0, 0, None, None, None, None)
    var_axes = (0, 0, 0, 0, None, None, None, None)

    def _packed_var_raw(branch, axes=var_axes):
        # Mean and variance stacked into one (2, s, M) output: one
        # device->host pull per call (fixed tunnel latency per transfer;
        # same treatment as _predict_fns._packed_multi).
        vm = jax.vmap(branch, in_axes=axes)

        def f(*args):
            F, J = vm(*args)
            return jnp.stack([F, J])

        return f

    def mixed_var_one(flag, hyp, alpha, L, mult, X, n_real, mu, sigma):
        # Both parametrization branches in one program, where-selected
        # per sample (see _predict_fns.mixed_branch rationale).
        F_c, J_c = chol_var_one(hyp, alpha, L, mult, X, n_real, mu, sigma)
        F_i, J_i = inv_var_one(hyp, alpha, L, mult, X, n_real, mu, sigma)
        return jnp.where(flag, F_c, F_i), jnp.where(flag, J_c, J_i)

    # Raw (vmapped, unjitted) callables double as shard_map bodies for
    # the mesh-sharded quad path (_quad_sharded_fn).
    mean_vm = jax.vmap(mean_one, in_axes=mean_axes)
    chol_packed = _packed_var_raw(chol_var_one)
    inv_packed = _packed_var_raw(inv_var_one)
    mixed_packed = _packed_var_raw(mixed_var_one, (0,) + var_axes)

    return {
        "mean": jax.jit(mean_vm),
        "chol_var": jax.jit(jax.vmap(chol_var_one, in_axes=var_axes)),
        "inv_var": jax.jit(jax.vmap(inv_var_one, in_axes=var_axes)),
        "chol_var_packed": jax.jit(chol_packed),
        "inv_var_packed": jax.jit(inv_packed),
        "mixed_var_packed": jax.jit(mixed_packed),
        "mean_raw": mean_vm,
        "chol_var_packed_raw": chol_packed,
        "inv_var_packed_raw": inv_packed,
        "mixed_var_packed_raw": mixed_packed,
    }


@lru_cache(maxsize=None)
def _quad_sharded_fn(spec: ModelSpec, key: str, mesh):
    """Bayesian quadrature with the INTEGRATION-POINT axis sharded over a
    device mesh (PyVBMC's ELBO hot path, reference
    gaussian_process.py:1818-1981): each device holds the replicated
    padded posterior factors and integrates its own slab of N(mu, sigma)
    measures.  Zero per-point collectives — like _predict_sharded_fn.

    ``key`` is one of 'mean', 'chol_var_packed', 'inv_var_packed',
    'mixed_var_packed'; mu/sigma rows must be padded to the mesh size.
    """
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    raw = _quad_fns(spec)[key + "_raw"]
    # mu and sigma are always the two trailing args; everything before
    # them (hyps/factors/X/n_real [+ flags]) is replicated.
    n_args = {
        "mean": 6,
        "chol_var_packed": 8,
        "inv_var_packed": 8,
        "mixed_var_packed": 9,
    }[key]
    in_specs = (P(),) * (n_args - 2) + (P("batch", None),) * 2
    out_specs = (
        P(None, "batch") if key == "mean" else P(None, None, "batch")
    )
    sharded = shard_map(
        raw, mesh=mesh, in_specs=in_specs, out_specs=out_specs
    )
    return jax.jit(sharded)
