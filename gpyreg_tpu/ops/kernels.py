"""Pure-JAX covariance kernel math (TPU-first).

Pairwise distances are computed with the MXU-friendly norm expansion
``|a|^2 + |b|^2 - 2 a.b`` instead of the reference's scipy
``pdist``/``cdist`` loops (reference covariance_functions.py:165-184).
All functions are pure, differentiable, vmappable and jittable; analytic
hyperparameter gradients of the reference are replaced by autodiff.

Kernel zoo (parity with reference covariance_functions.py /
isotropic_covariance_functions.py):

- ``se``      squared exponential ARD            (D+1 hyp)
- ``m1/3/5``  Matern 1/2, 3/2, 5/2 ARD           (D+1 hyp)
- ``rq``      rational quadratic ARD             (D+2 hyp)
- ``se_iso``, ``m{1,3,5}_iso`` isotropic variants (2 hyp)
"""

import os

import jax
import jax.numpy as jnp
from jax import lax


def _fused_enabled(X, iso, Z, diag, base="se"):
    """Dispatch gate for the fused Pallas self-covariance build with
    its one-pass custom VJP (ops/pallas_kernels.kernel_self_fused): the
    f32 TPU training path at large N, unless disabled by env.  All
    kernel families dispatch (SE/Matern/RQ, ARD and isotropic)."""
    if Z is not None or diag:
        return False
    if X.dtype != jnp.float32:
        return False
    D = X.shape[1]
    hyp_width = 2 if iso else (D + 2 if base == "rq" else D + 1)
    if D >= 128 or hyp_width > 128:
        # The VJP kernel packs the hyperparameter gradient into one
        # 128-lane row (pallas_kernels._make_vjp_kernel), and the D
        # axis rides untiled in VMEM; wider D falls back to the XLA
        # composition.
        return False
    if os.environ.get("GPYREG_TPU_NO_FUSED_KERNEL"):
        return False
    from .pallas_kernels import FUSED_MIN_N, INTERPRET

    if X.shape[0] < FUSED_MIN_N:
        return False
    return INTERPRET or jax.default_backend() == "tpu"


# Back-compat name (round-2 SE-only gate).
_fused_se_enabled = _fused_enabled


def sq_dist(a, b=None):
    """Pairwise squared euclidean distances, (N,D),(M,D) -> (N,M).

    Uses the norm-expansion matmul so the contraction runs on the MXU.
    Result is clamped at zero (cancellation can yield tiny negatives),
    and the self-covariance diagonal is zeroed exactly: the expansion
    leaves O(eps32) residue at i == j that profiles with unbounded
    slope at zero (Matern-1/2's exp(-sqrt(t2))) amplify to O(1e-3)
    kernel error — the reference's pdist/squareform diagonal is exactly
    zero (reference covariance_functions.py:165)."""
    self_cov = b is None
    if self_cov:
        b = a
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (N,1)
    b2 = jnp.sum(b * b, axis=-1)  # (M,)
    d = a2 + b2[None, :] - 2.0 * jnp.matmul(
        a, b.T, precision=lax.Precision.HIGHEST
    )
    if self_cov:
        ii = lax.broadcasted_iota(jnp.int32, d.shape[-2:], 0)
        jj = lax.broadcasted_iota(jnp.int32, d.shape[-2:], 1)
        d = jnp.where(ii == jj, 0.0, d)
    return jnp.maximum(d, 0.0)


def _safe_sqrt(d):
    """sqrt with a zero-safe gradient (grad of sqrt at 0 is inf).

    The clamp keeps autodiff finite on the diagonal of self-distance
    matrices; the true kernel derivatives have finite limits there for
    Matern 3/2 and 5/2 (the reference's analytic gradients produce NaN on
    the diagonal for Matern 1/2; we instead return the one-sided limit 0,
    cf. reference covariance_functions.py:276-280).
    """
    safe = jnp.where(d > 0.0, d, 1.0)
    return jnp.where(d > 0.0, jnp.sqrt(safe), 0.0)


# --- Matern radial profiles: K = sf2 * f(t) * exp(-t), t = sqrt(deg)*r ---

_MATERN_F = {
    1: lambda t: 1.0,
    3: lambda t: 1.0 + t,
    5: lambda t: 1.0 + t * (1.0 + t / 3.0),
}


def kernel_matrix(cov: str, hyp_cov, X, Z=None, diag=False):
    """Evaluate the covariance kernel named by ``cov``.

    Parameters
    ----------
    cov : str
        One of 'se', 'm1', 'm3', 'm5', 'rq' and their '_iso' variants.
    hyp_cov : (cov_N,) array
        Log-lengthscale(s), log-outputscale (+ log-shape for 'rq').
    X : (N, D) array
    Z : (M, D) array, optional
        Cross-covariance points. If None, self-covariance.
    diag : bool
        Only the diagonal of the self-covariance (shape (N,)).

    Returns
    -------
    K : (N, N), (N, M) or (N,) array
    """
    iso = cov.endswith("_iso")
    base = cov[:-4] if iso else cov
    N, D = X.shape

    if iso:
        ell = jnp.exp(hyp_cov[0])
        sf2 = jnp.exp(2.0 * hyp_cov[1])
    else:
        ell = jnp.exp(hyp_cov[0:D])
        sf2 = jnp.exp(2.0 * hyp_cov[D])

    if base == "rq":
        alpha = jnp.exp(hyp_cov[D + 1])

    if diag:
        return sf2 * jnp.ones((N,), dtype=X.dtype)

    if _fused_enabled(X, iso, Z, diag, base):
        from .pallas_kernels import kernel_self_fused

        return kernel_self_fused(base, iso, hyp_cov, X)

    Xs = X / ell
    Zs = None if Z is None else Z / ell

    if base == "se":
        return sf2 * jnp.exp(-0.5 * sq_dist(Xs, Zs))
    if base in ("m1", "m3", "m5"):
        deg = int(base[1])
        t = _safe_sqrt(float(deg) * sq_dist(Xs, Zs))
        return sf2 * _MATERN_F[deg](t) * jnp.exp(-t)
    if base == "rq":
        M = 1.0 + 0.5 * sq_dist(Xs, Zs) / alpha
        return sf2 * M ** (-alpha)
    raise ValueError(f"Unknown covariance kind: {cov}")


def cov_hyp_count(cov: str, D: int) -> int:
    if cov.endswith("_iso"):
        return 2
    if cov == "rq":
        return D + 2
    return D + 1
