"""Tests for the divide-and-conquer triangular inversion (ops/linalg.py
tri_inv) and the dtype-gated Cholesky-VJP strategies built on it."""

import numpy as np
import pytest

import gpyreg_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp

from gpyreg_tpu.ops.linalg import (
    _cholesky_vjp_core,
    neg_inverse_from_chol,
    sym_tri_product,
    tri_inv,
)


@pytest.mark.parametrize("N", [5, 300, 1025])
def test_sym_tri_product_matches_dense(N):
    rng = np.random.default_rng(N)
    W = np.tril(rng.normal(size=(N, N)))
    C = np.asarray(sym_tri_product(jnp.asarray(W), block=256))
    np.testing.assert_allclose(C, W.T @ W, rtol=0, atol=1e-9 * N)


def test_sym_tri_product_batched():
    rng = np.random.default_rng(2)
    Wb = np.tril(rng.normal(size=(3, 200, 200)))
    Cb = np.asarray(sym_tri_product(jnp.asarray(Wb), block=64))
    for i in range(3):
        np.testing.assert_allclose(
            Cb[i], Wb[i].T @ Wb[i], rtol=0, atol=1e-10 * 200
        )


def _well_conditioned_lower(rng, N):
    return np.tril(rng.normal(size=(N, N))) + N * np.eye(N)


@pytest.mark.parametrize("N", [1, 5, 64, 300, 1025])
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_tri_inv_matches_identity(N, dtype):
    rng = np.random.default_rng(N)
    L = _well_conditioned_lower(rng, N)
    W = np.asarray(tri_inv(jnp.asarray(L, dtype=dtype)))
    tol = 1e-10 if dtype == np.float64 else 5e-4
    assert np.max(np.abs(W @ L - np.eye(N))) < tol
    # The inverse of a lower-triangular matrix is lower-triangular.
    assert np.max(np.abs(np.triu(W, 1))) == 0.0


def test_tri_inv_batched():
    rng = np.random.default_rng(7)
    Lb = np.stack([_well_conditioned_lower(rng, 130) for _ in range(3)])
    Wb = np.asarray(tri_inv(jnp.asarray(Lb)))
    for i in range(3):
        assert np.max(np.abs(Wb[i] @ Lb[i] - np.eye(130))) < 1e-9


def test_tri_inv_under_vmap_and_jit():
    rng = np.random.default_rng(3)
    Lb = np.stack([_well_conditioned_lower(rng, 96) for _ in range(4)])
    W1 = np.asarray(jax.jit(jax.vmap(tri_inv))(jnp.asarray(Lb)))
    W2 = np.asarray(tri_inv(jnp.asarray(Lb)))
    np.testing.assert_allclose(W1, W2, rtol=1e-12, atol=1e-12)


def test_cholesky_vjp_matmul_path_matches_trsm_path():
    """The f32 matmul-path adjoint (used on TPU at N >= 1024) must agree
    with the f64 two-trsm adjoint to f32 accuracy."""
    rng = np.random.default_rng(0)
    N = 1100
    X = rng.normal(size=(N, 3))
    K = np.exp(-0.5 * ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    L64 = np.linalg.cholesky(K + 1e-2 * np.eye(N))
    L_bar = rng.normal(size=(N, N)) * np.tril(np.ones((N, N)))
    g64 = np.asarray(
        _cholesky_vjp_core(jnp.asarray(L64), jnp.asarray(L_bar))
    )
    g32 = np.asarray(
        _cholesky_vjp_core(
            jnp.asarray(L64, dtype=jnp.float32),
            jnp.asarray(L_bar, dtype=jnp.float32),
        )
    )
    rel = np.max(np.abs(g32 - g64)) / np.max(np.abs(g64))
    assert rel < 1e-3


def test_neg_inverse_matmul_path_matches_chunked():
    rng = np.random.default_rng(1)
    N = 1050  # above the f32 matmul-path threshold
    X = rng.normal(size=(N, 2))
    K = np.exp(-0.5 * ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    L = np.linalg.cholesky(K + 1e-2 * np.eye(N))
    ref = -np.linalg.inv(K + 1e-2 * np.eye(N))
    got32 = np.asarray(
        neg_inverse_from_chol(jnp.asarray(L, dtype=jnp.float32))
    )
    got64 = np.asarray(neg_inverse_from_chol(jnp.asarray(L)))
    assert np.max(np.abs(got64 - ref)) < 1e-8
    assert np.max(np.abs(got32 - ref)) < 5e-3


@pytest.mark.parametrize("padded", [False, True])
def test_fused_nlz_grad_equals_legacy_cholesky_path(padded):
    """The fused quad_logdet custom-VJP gradient must equal autodiff
    through the jittered_cholesky path (the posterior-factor route) —
    the two share one escalation-loop implementation and must never
    diverge."""
    from gpyreg_tpu.core.model import ModelSpec
    from gpyreg_tpu.core.nlml import assemble, nlz
    from gpyreg_tpu.ops.linalg import chol_solve, jittered_cholesky

    spec = ModelSpec(
        D=2,
        cov="se",
        mean="const",
        noise_constant=True,
        noise_user=0,
        noise_rectified=False,
    )
    rng = np.random.default_rng(0)
    N, pad = 24, 8
    X = rng.normal(size=(N + (pad if padded else 0), 2))
    y = np.sin(X.sum(1, keepdims=True))
    if padded:
        y[N:] = 0.0
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    n_real = N if padded else None
    hyp = jnp.asarray(0.2 * rng.normal(size=(spec.hyp_N,)))

    def legacy(h):
        K, sn2_vec, r, _, log_jac = assemble(spec, h, Xj, yj, None, n_real)
        L, mult = jittered_cholesky(K, sn2_vec)
        alpha = chol_solve(L, r)
        logdet_half = jnp.sum(jnp.log(jnp.diag(L)))
        n_eff = X.shape[0]
        if n_real is not None:
            logdet_half = logdet_half - 0.5 * (
                X.shape[0] - n_real
            ) * jnp.log(mult)
            n_eff = n_real
        return (
            0.5 * jnp.sum(r * alpha)
            + logdet_half
            + 0.5 * n_eff * np.log(2 * np.pi)
            - log_jac
        )

    v1, g1 = jax.value_and_grad(
        lambda h: nlz(spec, h, Xj, yj, None, n_real)
    )(hyp)
    v2, g2 = jax.value_and_grad(legacy)(hyp)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-9, atol=1e-12
    )


def test_jittered_cholesky_fast_path_and_retry_semantics():
    """The attempt-0-outside-the-loop restructure (ops/linalg.py
    _jittered_chol_impl) must preserve the reference's escalation
    semantics (gaussian_process.py:2413-2421): mult=1 when the first
    factorization succeeds, x10 per retry, all-NaN L after
    CHOL_MAX_TRIES failures."""
    from gpyreg_tpu._config import CHOL_MAX_TRIES
    from gpyreg_tpu.ops.linalg import jittered_cholesky

    N = 16
    sn2 = jnp.full((N,), 0.1)
    # Well-conditioned: first attempt, mult stays 1.
    L, mult = jittered_cholesky(jnp.eye(N), sn2)
    assert float(mult) == 1.0
    np.testing.assert_allclose(
        np.asarray(L), np.sqrt(1.1) * np.eye(N), rtol=1e-12
    )
    # Indefinite until the second attempt: -0.5 I + 1*0.1 I < 0,
    # -0.5 I + 10*0.1 I > 0 -> mult = 10, deterministically.
    L, mult = jittered_cholesky(-0.5 * jnp.eye(N), sn2)
    assert float(mult) == 10.0
    assert np.all(np.isfinite(np.asarray(L)))
    np.testing.assert_allclose(
        np.asarray(L), np.sqrt(0.5) * np.eye(N), rtol=1e-12
    )
    # Hopeless: negative beyond every multiplier -> NaN factor (XLA
    # fills the lower triangle with NaN, zeros above; callers detect
    # via any-isnan, reference raises) at the final multiplier.
    L, mult = jittered_cholesky(-1e12 * jnp.eye(N), jnp.full((N,), 1.0))
    assert float(mult) == 10.0 ** (CHOL_MAX_TRIES - 1)
    assert np.all(np.isnan(np.diag(np.asarray(L))))


def test_jittered_cholesky_mixed_lanes_under_vmap():
    """Per-lane multiplier independence under vmap: a converged lane
    must keep its attempt-0 factor and mult=1 while a failing lane
    escalates (the batched design/multistart programs rely on this)."""
    from gpyreg_tpu.ops.linalg import jittered_cholesky

    N = 16
    K = jnp.stack([jnp.eye(N), -0.5 * jnp.eye(N)])
    sn2 = jnp.full((2, N), 0.1)
    L, mult = jax.vmap(jittered_cholesky)(K, sn2)
    np.testing.assert_allclose(np.asarray(mult), [1.0, 10.0])
    np.testing.assert_allclose(
        np.asarray(L[0]), np.sqrt(1.1) * np.eye(N), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(L[1]), np.sqrt(0.5) * np.eye(N), rtol=1e-12
    )
    # Gradients flow through the vmapped cond/retry structure.
    def loss(Kb):
        Lb, _ = jax.vmap(jittered_cholesky)(Kb, sn2)
        return jnp.sum(jnp.log(jnp.diagonal(Lb, axis1=-2, axis2=-1)))

    g = jax.grad(loss)(K)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("N", [256, 512, 2048, 700])
def test_tri_inv_doubling_matches_tri_inv(N):
    """Recursive doubling == the unrolled recursion (700 exercises the
    non-power-of-two fallback)."""
    from gpyreg_tpu.ops.linalg import tri_inv_doubling

    rng = np.random.default_rng(N)
    L = _well_conditioned_lower(rng, N)
    Wd = np.asarray(tri_inv_doubling(jnp.asarray(L), base=256))
    np.testing.assert_allclose(
        Wd @ L, np.eye(N), rtol=0, atol=1e-9 * N
    )


def test_tri_inv_doubling_batched():
    from gpyreg_tpu.ops.linalg import tri_inv_doubling

    rng = np.random.default_rng(7)
    Lb = np.stack(
        [_well_conditioned_lower(rng, 512) for _ in range(3)]
    )
    Wb = np.asarray(tri_inv_doubling(jnp.asarray(Lb), base=128))
    for i in range(3):
        np.testing.assert_allclose(
            Wb[i] @ Lb[i], np.eye(512), rtol=0, atol=1e-8
        )


@pytest.mark.parametrize("doubling", [True, False])
@pytest.mark.parametrize("N", [512, 4096, 900])
def test_tri_inv_gram_matches_composition(N, doubling):
    """tri_inv_gram == sym_tri_product(tri_inv(.)) == L^-T L^-1."""
    from gpyreg_tpu.ops.linalg import tri_inv_gram

    rng = np.random.default_rng(N)
    L = _well_conditioned_lower(rng, N)
    G = np.asarray(
        tri_inv_gram(jnp.asarray(L), block=512, doubling=doubling)
    )
    W = np.linalg.inv(L)
    np.testing.assert_allclose(G, W.T @ W, rtol=0, atol=1e-12 * N)


def test_ginv_mode_strategies_agree():
    """Every _GINV_MODE strategy computes the same G^{-1} (f64 CPU —
    the f32 TPU throughput comparison is benchmarks/adjoint_bench.py)."""
    from gpyreg_tpu.ops import linalg as LA

    rng = np.random.default_rng(3)
    L = jnp.asarray(_well_conditioned_lower(rng, 1024))
    ref = None
    old = LA._GINV_MODE
    try:
        for mode in ("compose", "gram", "gram_nodbl", "dense"):
            LA._GINV_MODE = mode
            got = np.asarray(LA._ginv_from_chol_f32(L))
            if ref is None:
                ref = got
            else:
                np.testing.assert_allclose(got, ref, rtol=0, atol=1e-10)
    finally:
        LA._GINV_MODE = old
