"""Pallas fused distance+kernel tiles vs the XLA composition
(interpreter mode on the CPU test backend; the compiled path runs on
TPU in benchmarks/)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpyreg_tpu.ops.kernels import kernel_matrix
from gpyreg_tpu.ops.pallas_kernels import kernel_matrix_pallas

KINDS = ["se", "m3", "m5", "rq"]


@pytest.mark.parametrize("kind", KINDS)
def test_matches_xla_path(kind):
    rng = np.random.default_rng(0)
    N, M, D = 70, 130, 3  # deliberately not tile multiples
    X = rng.normal(size=(N, D)).astype(np.float32)
    Z = rng.normal(size=(M, D)).astype(np.float32)
    n_hyp = D + 2 if kind == "rq" else D + 1
    hyp = (0.2 * rng.normal(size=n_hyp)).astype(np.float32)

    K_ref = np.asarray(
        kernel_matrix(kind, jnp.asarray(hyp), jnp.asarray(X), Z=jnp.asarray(Z))
    )
    K_pl = np.asarray(
        kernel_matrix_pallas(
            kind, jnp.asarray(hyp), jnp.asarray(X), Z=jnp.asarray(Z),
            interpret=True,
        )
    )
    assert K_pl.shape == (N, M)
    assert np.max(np.abs(K_pl - K_ref)) < 1e-5


def test_self_covariance_symmetric():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(50, 2)).astype(np.float32)
    hyp = np.zeros(3, dtype=np.float32)
    K = np.asarray(
        kernel_matrix_pallas("se", jnp.asarray(hyp), jnp.asarray(X),
                             interpret=True)
    )
    assert K.shape == (50, 50)
    assert np.allclose(K, K.T, atol=1e-6)
    assert np.allclose(np.diag(K), 1.0, atol=1e-6)


def test_pallas_predict_wiring_matches_xla():
    """GP(pallas_predict=True) serves identical predictions through the
    fused Pallas cross-covariance (interpreter mode on CPU; the compiled
    path is exercised on-chip by benchmarks/tpu_consistency_check.py)."""
    import gpyreg_tpu as gpr
    from gpyreg_tpu.ops import pallas_kernels as pk

    old = pk.INTERPRET
    pk.INTERPRET = True
    try:
        rng = np.random.default_rng(3)
        N, D, M = 300, 3, 50
        X = rng.normal(size=(N, D))
        y = np.sum(np.sin(X), 1, keepdims=True)
        hyp = np.concatenate([np.zeros(D), [0.0], [-1.0], [0.0]])[None, :]
        xs = rng.normal(size=(M, D))

        def mk(**kw):
            return gpr.GP(
                D=D,
                covariance=gpr.covariance_functions.SquaredExponential(),
                mean=gpr.mean_functions.ConstantMean(),
                noise=gpr.noise_functions.GaussianNoise(constant_add=True),
                dtype=np.float32,
                **kw,
            )

        g1 = mk()
        g1.update(X_new=X, y_new=y, hyp=hyp)
        g2 = mk(pallas_predict=True)
        g2.update(X_new=X, y_new=y, hyp=hyp)
        # Force the chunked serving path where the Pallas kernel lives.
        g2._posterior_mem_budget = 1
        g2._predict_chunk_budget = 16 * N
        mu1, s21 = g1.predict(xs)
        mu2, s22 = g2.predict(xs)
        assert np.allclose(mu1, mu2, atol=5e-5)
        assert np.allclose(s21, s22, atol=5e-5)
    finally:
        pk.INTERPRET = old
