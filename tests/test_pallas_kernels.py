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
