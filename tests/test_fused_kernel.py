"""Fused Pallas kernel build with one-pass custom VJP
(ops/pallas_kernels.kernel_self_fused; VERDICT r2 item 6, generalized
to the whole kernel zoo in round 3).  CPU tests run the kernels through
the Pallas interpreter with the size gate lowered."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpyreg_tpu.core.model import ModelSpec
from gpyreg_tpu.core.nlml import nlz
from gpyreg_tpu.ops import kernels as K
from gpyreg_tpu.ops import pallas_kernels as PK
from gpyreg_tpu.ops.pallas_kernels import se_kernel_fused


@pytest.fixture
def interpret_small_gate(monkeypatch):
    monkeypatch.setattr(PK, "INTERPRET", True)
    monkeypatch.setattr(PK, "FUSED_MIN_N", 64)
    yield


def _data(N=320, D=4, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.normal(size=(N, D)), dtype=jnp.float32)
    hyp_cov = jnp.asarray(
        0.1 * rng.normal(size=(D + 1,)) + 0.2, dtype=jnp.float32
    )
    return X, hyp_cov


def _xla_se(hyp_cov, X):
    D = X.shape[1]
    ell = jnp.exp(hyp_cov[0:D])
    sf2 = jnp.exp(2.0 * hyp_cov[D])
    return sf2 * jnp.exp(-0.5 * K.sq_dist(X / ell, None))


def test_fused_forward_matches_xla(interpret_small_gate):
    X, hyp_cov = _data()
    K_f = np.asarray(se_kernel_fused(hyp_cov, X))
    K_x = np.asarray(_xla_se(hyp_cov, X))
    assert np.max(np.abs(K_f - K_x)) < 1e-5


def test_fused_vjp_matches_xla(interpret_small_gate):
    X, hyp_cov = _data()
    rng = np.random.default_rng(1)
    C = jnp.asarray(rng.normal(size=(X.shape[0],) * 2), dtype=jnp.float32)

    g_f = jax.grad(lambda h: jnp.sum(se_kernel_fused(h, X) * C))(hyp_cov)
    g_x = jax.grad(lambda h: jnp.sum(_xla_se(h, X) * C))(hyp_cov)
    g_f, g_x = np.asarray(g_f), np.asarray(g_x)
    scale = np.maximum(np.abs(g_x), 1.0)
    assert np.max(np.abs(g_f - g_x) / scale) < 1e-4


def test_dispatch_gate(interpret_small_gate, monkeypatch):
    """kernel_matrix routes to the fused op only on the gated path."""
    X, hyp_cov = _data(N=128)
    # f32 self-covariance above the gate: fused (interpreter) == XLA.
    K_disp = np.asarray(K.kernel_matrix("se", hyp_cov, X))
    K_x = np.asarray(_xla_se(hyp_cov, X))
    assert np.max(np.abs(K_disp - K_x)) < 1e-5
    # Below the size gate / f64 / cross / diag: the XLA path serves.
    monkeypatch.setattr(PK, "FUSED_MIN_N", 10**9)
    assert not K._fused_enabled(X, False, None, False)
    monkeypatch.setattr(PK, "FUSED_MIN_N", 64)
    assert not K._fused_enabled(
        X.astype(jnp.float64), False, None, False
    )
    assert not K._fused_enabled(X, False, X, False)
    # Isotropic kernels DO dispatch since round 3.
    assert K._fused_enabled(X, True, None, False)
    monkeypatch.setenv("GPYREG_TPU_NO_FUSED_KERNEL", "1")
    assert not K._fused_enabled(X, False, None, False)


def test_nlml_grad_through_fused_kernel(interpret_small_gate):
    """End-to-end: value_and_grad of the NLML with the fused build ==
    the XLA composition (the training-path integration)."""
    rng = np.random.default_rng(2)
    N, D = 192, 3
    X = jnp.asarray(rng.normal(size=(N, D)), dtype=jnp.float32)
    y = jnp.asarray(
        np.sum(np.sin(np.asarray(X)), 1, keepdims=True),
        dtype=jnp.float32,
    )
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    hyp = jnp.asarray(
        np.concatenate([0.1 * rng.normal(size=D + 1), [-1.0, 0.1]]),
        dtype=jnp.float32,
    )
    v_f, g_f = jax.value_and_grad(
        lambda h: nlz(spec, h, X, y, None)
    )(hyp)

    import gpyreg_tpu.ops.pallas_kernels as PK2

    PK2.FUSED_MIN_N = 10**9  # force the XLA path
    try:
        v_x, g_x = jax.value_and_grad(
            lambda h: nlz(spec, h, X, y, None)
        )(hyp)
    finally:
        PK2.FUSED_MIN_N = 64
    assert np.isclose(float(v_f), float(v_x), rtol=1e-5)
    scale = np.maximum(np.abs(np.asarray(g_x)), 1.0)
    assert np.max(np.abs(np.asarray(g_f - g_x)) / scale) < 1e-4


ALL_COVS = ["se", "m1", "m3", "m5", "rq", "se_iso", "m1_iso",
            "m3_iso", "m5_iso"]


def _cov_hyp(cov, D, seed=0):
    rng = np.random.default_rng(seed)
    n = K.cov_hyp_count(cov, D)
    return jnp.asarray(
        0.1 * rng.normal(size=(n,)) + 0.2, dtype=jnp.float32
    )


@pytest.mark.parametrize("cov", ALL_COVS)
def test_fused_family_forward_matches_xla(interpret_small_gate, cov,
                                          monkeypatch):
    """kernel_matrix fused dispatch == the XLA composition, per family."""
    X, _ = _data(N=256, D=3)
    hyp_cov = _cov_hyp(cov, 3)
    K_f = np.asarray(K.kernel_matrix(cov, hyp_cov, X))
    monkeypatch.setattr(PK, "FUSED_MIN_N", 10**9)  # force XLA control
    K_x = np.asarray(K.kernel_matrix(cov, hyp_cov, X))
    assert np.max(np.abs(K_f - K_x)) < 1e-5


@pytest.mark.parametrize("cov", ALL_COVS)
def test_fused_family_vjp_matches_xla(interpret_small_gate, cov,
                                      monkeypatch):
    """One-pass Pallas VJP == XLA autodiff of the composition, per
    family (incl. the RQ log-shape slot and the isotropic reduction)."""
    X, _ = _data(N=256, D=3, seed=3)
    hyp_cov = _cov_hyp(cov, 3, seed=4)
    rng = np.random.default_rng(5)
    C = jnp.asarray(
        rng.normal(size=(X.shape[0],) * 2), dtype=jnp.float32
    )

    def loss(h):
        return jnp.sum(K.kernel_matrix(cov, h, X) * C)

    g_f = np.asarray(jax.grad(loss)(hyp_cov))
    monkeypatch.setattr(PK, "FUSED_MIN_N", 10**9)  # force XLA control
    g_x = np.asarray(jax.grad(loss)(hyp_cov))
    scale = np.maximum(np.abs(g_x), 1.0)
    assert np.max(np.abs(g_f - g_x) / scale) < 1e-4


def test_fused_matern_duplicate_rows_finite(interpret_small_gate):
    """Duplicate training points put t2 == 0 off the diagonal; the m1
    profile derivative is singular there and must be clamped (the XLA
    composition's _safe_sqrt convention) instead of emitting NaN."""
    X, _ = _data(N=128, D=3, seed=6)
    X = jnp.concatenate([X[:64], X[:64]], axis=0)
    hyp_cov = _cov_hyp("m1", 3, seed=7)

    def loss(h):
        return jnp.sum(K.kernel_matrix("m1", h, X))

    g = np.asarray(jax.grad(loss)(hyp_cov))
    assert np.all(np.isfinite(g))


def test_wide_d_falls_back_to_xla(interpret_small_gate):
    """D >= 128 exceeds the VJP kernel's single-row gradient packing
    (pallas_kernels._make_se_vjp_kernel pads g_ell to one 128-lane
    row); the dispatch gate must fall back to XLA instead of tracing a
    negative-size pad deep inside the fit's autodiff."""
    X, hyp_cov = _data(N=96, D=130)
    assert not K._fused_se_enabled(X, False, None, False)

    def loss(h):
        return jnp.sum(K.kernel_matrix("se", h, X))

    v, g = jax.value_and_grad(loss)(hyp_cov)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))
