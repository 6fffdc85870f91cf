"""MXU serving path (GP.mxu_predict / gp._predict_chunked_fn(mxu=True)):
the large-M/large-N Cholesky-path predict replaces XLA's trsm (the
round-2 serving-study roofline, ~4.7 effective TFLOP/s) with a
once-per-dispatch divide-and-conquer triangular inversion
(ops.linalg.tri_inv) and dense MXU matmuls.  Mathematically identical;
these tests pin the equality, the auto-gate, and the mesh twin."""

import numpy as np
import pytest

import gpyreg_tpu as gpr
from gpyreg_tpu import gp as gpmod


def _data(N=100, M=300, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-3, 3, (N, 2))
    y = (np.sin(np.sum(X, 1)) + 0.2 * rng.normal(size=N))[:, None]
    xs = rng.uniform(-3, 3, (M, 2))
    return X, y, xs


def _make_gp(**kw):
    return gpr.GP(
        2,
        gpr.covariance_functions.SquaredExponential(),
        gpr.mean_functions.ConstantMean(),
        gpr.noise_functions.GaussianNoise(constant_add=True),
        **kw,
    )


def test_chunked_mxu_matches_trsm_f64():
    """At f64 the pre-inverted-factor program and the trsm program are
    the same linear map: agreement to rounding."""
    X, y, xs = _data()
    gp = _make_gp()
    np.random.seed(7)  # unseeded fits occasionally land near-noise-free
    gp.fit(X=X, y=y, options={"n_samples": 2, "opts_N": 1, "init_N": 16})
    spec = gp._spec()
    _, go, Xj, n_real = gp._posterior_arrays()
    p = gp.posteriors[0]
    assert p.L_chol
    args = (
        np.asarray(p.hyp),
        go("alpha", 0),
        go("L", 0),
        go("sW", 0),
        Xj,
        n_real,
        np.asarray(xs),
    )
    a = np.asarray(gpmod._predict_chunked_fn(spec, True, 100)(*args))
    b = np.asarray(
        gpmod._predict_chunked_fn(spec, True, 100, mxu=True)(*args)
    )
    np.testing.assert_allclose(a[0], b[0], atol=1e-12)
    np.testing.assert_allclose(a[1], b[1], atol=1e-10)


def test_gp_forced_mxu_f32_end_to_end():
    """mxu_predict=True + a tiny stack budget drives the public predict
    through the MXU chunked program; f32 agreement with the trsm path
    stays at the composition's rounding level at small N."""
    X, y, xs = _data()
    gp = _make_gp(dtype=np.float32, mxu_predict=True)
    np.random.seed(3)
    gp.fit(X=X, y=y, options={"n_samples": 2, "opts_N": 1, "init_N": 16})
    gp._posterior_mem_budget = 1  # force the per-sample chunked path
    mu_m, s2_m = gp.predict(xs)
    gp.mxu_predict = False
    mu_t, s2_t = gp.predict(xs)
    np.testing.assert_allclose(mu_m, mu_t, atol=1e-5)
    np.testing.assert_allclose(s2_m, s2_t, atol=1e-5)
    assert np.all(np.isfinite(s2_m))


def test_auto_gate():
    """None auto-enables only at f32 above both size thresholds;
    False always wins; f64 never engages (its trsm path is the parity
    dtype and tri_inv would halve nothing)."""
    gp32 = _make_gp(dtype=np.float32)
    n_big = gpmod._MXU_PREDICT_MIN_N
    m_big = gpmod._MXU_PREDICT_MIN_M
    assert gp32._mxu_predict_on(m_big, n_big)
    assert not gp32._mxu_predict_on(m_big - 1, n_big)
    assert not gp32._mxu_predict_on(m_big, n_big - 1)
    gp32.mxu_predict = False
    assert not gp32._mxu_predict_on(m_big, n_big)
    gp32.mxu_predict = True
    assert gp32._mxu_predict_on(1, 1)
    gp64 = _make_gp(mxu_predict=True)
    assert not gp64._mxu_predict_on(m_big, n_big)


def test_mesh_mxu_matches_single_device():
    """The mesh serving twin with mxu forced matches the single-device
    trsm path (each device inverts the replicated factor locally)."""
    from gpyreg_tpu.parallel import mesh as pmesh

    X, y, xs = _data(M=320)
    gp = _make_gp(dtype=np.float32, mxu_predict=True,
                  mesh=pmesh.make_mesh(8))
    np.random.seed(5)
    gp.fit(X=X, y=y, options={"n_samples": 2, "opts_N": 1, "init_N": 16})
    mu_m, s2_m = gp.predict(xs)
    gp.mesh = None
    gp.mxu_predict = False
    mu_t, s2_t = gp.predict(xs)
    np.testing.assert_allclose(mu_m, mu_t, atol=1e-5)
    np.testing.assert_allclose(s2_m, s2_t, atol=1e-5)
