"""Chunked prediction equals unchunked prediction (the TPU answer to the
reference's full N x M cross-covariance materialization,
gaussian_process.py:1746; SURVEY.md section 5 'long-context' analog)."""

import numpy as np

import gpyreg_tpu as gpr


def _make_gp(n_samples=3):
    rng = np.random.default_rng(0)
    D, N = 2, 30
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, axis=1, keepdims=True)) + 0.1 * rng.normal(
        size=(N, 1)
    )
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    hyp = np.tile(
        np.array([0.2, 0.1, 0.3, -2.0, 0.0]), (n_samples, 1)
    ) + 0.05 * rng.normal(size=(n_samples, 5))
    gp.update(X_new=X, y_new=y, hyp=hyp)
    return gp, rng


def test_chunked_equals_unchunked():
    gp, rng = _make_gp()
    xs = rng.uniform(-3, 3, (57, 2))

    mu_ref, s2_ref = gp.predict(xs)

    # Force tiny chunks (covers padding of the tail chunk too).
    gp._predict_chunk_budget = 30 * 3 * 10  # -> chunk = 10
    mu_c, s2_c = gp.predict(xs)

    assert np.allclose(mu_ref, mu_c, atol=1e-12)
    assert np.allclose(s2_ref, s2_c, atol=1e-12)


def test_chunked_separate_samples_and_noise():
    gp, rng = _make_gp()
    xs = rng.uniform(-3, 3, (41, 2))
    mu_ref, s2_ref = gp.predict(xs, add_noise=True, separate_samples=True)
    gp._predict_chunk_budget = 30 * 3 * 7
    mu_c, s2_c = gp.predict(xs, add_noise=True, separate_samples=True)
    assert np.allclose(mu_ref, mu_c, atol=1e-12)
    assert np.allclose(s2_ref, s2_c, atol=1e-12)


def test_no_stack_per_sample_path():
    """Large-N regime: per-sample prediction (no factor stacking) must
    equal the batched path."""
    gp, rng = _make_gp()
    xs = rng.uniform(-3, 3, (33, 2))
    mu_ref, s2_ref = gp.predict(xs)
    gp._posterior_mem_budget = 1  # force no_stack (and tiny chunks)
    mu_c, s2_c = gp.predict(xs)
    assert np.allclose(mu_ref, mu_c, atol=1e-12)
    assert np.allclose(s2_ref, s2_c, atol=1e-12)
    mu_f, cov_f = gp.predict_full(xs)
    del gp._posterior_mem_budget
    mu_f2, cov_f2 = gp.predict_full(xs)
    assert np.allclose(mu_f, mu_f2, atol=1e-12)
    assert np.allclose(cov_f, cov_f2, atol=1e-12)


def test_chunk_smaller_than_128_alignment_guard():
    # chunk <= 128 must not be zeroed by lane alignment.
    gp, rng = _make_gp(n_samples=1)
    xs = rng.uniform(-3, 3, (200, 2))
    mu_ref, s2_ref = gp.predict(xs)
    gp._predict_chunk_budget = 30 * 1 * 130  # chunk = 130 -> aligned to 128
    mu_c, s2_c = gp.predict(xs)
    assert np.allclose(mu_ref, mu_c, atol=1e-12)
    assert np.allclose(s2_ref, s2_c, atol=1e-12)


def test_fast_predict_parametrization_matches():
    """fast_predict=True (explicit-inverse factors for every posterior)
    gives the same predictions as the default Cholesky parametrization."""
    import gpyreg_tpu as gpr

    rng = np.random.default_rng(7)
    D, N = 2, 40
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, axis=1, keepdims=True))
    hyp = np.array([[0.2, 0.1, 0.3, -1.0, 0.0], [0.3, 0.2, 0.4, -1.2, 0.1]])

    gps = []
    for fp in (False, True):
        gp = gpr.GP(
            D=D,
            covariance=gpr.covariance_functions.SquaredExponential(),
            mean=gpr.mean_functions.ConstantMean(),
            noise=gpr.noise_functions.GaussianNoise(constant_add=True),
            fast_predict=fp,
        )
        gp.update(X_new=X, y_new=y, hyp=hyp)
        gps.append(gp)

    assert gps[0].posteriors[0].L_chol and not gps[1].posteriors[0].L_chol
    xs = rng.uniform(-3, 3, (30, D))
    mu0, s20 = gps[0].predict(xs, add_noise=True)
    mu1, s21 = gps[1].predict(xs, add_noise=True)
    assert np.allclose(mu0, mu1, atol=1e-8)
    assert np.allclose(s20, s21, atol=1e-8)
    # quad and random_function consume the inv parametrization too.
    F0, v0 = gps[0].quad(np.zeros((2, D)), np.ones((2, D)), compute_var=True)
    F1, v1 = gps[1].quad(np.zeros((2, D)), np.ones((2, D)), compute_var=True)
    assert np.allclose(F0, F1, atol=1e-8)
    assert np.allclose(v0, v1, atol=1e-6)
