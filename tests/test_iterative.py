"""Matrix-free CG inference: panel matvec == dense matvec, CG solve ==
direct solve, CG prediction == Cholesky-path GP prediction, padding
correctness, batched multi-RHS convergence."""

import numpy as np
import pytest

import jax.numpy as jnp

import gpyreg_tpu as gpr
from gpyreg_tpu.core.model import ModelSpec
from gpyreg_tpu.ops.iterative import (
    _cg,
    _panel_matvec,
    cg_posterior_weights,
    cg_predict,
)
from gpyreg_tpu.ops.kernels import kernel_matrix


def _spec(D=2, cov="se"):
    return ModelSpec(
        D=D, cov=cov, mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )


def test_panel_matvec_matches_dense():
    rng = np.random.default_rng(0)
    N, D, B = 96, 3, 4
    X = jnp.asarray(rng.normal(size=(N, D)))
    hyp_cov = jnp.asarray(0.2 * rng.normal(size=D + 1))
    V = jnp.asarray(rng.normal(size=(N, B)))
    sn2 = jnp.full((N,), 0.1)
    spec = _spec(D)
    out = _panel_matvec(spec, hyp_cov, X, V, sn2, row_chunk=32)
    K = kernel_matrix("se", hyp_cov, X)
    ref = K @ V + 0.1 * V
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 1e-10


def test_cg_matches_direct_solve():
    rng = np.random.default_rng(1)
    N, B = 64, 3
    A = rng.normal(size=(N, N))
    A = jnp.asarray(A @ A.T + N * np.eye(N))
    Bm = jnp.asarray(rng.normal(size=(N, B)))
    X, res, iters = _cg(lambda v: A @ v, Bm, tol=1e-10, max_iter=500)
    ref = np.linalg.solve(np.asarray(A), np.asarray(Bm))
    assert np.max(np.abs(np.asarray(X) - ref)) < 1e-7
    assert float(np.max(np.asarray(res))) < 1e-9


@pytest.mark.parametrize("cov", ["se", "m5"])
def test_cg_predict_matches_cholesky_gp(cov):
    rng = np.random.default_rng(2)
    N, D, M = 150, 2, 40
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, axis=1, keepdims=True)) + 0.1 * rng.normal(
        size=(N, 1)
    )
    xs = rng.uniform(-3, 3, (M, D))
    hyp = np.array([0.2, 0.1, 0.3, -1.2, 0.05])

    kern = (
        gpr.covariance_functions.SquaredExponential()
        if cov == "se"
        else gpr.covariance_functions.Matern(5)
    )
    gp = gpr.GP(
        D=D,
        covariance=kern,
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp.update(X_new=X, y_new=y, hyp=hyp[None, :])
    mu_ref, s2_ref = gp.predict(xs)

    mu, var, info = cg_predict(
        _spec(D, cov), hyp, X, y, None, xs,
        compute_var=True, tol=1e-9, row_chunk=64, test_chunk=16,
    )
    assert info["alpha_rel_residual"] < 1e-8
    assert np.max(np.abs(mu - mu_ref)) < 1e-6
    assert np.max(np.abs(var - s2_ref)) < 1e-6


def test_padding_rows_do_not_contaminate():
    """N not divisible by row_chunk exercises the masked padding."""
    rng = np.random.default_rng(3)
    N, D = 117, 2  # pads to 128
    X = rng.uniform(-3, 3, (N, D))
    y = np.cos(np.sum(X, axis=1, keepdims=True))
    xs = rng.uniform(-3, 3, (20, D))
    hyp = np.array([0.1, 0.2, 0.3, -1.0, 0.0])

    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp.update(X_new=X, y_new=y, hyp=hyp[None, :])
    mu_ref, s2_ref = gp.predict(xs)

    mu, var, _ = cg_predict(
        _spec(D), hyp, X, y, None, xs,
        compute_var=True, tol=1e-9, row_chunk=64,
    )
    assert np.max(np.abs(mu - mu_ref)) < 1e-6
    assert np.max(np.abs(var - s2_ref)) < 1e-6


def test_posterior_weights_match_alpha():
    rng = np.random.default_rng(4)
    N, D = 128, 2
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, axis=1, keepdims=True))
    hyp = np.array([0.2, 0.1, 0.3, -1.0, 0.0])
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp.update(X_new=X, y_new=y, hyp=hyp[None, :])
    alpha_ref = gp.posteriors[0].alpha

    alpha, res, iters = cg_posterior_weights(
        _spec(D), jnp.asarray(hyp), jnp.asarray(X), jnp.asarray(y), None,
        tol=1e-10, row_chunk=32,
    )
    assert np.max(np.abs(np.asarray(alpha) - alpha_ref)) < 1e-6
    assert int(iters) < 500


def test_heteroskedastic_s2():
    rng = np.random.default_rng(5)
    N, D = 90, 1
    X = rng.uniform(-3, 3, (N, D))
    s2 = 0.01 + 0.05 * rng.random((N, 1))
    y = np.sin(X) + np.sqrt(s2) * rng.normal(size=(N, 1))
    xs = np.linspace(-3, 3, 15)[:, None]
    hyp = np.array([0.1, 0.2, -2.0, 0.0])
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=1, noise_rectified=False,
    )
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(
            constant_add=True, user_provided_add=True
        ),
    )
    gp.X, gp.y, gp.s2 = X, y, s2
    gp.update(hyp=hyp[None, :])
    mu_ref, s2_ref = gp.predict(xs)
    mu, var, _ = cg_predict(
        spec, hyp, X, y, s2, xs, compute_var=True, tol=1e-9, row_chunk=32
    )
    assert np.max(np.abs(mu - mu_ref)) < 1e-6
    assert np.max(np.abs(var - s2_ref)) < 1e-6


def test_pivoted_cholesky_low_rank_accuracy():
    """Rank-k pivoted Cholesky captures a smooth kernel's spectrum:
    ||K - Lk Lk^T||_F decays fast with k."""
    from gpyreg_tpu.ops.iterative import pivoted_cholesky

    rng = np.random.default_rng(6)
    N, D = 80, 2
    X = jnp.asarray(rng.uniform(-2, 2, (N, D)))
    hyp_cov = jnp.asarray([0.3, 0.3, 0.0])
    spec = _spec(D)
    K = np.asarray(kernel_matrix("se", hyp_cov, X))
    err_prev = np.linalg.norm(K)
    for k in (5, 20, 40):
        Lk = np.asarray(pivoted_cholesky(spec, hyp_cov, X, k))
        err = np.linalg.norm(K - Lk @ Lk.T)
        assert err < err_prev + 1e-9
        err_prev = err
    assert err / np.linalg.norm(K) < 1e-3  # rank 40 of a smooth kernel


def test_preconditioned_cg_converges_faster_and_matches():
    rng = np.random.default_rng(7)
    N, D, M = 200, 2, 20
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, axis=1, keepdims=True))
    xs = rng.uniform(-3, 3, (M, D))
    # Long lengthscales + small noise -> ill-conditioned (many CG iters)
    hyp = np.array([1.0, 1.0, 1.0, -4.0, 0.0])
    spec = _spec(D)

    mu0, _, info0 = cg_predict(
        spec, hyp, X, y, None, xs, tol=1e-8, row_chunk=64, max_iter=2000
    )
    mu1, _, info1 = cg_predict(
        spec, hyp, X, y, None, xs, tol=1e-8, row_chunk=64, max_iter=2000,
        precond_rank=40,
    )
    assert np.max(np.abs(mu0 - mu1)) < 1e-5
    assert info1["alpha_iters"] < info0["alpha_iters"] / 2, (
        info0["alpha_iters"], info1["alpha_iters"]
    )


def test_preconditioned_matches_cholesky_gp():
    rng = np.random.default_rng(8)
    N, D = 130, 2  # exercises padding + preconditioner together
    X = rng.uniform(-3, 3, (N, D))
    y = np.cos(np.sum(X, axis=1, keepdims=True))
    xs = rng.uniform(-3, 3, (15, D))
    hyp = np.array([0.2, 0.1, 0.3, -1.5, 0.0])
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    gp.update(X_new=X, y_new=y, hyp=hyp[None, :])
    mu_ref, s2_ref = gp.predict(xs)
    mu, var, info = cg_predict(
        _spec(D), hyp, X, y, None, xs, compute_var=True,
        tol=1e-9, row_chunk=64, precond_rank=30,
    )
    assert np.max(np.abs(mu - mu_ref)) < 1e-6
    assert np.max(np.abs(var - s2_ref)) < 1e-6


def test_slq_nlml_and_grad_match_exact():
    """cg_nlml (SLQ logdet + Hutchinson gradient) tracks the exact
    Cholesky NLML within stochastic-estimator tolerance."""
    import jax

    from gpyreg_tpu.core.nlml import nlz
    from gpyreg_tpu.ops.iterative import cg_nlml

    rng = np.random.default_rng(0)
    N, D = 512, 4
    X = rng.normal(size=(N, D))
    y = np.sum(np.sin(X), 1, keepdims=True) + 0.1 * rng.normal(size=(N, 1))
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    hyp = np.concatenate([0.2 * rng.normal(size=D), [0.1], [-1.2], [0.1]])

    exact = float(nlz(spec, jnp.asarray(hyp), jnp.asarray(X),
                      jnp.asarray(y), None))
    est, grad = cg_nlml(
        spec, hyp, X, y, key=jax.random.key(1), compute_grad=True,
        row_chunk=128, n_probes=16, n_lanczos=40,
    )
    assert abs(est - exact) / abs(exact) < 0.01
    g_exact = np.asarray(
        jax.grad(
            lambda h: nlz(spec, h, jnp.asarray(X), jnp.asarray(y), None)
        )(jnp.asarray(hyp))
    )
    rel = np.max(np.abs(grad - g_exact)) / max(1.0, np.max(np.abs(g_exact)))
    assert rel < 0.15


def test_fit_cg_recovers_hyperparameters():
    """Matrix-free MAP fit lands near the Cholesky-path optimum."""
    import jax

    from gpyreg_tpu.core.nlml import get_fns
    from gpyreg_tpu.inference.map_optimize import multistart_map
    from gpyreg_tpu.ops.iterative import fit_cg

    rng = np.random.default_rng(5)
    N, D = 256, 2
    X = rng.uniform(-3, 3, (N, D))
    y = np.sum(np.sin(X), 1, keepdims=True) + 0.1 * rng.normal(size=(N, 1))
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    hyp0 = np.array([0.5, 0.5, 0.5, -1.0, 0.0])
    LB = np.full(5, -8.0)
    UB = np.full(5, 8.0)

    hyp_it, res = fit_cg(
        spec, X, y, hyp0=hyp0, LB=LB, UB=UB, key=jax.random.key(2),
        row_chunk=128, n_probes=12, n_lanczos=40,
    )
    fns = get_fns(spec, False, False)
    xs, fs, _ = multistart_map(
        fns["obj_raw"], hyp0[None, :], LB, UB,
        f_args=(jnp.asarray(X), jnp.asarray(y)), tol=1e-6,
    )
    f_chol = float(fs[0])
    f_it_exact = float(
        fns["obj"](jnp.asarray(hyp_it), jnp.asarray(X), jnp.asarray(y))
    )
    # The stochastic optimum's EXACT objective is within a fraction of
    # a nat of the Cholesky optimum.
    assert f_it_exact - f_chol < 1.0
    assert np.max(np.abs(hyp_it - np.asarray(xs[0]))) < 0.5


def test_cg_warm_start_same_solution_fewer_iters():
    """Warm-started cg_nlml (arXiv:2405.18457): at a nearby
    hyperparameter the carried solution block cuts the CG iteration
    count while the value/gradient agree with the cold solve to
    solver tolerance."""
    import jax

    from gpyreg_tpu.ops.iterative import cg_nlml

    rng = np.random.default_rng(7)
    N, D = 384, 3
    X = rng.uniform(-3, 3, (N, D))
    y = np.sum(np.sin(X), 1, keepdims=True) + 0.1 * rng.normal(size=(N, 1))
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    hyp = np.concatenate([0.1 * rng.normal(size=D), [0.0], [-1.5], [0.0]])
    key = jax.random.key(3)
    kw = dict(key=key, compute_grad=True, tol=1e-8, row_chunk=128,
              n_probes=8, n_lanczos=32)

    v0, g0, sol, it0 = cg_nlml(spec, hyp, X, y, sol0=None,
                               return_sol=True, **kw)
    # Small optimizer-like step.
    hyp2 = hyp + 0.02 * rng.normal(size=hyp.shape)
    v_warm, g_warm, _, it_warm = cg_nlml(spec, hyp2, X, y, sol0=sol,
                                         return_sol=True, **kw)
    v_cold, g_cold = cg_nlml(spec, hyp2, X, y, **kw)
    assert abs(v_warm - v_cold) / abs(v_cold) < 1e-5
    assert np.max(np.abs(g_warm - g_cold)) < 1e-3 * max(
        1.0, np.max(np.abs(g_cold))
    )
    # The warm solve starts far down the convergence curve.
    assert int(it_warm) < int(it0)


def test_fit_cg_warm_start_matches_cold():
    """fit_cg(warm_start=True) lands at the same optimum as the cold
    driver (same stochastic objective up to cg_tol) and reports a
    falling per-evaluation CG iteration profile."""
    import jax

    from gpyreg_tpu.ops.iterative import fit_cg

    rng = np.random.default_rng(11)
    N, D = 256, 2
    X = rng.uniform(-3, 3, (N, D))
    y = np.sum(np.sin(X), 1, keepdims=True) + 0.1 * rng.normal(size=(N, 1))
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    hyp0 = np.array([0.3, 0.3, 0.2, -1.0, 0.0])
    LB = np.full(5, -8.0)
    UB = np.full(5, 8.0)
    kw = dict(key=jax.random.key(2), row_chunk=128, n_probes=8,
              n_lanczos=32, cg_tol=1e-8)

    h_warm, res_warm = fit_cg(spec, X, y, hyp0=hyp0, LB=LB, UB=UB,
                              warm_start=True, **kw)
    h_cold, res_cold = fit_cg(spec, X, y, hyp0=hyp0, LB=LB, UB=UB,
                              warm_start=False, **kw)
    assert np.max(np.abs(h_warm - h_cold)) < 0.05
    iters = res_warm.cg_iters
    assert iters.shape[0] == res_warm.nfev
    # The bulk of evaluations (small L-BFGS steps) must be cheaper
    # than the cold first solve.
    assert np.median(iters[1:]) < iters[0]
    assert not hasattr(res_cold, "cg_iters")


def test_pallas_panel_matvec_matches_xla():
    """The forward-only fused Pallas CROSS-panel build inside the CG
    matvec (interpret mode on CPU; the compiled path runs on-chip)
    matches the XLA composition, and the gate engages it for every
    forward matvec of cg_nlml at f32 while the differentiated
    surrogate pass keeps the XLA build (gradients stay equal)."""
    from gpyreg_tpu.ops import iterative as it
    from gpyreg_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(5)
    N, D, B = 128, 3, 3
    X = rng.normal(size=(N, D)).astype(np.float32)
    V = rng.normal(size=(N, B)).astype(np.float32)
    hyp_cov = np.array([0.1, -0.2, 0.3, 0.05], dtype=np.float32)
    sn2 = np.full((N,), 0.01, dtype=np.float32)
    spec = _spec(D=3)

    old = pk.INTERPRET
    pk.INTERPRET = True
    try:
        assert it._cross_pallas_ok(spec, jnp.asarray(X))
        a = np.asarray(
            _panel_matvec(spec, hyp_cov, X, V, sn2, 64, pallas=False)
        )
        b = np.asarray(
            _panel_matvec(spec, hyp_cov, X, V, sn2, 64, pallas=True)
        )
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-5)

        # End-to-end: f32 cg_nlml value+grad with the pallas forward
        # matvecs vs the pure-XLA path (gate forced off).
        import jax

        y = np.sum(np.sin(X), 1, keepdims=True).astype(np.float32)
        hyp = np.concatenate(
            [np.zeros(D), [0.0], [-1.5], [0.0]]
        ).astype(np.float32)
        key = jax.random.key(0)
        v1, g1 = it.cg_nlml(
            spec, hyp, X, y, None, key=key, tol=1e-6,
            row_chunk=64, max_iter=200, n_probes=4, n_lanczos=16,
            compute_grad=True,
        )
        pk.INTERPRET = False  # gate off (CPU backend) -> XLA matvecs
        v2, g2 = it.cg_nlml(
            spec, hyp, X, y, None, key=key, tol=1e-6,
            row_chunk=64, max_iter=200, n_probes=4, n_lanczos=16,
            compute_grad=True,
        )
        np.testing.assert_allclose(float(v1), float(v2), rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=0, atol=2e-4
        )
    finally:
        pk.INTERPRET = old
