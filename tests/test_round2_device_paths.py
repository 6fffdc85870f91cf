"""Round-2 device-path tests: device-resident rank-1 updates, the
batched device quad, device random_function, and the device sampler's
diagnostics/step_out/log_prior features.

Mirrors the reference's self-consistency methodology (SURVEY.md §4):
rank-1 == reference rank-1 == full refit; quad == reference quad.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gpyreg_tpu as gpr
from gpyreg_tpu.inference import device_slice

sys.path.insert(0, "/root/reference")
import gpyreg as ref  # noqa: E402


def _mk(mod, **kw):
    return mod.GP(
        D=2,
        covariance=mod.covariance_functions.SquaredExponential(),
        mean=mod.mean_functions.ConstantMean(),
        noise=mod.noise_functions.GaussianNoise(constant_add=True),
        **kw,
    )


def _data(seed=0, N=40):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-3, 3, (N, 2))
    y = (np.sin(np.sum(X, 1)) + 0.1 * rng.normal(size=N))[:, None]
    return X, y


@pytest.mark.parametrize("sn", [0.1, 1e-4])
def test_rank1_update_matches_reference(sn):
    """Device rank-1 (both parametrizations) == reference rank-1 on
    identical factors (reference gaussian_process.py:737-844)."""
    X, y = _data(1)
    hyp = np.array([[0.0, 0.0, 0.0, np.log(sn), 0.5]])
    gp = _mk(gpr)
    gp.update(X_new=X, y_new=y, hyp=hyp)
    rgp = _mk(ref)
    rgp.X = X.copy()
    rgp.y = y.copy()
    rgp.update(hyp=hyp.copy(), compute_posterior=True)
    assert gp.posteriors[0].L_chol == rgp.posteriors[0].L_chol

    rng = np.random.default_rng(7)
    for k in range(3):
        x_new = rng.uniform(-3, 3, (1, 2))
        y_new = rng.normal(size=(1, 1))
        gp.update(X_new=x_new, y_new=y_new)
        rgp.update(X_new=x_new.copy(), y_new=y_new.copy())
        p, rp = gp.posteriors[0], rgp.posteriors[0]
        # Relative comparisons: at sn2 ~ 1e-8 the factors/alpha carry
        # 1/sn2-scale entries and the gap is conditioning-amplified.
        a_scale = max(1.0, np.max(np.abs(rp.alpha)))
        L_scale = max(1.0, np.max(np.abs(rp.L)))
        assert np.max(np.abs(np.asarray(p.alpha) - rp.alpha)) / a_scale < 1e-7
        assert np.max(np.abs(np.asarray(p.L) - rp.L)) / L_scale < 1e-7
        assert np.max(np.abs(np.asarray(p.sW) - rp.sW)) < 1e-12


def test_rank1_update_stays_on_device():
    """The updated factors must remain device arrays, padded in place
    (no host pull; VERDICT round 1, Weak #2)."""
    X, y = _data(2)
    gp = _mk(gpr)
    gp.update(
        X_new=X, y_new=y, hyp=np.array([[0.0, 0.0, 0.0, np.log(0.1), 0.5]])
    )
    p = gp.posteriors[0]
    Np = p._L.shape[0]
    assert isinstance(p._L, jax.Array)
    gp.update(X_new=np.zeros((1, 2)), y_new=np.ones((1, 1)))
    p = gp.posteriors[0]
    assert isinstance(p._L, jax.Array) and isinstance(p._alpha, jax.Array)
    assert p._L.shape[0] == Np  # updated in place within the bucket
    assert p.n_real == X.shape[0] + 1
    assert not p._direct
    # The public ABI still shows true-size factors.
    assert p.L.shape == (41, 41) and p.alpha.shape == (41, 1)


def test_rank1_bucket_overflow_falls_back_to_rebuild():
    """An update at a full bucket rebuilds (correctness over speed) and
    predictions stay consistent."""
    X, y = _data(3, N=63)
    gp = _mk(gpr)  # bucket 64
    gp.update(
        X_new=X, y_new=y, hyp=np.array([[0.0, 0.0, 0.0, np.log(0.1), 0.5]])
    )
    xs = np.random.default_rng(5).uniform(-3, 3, (11, 2))
    for k in range(3):  # crosses N=64 -> bucket grows to 128
        gp.update(X_new=np.full((1, 2), 0.1 * k), y_new=np.ones((1, 1)))
    mu1, s21 = gp.predict(xs)

    gp2 = _mk(gpr)
    gp2.update(
        X_new=gp.X, y_new=gp.y, hyp=gp.get_hyperparameters(as_array=True)
    )
    mu2, s22 = gp2.predict(xs)
    assert np.allclose(mu1, mu2, atol=1e-8)
    assert np.allclose(s21, s22, atol=1e-8)


def test_quad_matches_reference_heteroskedastic_negquad():
    """Device quad == reference quad for the PyVBMC model family
    (negquad mean + user noise), both parametrizations, with variance
    (reference gaussian_process.py:1818-1981)."""
    rng = np.random.default_rng(4)
    X = rng.uniform(-3, 3, (30, 2))
    # Tiny user noise so the second sample's total sn2 stays below the
    # 1e-6 parametrization threshold (exercises the inv branch too).
    s2 = 1e-9 + 1e-9 * rng.random((30, 1))
    y = (-np.sum(X**2, 1))[:, None]

    def mk(mod):
        return mod.GP(
            D=2,
            covariance=mod.covariance_functions.SquaredExponential(),
            mean=mod.mean_functions.NegativeQuadratic(),
            noise=mod.noise_functions.GaussianNoise(
                constant_add=True, user_provided_add=True
            ),
        )

    # Two samples landing in different parametrizations (sn2 1e-2/1e-8).
    hyp = np.array(
        [
            [0.0, 0.2, 0.1, np.log(0.1), 0.5, 0.1, -0.2, 0.0, 0.3],
            [0.1, -0.1, 0.0, np.log(1e-4), 0.3, 0.0, 0.1, 0.2, -0.1],
        ]
    )
    gp = mk(gpr)
    gp.update(X_new=X, y_new=y, s2_new=s2, hyp=hyp)
    rgp = mk(ref)
    rgp.X = X.copy()
    rgp.y = y.copy()
    rgp.s2 = s2.copy()
    rgp.update(hyp=hyp.copy(), compute_posterior=True)
    flags = [bool(p.L_chol) for p in gp.posteriors]
    assert flags == [bool(p.L_chol) for p in rgp.posteriors]
    assert flags[0] != flags[1]

    mu = np.array([[0.3, -0.2], [1.0, 0.5], [0.0, 0.0]])
    sig = np.array([[0.5, 0.8], [0.2, 0.2], [1.0, 1.0]])
    F1, V1 = gp.quad(mu, sig, compute_var=True)
    F2, V2 = rgp.quad(mu, sig, compute_var=True)
    assert np.allclose(F1, F2, rtol=1e-10, atol=1e-12)
    assert np.allclose(V1, V2, rtol=1e-7, atol=1e-13)

    F1s = gp.quad(0.1, 0.4, separate_samples=True)
    F2s = rgp.quad(0.1, 0.4, separate_samples=True)
    assert np.allclose(F1s, F2s, rtol=1e-10, atol=1e-12)


def test_quad_after_rank1_updates():
    """quad must consume the rank-1-updated padded factors correctly."""
    X, y = _data(6, N=24)
    gp = _mk(gpr)
    gp.update(
        X_new=X, y_new=y, hyp=np.array([[0.0, 0.0, 0.0, np.log(0.1), 0.5]])
    )
    rng = np.random.default_rng(8)
    for _ in range(2):
        gp.update(
            X_new=rng.uniform(-3, 3, (1, 2)), y_new=rng.normal(size=(1, 1))
        )
    F1, V1 = gp.quad(0.0, 0.7, compute_var=True)
    gp2 = _mk(gpr)
    gp2.update(
        X_new=gp.X, y_new=gp.y, hyp=gp.get_hyperparameters(as_array=True)
    )
    F2, V2 = gp2.quad(0.0, 0.7, compute_var=True)
    assert np.allclose(F1, F2, rtol=1e-9)
    assert np.allclose(V1, V2, rtol=1e-6, atol=1e-12)


def test_device_sampler_diagnostics_exit_flags():
    """Exit-flag semantics (reference slice_sample.py:604-647): a
    well-mixed Gaussian chain converges (flag 1, R ~ 1); a drifting
    deterministic-ish target flags non-convergence (< 0)."""

    def log_f(x):
        return -0.5 * jnp.sum(x**2)

    res, _ = device_slice.sample(
        log_f,
        np.zeros(2),
        jax.random.key(1),
        widths=2 * np.ones(2),
        LB=-10 * np.ones(2),
        UB=10 * np.ones(2),
        n_samples=300,
        burn=100,
    )
    assert res["exit_flag"] == 1
    assert res["R"].shape == (2,) and np.all(res["R"] < 1.1)
    assert res["eff_N"].shape == (2,) and np.all(res["eff_N"] > 30)

    # Tiny widths on a wide target -> crawling chain -> R blows up.
    res2, _ = device_slice.sample(
        log_f,
        np.asarray([5.0, -5.0]),
        jax.random.key(2),
        widths=1e-4 * np.ones(2),
        LB=-10 * np.ones(2),
        UB=10 * np.ones(2),
        n_samples=100,
        burn=0,
        adaptive=False,
    )
    assert res2["exit_flag"] < 0


def test_fit_returns_populated_diagnostics():
    """GP.fit's default (device) sampler path returns the reference
    sampling_result contract with real diagnostics (VERDICT #2)."""
    X, y = _data(9, N=30)
    gp = _mk(gpr)
    _, _, sres = gp.fit(
        X=X, y=y, options={"n_samples": 8, "opts_N": 1, "init_N": 32}
    )
    # sampling_result holds the PRE-thin chain (reference
    # gaussian_process.py:1221-1225 contract): n_samples * thin rows.
    assert sres["samples"].shape[0] == 8 * 5
    assert sres["exit_flag"] in (1, 0, -1, -2, -3)
    assert sres["R"] is not None and sres["eff_N"] is not None
    assert sres["f_vals"].shape[0] == 8 * 5


def test_step_out_and_log_prior():
    """step_out reaches far tails from a too-small width; log_prior is
    reported separately from f_vals (reference slice_sample.py:408-417,
    :219-230)."""

    def log_f(x):
        return -0.5 * jnp.sum(x**2)

    def log_prior(x):
        return -0.5 * jnp.sum((x - 1.0) ** 2 / 4.0)

    res, _ = device_slice.sample(
        log_f,
        np.zeros(1),
        jax.random.key(3),
        widths=0.3 * np.ones(1),
        LB=-20 * np.ones(1),
        UB=20 * np.ones(1),
        n_samples=500,
        burn=100,
        step_out=True,
        log_prior=log_prior,
    )
    s = res["samples"]
    # Product of N(0,1) and N(1,4) -> N(0.2, 0.8).
    assert abs(s.mean() - 0.2) < 0.15
    assert abs(s.var() - 0.8) < 0.35
    total = res["f_vals"][:, 0] + res["log_priors"]
    expect = np.array(
        [
            float(log_f(jnp.asarray(x)) + log_prior(jnp.asarray(x)))
            for x in s
        ]
    )
    assert np.allclose(total, expect, atol=1e-8)


def test_random_function_statistics():
    """Posterior draws have the predictive mean/variance (many-draw
    moment check; device _random_fns path)."""
    X, y = _data(11, N=25)
    gp = _mk(gpr)
    gp.update(
        X_new=X, y_new=y, hyp=np.array([[0.0, 0.0, 0.0, np.log(0.3), 0.2]])
    )
    xs = np.array([[0.5, -0.5], [2.0, 1.0]])
    mu, s2 = gp.predict(xs)
    np.random.seed(123)
    draws = np.concatenate(
        [gp.random_function(xs) for _ in range(400)], axis=1
    )
    assert np.all(np.abs(draws.mean(1) - mu.ravel()) < 4 * np.sqrt(s2.ravel() / 400) + 0.05)
    assert np.all(draws.var(1) / s2.ravel() > 0.7)
    assert np.all(draws.var(1) / s2.ravel() < 1.4)


def test_external_posterior_mutation_abi():
    """Writing posterior factors through the public true-size ABI (the
    reference's mutation style) still predicts correctly — the internal
    padded fast path falls back to the true-size views."""
    X, y = _data(12, N=30)
    gp = _mk(gpr)
    hyp = np.array([[0.0, 0.0, 0.0, np.log(0.1), 0.5]])
    gp.update(X_new=X, y_new=y, hyp=hyp)
    xs = np.random.default_rng(1).uniform(-3, 3, (9, 2))
    mu0, s20 = gp.predict(xs)

    p = gp.posteriors[0]
    # Round-trip the true-size factors through the public setters.
    p.alpha = np.asarray(p.alpha).copy()
    p.sW = np.asarray(p.sW).copy()
    p.L = np.asarray(p.L).copy()
    assert p._direct == {"alpha", "sW", "L"}
    mu1, s21 = gp.predict(xs)
    assert np.allclose(mu0, mu1, atol=1e-9)
    assert np.allclose(s20, s21, atol=1e-9)
    # quad consumes the mutated factors too.
    F0 = gp.quad(0.0, 0.5)
    gp2 = _mk(gpr)
    gp2.update(X_new=X, y_new=y, hyp=hyp)
    F1 = gp2.quad(0.0, 0.5)
    assert np.allclose(F0, F1, atol=1e-10)
    # A rank-1 update after external mutation falls back to a full
    # rebuild (correctness preserved).
    x_new = np.array([[0.3, -0.4]])
    y_new = np.array([[0.2]])
    gp.update(X_new=x_new, y_new=y_new)
    gp2.update(X_new=x_new, y_new=y_new)
    mu2, _ = gp.predict(xs)
    mu3, _ = gp2.predict(xs)
    assert np.allclose(mu2, mu3, atol=1e-7)


def test_pad_bucket_none_single_point_update():
    """pad_bucket=None disables bucketing; single-point updates still
    work (full rebuild path) and match the bucketed rank-1 GP."""
    X, y = _data(13, N=20)
    hyp = np.array([[0.1, -0.1, 0.2, np.log(0.2), 0.0]])
    g1 = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        pad_bucket=None,
    )
    g1.update(X_new=X, y_new=y, hyp=hyp)
    assert g1.posteriors[0].n_real is None
    g2 = _mk(gpr)  # default bucket 64
    g2.update(X_new=X, y_new=y, hyp=hyp)

    x_new = np.array([[0.5, 0.5]])
    y_new = np.array([[0.1]])
    g1.update(X_new=x_new, y_new=y_new)
    g2.update(X_new=x_new, y_new=y_new)
    xs = np.random.default_rng(2).uniform(-3, 3, (8, 2))
    mu1, s21 = g1.predict(xs)
    mu2, s22 = g2.predict(xs)
    assert np.allclose(mu1, mu2, atol=1e-8)
    assert np.allclose(s21, s22, atol=1e-8)


def test_stack_cache_seeded_at_finalize():
    """The batched factors built during posterior finalization must be
    reusable by the first predict without re-stacking (gp.py
    _finalize_posteriors seeds _stack_cache; _posterior_arrays hits it
    by row-view identity)."""
    rng = np.random.default_rng(0)
    X = rng.uniform(-3, 3, (24, 2))
    y = np.sin(np.sum(X, 1, keepdims=True))
    gp = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    hyp = np.tile(
        np.array([[0.1, -0.1, 0.2, -2.0, 0.0]]), (3, 1)
    ) + 0.01 * rng.normal(size=(3, 5))
    gp.update(X_new=X, y_new=y, hyp=hyp)

    cache = gp._stack_cache
    keys = {k[0] for k in cache}
    assert {"alpha", "sW", "L"} <= keys
    get_stacked, _, _, _ = gp._posterior_arrays()
    seeded = cache[("L", (0, 1, 2), True)][1]
    assert get_stacked("L", range(3)) is seeded
    # And prediction through the seeded stacks stays correct.
    mu, s2 = gp.predict(np.zeros((4, 2)))
    assert np.all(np.isfinite(mu)) and np.all(s2 >= 0)


def test_mixed_parametrization_single_program_matches_split():
    """Posterior samples with different L_chol parametrizations run
    through the mixed where-selected program (gp.py mixed_branch /
    _quad_fns.mixed_var_one / rank1 mixed_one); results must match the
    reference semantics for each sample independently."""
    rng = np.random.default_rng(8)
    X = rng.uniform(-3, 3, (30, 2))
    y = np.sin(np.sum(X, 1, keepdims=True))
    gp = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    # Noise hyps straddling the L_chol threshold sn2 >= 1e-6
    # (log sn: -2 -> sn2=e^-4 >= 1e-6; -9 -> sn2=e^-36 < 1e-6).
    hyp = np.array(
        [
            [0.1, -0.1, 0.2, -2.0, 0.0],
            [0.15, -0.05, 0.1, -9.0, 0.0],
        ]
    )
    gp.update(X_new=X, y_new=y, hyp=hyp)
    flags = [bool(p.L_chol) for p in gp.posteriors]
    assert flags == [True, False], flags

    xs = rng.uniform(-3, 3, (7, 2))
    mu_mixed, s2_mixed = gp.predict(xs, separate_samples=True)

    # Oracle: two single-sample GPs, one per parametrization.
    for s in range(2):
        solo = gpr.GP(
            D=2,
            covariance=gpr.covariance_functions.SquaredExponential(),
            mean=gpr.mean_functions.ConstantMean(),
            noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        )
        solo.update(X_new=X, y_new=y, hyp=hyp[s : s + 1])
        mu_s, s2_s = solo.predict(xs, separate_samples=True)
        np.testing.assert_allclose(
            mu_mixed[:, s], mu_s[:, 0], rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(
            s2_mixed[:, s], s2_s[:, 0], rtol=1e-6, atol=1e-9
        )

    # Quadrature through the mixed program vs solo GPs.
    mu_q = rng.uniform(-1, 1, (5, 2))
    sig_q = np.full((5, 2), 0.3)
    Fm, Vm = gp.quad(mu_q, sig_q, compute_var=True, separate_samples=True)
    for s in range(2):
        solo = gpr.GP(
            D=2,
            covariance=gpr.covariance_functions.SquaredExponential(),
            mean=gpr.mean_functions.ConstantMean(),
            noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        )
        solo.update(X_new=X, y_new=y, hyp=hyp[s : s + 1])
        Fs, Vs = solo.quad(
            mu_q, sig_q, compute_var=True, separate_samples=True
        )
        np.testing.assert_allclose(Fm[:, s], Fs[:, 0], rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(Vm[:, s], Vs[:, 0], rtol=1e-5, atol=1e-9)

    # Rank-1 update through the mixed program == full rebuild.
    x1 = rng.uniform(-3, 3, (1, 2))
    y1 = np.array([[0.3]])
    gp.update(X_new=x1, y_new=y1)
    mu_r1, s2_r1 = gp.predict(xs, separate_samples=True)
    ref = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    ref.update(
        X_new=np.concatenate([X, x1]),
        y_new=np.concatenate([y, y1]),
        hyp=hyp,
    )
    mu_ref, s2_ref = ref.predict(xs, separate_samples=True)
    # Sample 0 (moderate noise) must match tightly; sample 1 sits at
    # sn2 ~ 1e-16 where BOTH the reference's and our rank-1 update are
    # ill-conditioned (dividing by a ~0 predictive variance), so only
    # the stable sample is compared against the rebuild.
    np.testing.assert_allclose(
        mu_r1[:, 0], mu_ref[:, 0], rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        s2_r1[:, 0], s2_ref[:, 0], rtol=1e-4, atol=1e-8
    )


def test_stack_cache_dropped_on_rebuild_and_clean():
    """Stale stack-cache entries must not pin the previous factor set's
    device memory (code-review finding): the cache is replaced on every
    posterior rebuild and cleared by clean()."""
    rng = np.random.default_rng(1)
    X = rng.uniform(-3, 3, (20, 2))
    y = np.sin(np.sum(X, 1, keepdims=True))
    gp = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    hyp = np.array([[0.1, -0.1, 0.2, -2.0, 0.0]])
    gp.update(X_new=X, y_new=y, hyp=hyp)
    first = dict(gp._stack_cache)
    assert first  # seeded
    gp.update(hyp=hyp + 0.01, compute_posterior=True)  # rebuild
    second = gp._stack_cache
    # The dict was replaced wholesale; no entry from the first set
    # survives (the old stacked arrays are released).
    assert second is not first
    old_ids = {id(v[1]) for v in first.values()}
    new_ids = {id(v[1]) for v in second.values()}
    assert old_ids.isdisjoint(new_ids)
    gp.clean()
    assert gp._stack_cache == {}


def test_fused_fit_chunk_stable_within_bucket():
    """The fused design+optimize program's static chunk must not change
    as N grows within a pad bucket (code-review finding: a chunk tied
    to the true N recompiled fit()'s largest program every refit)."""
    from gpyreg_tpu.inference.map_optimize import _run_design_optimize

    rng = np.random.default_rng(2)
    gp = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        pad_bucket=64,
    )
    X = rng.uniform(-3, 3, (20, 2))
    y = np.sin(np.sum(X, 1, keepdims=True))
    opts = {"n_samples": 0, "opts_N": 2, "init_N": 32}
    gp.fit(X=X, y=y, options=opts)
    n_compiled = _run_design_optimize._cache_size()
    for _ in range(2):  # grow within the 64-bucket, refit warm
        Xn = rng.uniform(-3, 3, (5, 2))
        yn = np.sin(np.sum(Xn, 1, keepdims=True))
        gp.update(X_new=Xn, y_new=yn, compute_posterior=False)
        gp.fit(options=opts)
    assert _run_design_optimize._cache_size() == n_compiled
