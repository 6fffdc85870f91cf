"""GP-level CG/BBMM capability (VERDICT r2 item 3): the matrix-free
stack (ops/iterative.py) reachable from the public API via
``fit(options={"method": "cg"})`` and CG-backed ``predict``."""

import numpy as np
import pytest

import gpyreg_tpu as gpr


def _make_gp(D=2):
    return gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )


def _data(N=400, D=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, 1))[:, None] + 0.1 * rng.normal(size=(N, 1))
    return X, y


CG_OPTS = {
    "method": "cg",
    "n_samples": 0,  # cg is MAP-only; 0 acknowledges it (no warning)
    "cg_row_chunk": 128,
    "cg_tol": 1e-6,
    "cg_n_probes": 16,
    "cg_n_lanczos": 48,
    "cg_init_N": 8,  # small design keeps the CPU suite fast
}


def test_fit_cg_matches_exact_map():
    """CG MAP lands at (near) the exact MAP objective."""
    X, y = _data()
    gp_e = _make_gp()
    np.random.seed(0)
    hyp_e, res_e, _ = gp_e.fit(
        X=X, y=y, options={"n_samples": 0, "opts_N": 1, "init_N": 32}
    )
    gp_c = _make_gp()
    hyp_c, res_c, samp = gp_c.fit(
        X=X, y=y, options=dict(CG_OPTS, hyp0=None, opts_N=1)
    )
    assert samp is None
    assert hyp_c.shape == (1, hyp_e.shape[1])
    # Exact NLML at the CG optimum is within ~1% of the exact optimum
    # (the CG objective is an SLQ estimate; see tests/test_iterative.py).
    ll_exact_at_c = gp_e.log_likelihood(hyp_c[0])
    ll_exact_at_e = gp_e.log_likelihood(hyp_e[0])
    assert ll_exact_at_c > ll_exact_at_e - 0.02 * abs(ll_exact_at_e)


def test_cg_predict_matches_exact_at_same_hyp():
    X, y = _data()
    gp_c = _make_gp()
    hyp_c, _, _ = gp_c.fit(X=X, y=y, options=dict(CG_OPTS))
    assert gp_c.posteriors[0].matrix_free
    assert gp_c.posteriors[0].L is None

    # Exact GP at the same hyperparameters.
    gp_e = _make_gp()
    gp_e.X, gp_e.y = X, y
    gp_e.update(hyp=hyp_c)

    rng = np.random.default_rng(1)
    xs = rng.uniform(-3, 3, (50, 2))
    mu_c, s2_c = gp_c.predict(xs)
    mu_e, s2_e = gp_e.predict(xs)
    assert np.max(np.abs(mu_c - mu_e)) < 1e-5
    assert np.max(np.abs(s2_c - s2_e)) < 1e-5
    # add_noise flows through the shared noise machinery.
    mu_cn, s2_cn = gp_c.predict(xs, add_noise=True)
    mu_en, s2_en = gp_e.predict(xs, add_noise=True)
    assert np.max(np.abs(s2_cn - s2_en)) < 1e-5

    # The cached alpha makes repeat serving deterministic and cheap.
    mu_c2, s2_c2 = gp_c.predict(xs)
    assert np.array_equal(mu_c, mu_c2)
    assert gp_c.posteriors[0]._alpha is not None


def test_cg_update_with_new_data():
    X, y = _data(N=300)
    gp_c = _make_gp()
    hyp_c, _, _ = gp_c.fit(X=X, y=y, options=dict(CG_OPTS))
    X2, y2 = _data(N=40, seed=3)
    gp_c.update(X_new=X2, y_new=y2)
    assert gp_c.X.shape[0] == 340
    assert gp_c.posteriors[0].matrix_free
    xs = X2[:10]
    mu, s2 = gp_c.predict(xs)

    gp_e = _make_gp()
    gp_e.X, gp_e.y = gp_c.X, gp_c.y
    gp_e.update(hyp=hyp_c)
    mu_e, s2_e = gp_e.predict(xs)
    assert np.max(np.abs(mu - mu_e)) < 1e-5
    assert np.max(np.abs(s2 - s2_e)) < 1e-5


def test_cg_guards_and_method_validation():
    X, y = _data(N=200)
    gp_c = _make_gp()
    gp_c.fit(X=X, y=y, options=dict(CG_OPTS))
    with pytest.raises(ValueError, match="matrix-free"):
        gp_c.quad(np.zeros((1, 2)), np.ones((1, 2)))
    with pytest.raises(ValueError, match="matrix-free"):
        gp_c.predict_full(np.zeros((3, 2)))
    with pytest.raises(ValueError, match="matrix-free"):
        gp_c.random_function(np.zeros((3, 2)))
    with pytest.raises(ValueError, match="Unknown fit method"):
        gp_c.fit(X=X, y=y, options={"method": "nope"})


def test_auto_dispatch_small_n_stays_exact():
    X, y = _data(N=120)
    gp = _make_gp()
    np.random.seed(0)
    gp.fit(
        X=X,
        y=y,
        options={"method": "auto", "n_samples": 0, "opts_N": 1,
                 "init_N": 16},
    )
    assert not gp.posteriors[0].matrix_free
    assert gp.posteriors[0].L is not None


def test_exact_refit_resets_cg_mode():
    X, y = _data(N=150)
    gp = _make_gp()
    gp.fit(X=X, y=y, options=dict(CG_OPTS))
    assert gp._infer_method == "cg"
    np.random.seed(0)
    gp.fit(
        X=X, y=y,
        options={"n_samples": 0, "opts_N": 1, "init_N": 16},
    )
    assert gp._infer_method == "exact"
    assert not gp.posteriors[0].matrix_free


def test_cg_save_load_roundtrip(tmp_path):
    X, y = _data(N=200)
    gp = _make_gp()
    gp.fit(X=X, y=y, options=dict(CG_OPTS))
    rng = np.random.default_rng(4)
    xs = rng.uniform(-3, 3, (20, 2))
    mu0, s20 = gp.predict(xs)
    gp.save(tmp_path / "gp_cg.npz")
    gp2 = gpr.GP.load(tmp_path / "gp_cg.npz")
    assert gp2._infer_method == "cg"
    assert gp2.posteriors[0].matrix_free
    mu1, s21 = gp2.predict(xs)
    # CG-tolerance-limited equality: the loaded GP re-solves its weight
    # vector from scratch (factors are never serialized).
    assert np.max(np.abs(mu0 - mu1)) < 1e-4
    assert np.max(np.abs(s20 - s21)) < 1e-4


def test_cg_save_load_before_first_predict(tmp_path):
    """A CG fit saved BEFORE any predict must load as a matrix-free GP
    whose predict serves via CG.  (The .npz has_factors flag is False
    in this state — the lazy CG weight vector was never solved — and a
    load keyed on it alone would rebuild factor-less exact posteriors
    that crash in predict.)"""
    X, y = _data(N=200)
    gp = _make_gp()
    gp.fit(X=X, y=y, options=dict(CG_OPTS))
    gp.save(tmp_path / "gp_cg_fresh.npz")
    rng = np.random.default_rng(5)
    xs = rng.uniform(-3, 3, (20, 2))
    mu0, s20 = gp.predict(xs)
    gp2 = gpr.GP.load(tmp_path / "gp_cg_fresh.npz")
    assert gp2.posteriors[0].matrix_free
    mu1, s21 = gp2.predict(xs)
    assert np.max(np.abs(mu0 - mu1)) < 1e-4
    assert np.max(np.abs(s20 - s21)) < 1e-4


def test_cg_default_n_samples_downgrade_warns():
    """method='cg' with the DEFAULT n_samples (10) must not silently
    return a single MAP sample: the downgrade is warned about."""
    X, y = _data(N=200)
    gp = _make_gp()
    opts = {k: v for k, v in CG_OPTS.items() if k != "n_samples"}
    with pytest.warns(UserWarning, match="explicit request"):
        gp.fit(X=X, y=y, options=opts)


def test_cg_fixed_probe_hyperposterior_sampling():
    """fit(method='cg', n_samples=S) samples the fixed-probe surrogate
    hyperposterior (frozen SLQ/Hutchinson probe key -> deterministic
    chain target) and stores S matrix-free posteriors whose mixture
    prediction serves through the CG path."""
    X, y = _data(N=150)
    gp = _make_gp()
    gp.set_priors({
        "covariance_log_lengthscale": ("gaussian", (0.0, 1.0)),
        "covariance_log_outputscale": ("gaussian", (0.0, 1.0)),
        "noise_log_scale": ("gaussian", (-2.0, 1.0)),
        "mean_const": ("gaussian", (0.0, 2.0)),
    })
    np.random.seed(5)
    hyp, res, sr = gp.fit(
        X=X, y=y,
        options=dict(CG_OPTS, n_samples=3, thin=2, burn=4),
    )
    assert hyp.shape[0] == 3
    assert sr is not None
    assert np.all(np.isfinite(sr["f_vals"]))
    assert np.any(np.asarray(sr["log_priors"]) != 0.0)
    assert len(gp.posteriors) == 3
    assert all(p.matrix_free for p in gp.posteriors)

    xs = np.random.uniform(-3, 3, (12, 2))
    mu, s2 = gp.predict(xs)
    assert mu.shape == (12, 1) and np.all(np.isfinite(mu))
    assert np.all(s2 >= 0)

    # The frozen-probe target is deterministic: two evaluations of the
    # chain's log posterior at the same hyp agree exactly.
    from gpyreg_tpu.ops import iterative as _it
    import jax
    spec = gp._spec()
    _, _, _, _, pack = gp._device()
    log_f, _ = _it.cg_log_post_raw(
        spec, 1e-5, 1024, 500, 8, 32, False, pack is not None
    )
    key = jax.random.key(0)
    args = (np.asarray(X), np.asarray(y), pack, key)
    v1 = float(jax.jit(log_f, static_argnums=())(hyp[0], *args))
    v2 = float(jax.jit(log_f)(hyp[0], *args))
    assert v1 == v2


def test_cg_multisample_save_load_roundtrip(tmp_path):
    """S fixed-probe hyperposterior samples survive save/load as S
    matrix-free posteriors whose CG mixture prediction matches the
    pre-save GP to CG tolerance."""
    X, y = _data(N=150)
    gp = _make_gp()
    np.random.seed(8)
    gp.fit(
        X=X, y=y,
        options=dict(CG_OPTS, n_samples=3, thin=2, burn=4),
    )
    assert len(gp.posteriors) == 3
    rng = np.random.default_rng(9)
    xs = rng.uniform(-3, 3, (15, 2))
    mu0, s20 = gp.predict(xs)
    gp.save(tmp_path / "gp_cg_multi.npz")
    gp2 = gpr.GP.load(tmp_path / "gp_cg_multi.npz")
    assert len(gp2.posteriors) == 3
    assert all(p.matrix_free for p in gp2.posteriors)
    mu1, s21 = gp2.predict(xs)
    assert np.max(np.abs(mu0 - mu1)) < 1e-4
    assert np.max(np.abs(s20 - s21)) < 1e-4


def test_cg_sampling_zero_width_dimension():
    """A dimension whose plausible bounds clamp together (PLB == PUB
    inside a user LB < UB window) must not abort the fixed-probe chain
    after the expensive MAP phase: the CG path repairs zero widths the
    way the exact path does."""
    X, y = _data(N=120)
    gp = _make_gp()
    # y is O(1): a [100, 110] mean_const window clamps the recommended
    # plausible range to the single point 100 -> slice width 0 before
    # the repair, while LB=100 < UB=110 keeps the dimension free.
    gp.set_bounds({
        "covariance_log_lengthscale": None,
        "covariance_log_outputscale": None,
        "noise_log_scale": None,
        "mean_const": (100.0, 110.0),
    })
    np.random.seed(11)
    hyp, _res, sr = gp.fit(
        X=X, y=y, options=dict(CG_OPTS, n_samples=2, thin=1, burn=2)
    )
    assert hyp.shape[0] == 2
    assert np.all(hyp[:, -1] >= 100.0) and np.all(hyp[:, -1] <= 110.0)
    assert sr is not None and np.all(np.isfinite(sr["f_vals"]))


def test_cg_sampling_segment_gate(monkeypatch):
    """Matrix-free chains engage one-MOVE-per-dispatch segmentation at
    _CG_SAMPLE_SEG_MIN_N — far below the Cholesky paths' SEG_MIN_N,
    because every chain evaluation is a full CG+SLQ program (at 65k
    even a one-SWEEP dispatch crossed the TPU ~6-min watchdog; a move
    is the only unit with a bounded eval count).  Chain-law parity of
    the move-segmented driver is pinned at the device_slice level
    (tests/test_device_slice.py moveseg tests); through a CG target
    exact bit parity with the monolithic program is not a JAX
    guarantee (per-program FMA/reassociation in the iterative solves),
    so here: gate plumbing + finite, same-shaped results."""
    from gpyreg_tpu import gp as gp_mod
    from gpyreg_tpu.inference import device_slice

    seen = {}
    real = device_slice.sample

    def spy(*a, **k):
        seen["seg"] = k.get("seg_moves")
        return real(*a, **k)

    monkeypatch.setattr(device_slice, "sample", spy)

    X, y = _data(N=120)
    sample_opts = dict(
        CG_OPTS, n_samples=2, thin=1, burn=2, cg_sample_max_shrink=256
    )

    # Above the gate: one coordinate move per dispatch.
    monkeypatch.setattr(gp_mod, "_CG_SAMPLE_SEG_MIN_N", 64)
    gp = _make_gp()
    np.random.seed(12)
    hyp_seg, _res, _sr = gp.fit(X=X, y=y, options=dict(sample_opts))
    assert seen["seg"] == 1

    # Below the gate: the monolithic chain program.
    monkeypatch.setattr(gp_mod, "_CG_SAMPLE_SEG_MIN_N", 10_000)
    gp2 = _make_gp()
    np.random.seed(12)
    hyp_mono, _res, _sr = gp2.fit(X=X, y=y, options=dict(sample_opts))
    assert seen["seg"] is None
    assert hyp_seg.shape == hyp_mono.shape
    assert np.all(np.isfinite(hyp_seg)) and np.all(np.isfinite(hyp_mono))
    # Both chains started at (near) the same MAP point; same law, so
    # the samples live in the same posterior region.
    assert np.max(np.abs(hyp_seg - hyp_mono)) < 1.0


def test_cg_sample_budget_options(monkeypatch):
    """``cg_sample_tol`` / ``cg_sample_max_iter`` tune the CHAIN's
    per-eval CG budget independently of the fit's, and segmented
    chains default to a bounded shrink loop (48) — at very large N a
    tight-CG sweep cannot fit a watchdog-safe dispatch (the 65k part-A
    run died on the ~6-min device-time kill until these knobs)."""
    from gpyreg_tpu import gp as gp_mod
    from gpyreg_tpu.inference import device_slice
    from gpyreg_tpu.ops import iterative

    seen = {}
    real_raw = iterative.cg_log_post_raw
    real_sample = device_slice.sample

    def spy_raw(spec, tol, row_chunk, max_iter, *a, **k):
        seen["tol"], seen["max_iter"] = tol, max_iter
        return real_raw(spec, tol, row_chunk, max_iter, *a, **k)

    def spy_sample(*a, **k):
        seen["max_shrink"] = k.get("max_shrink")
        return real_sample(*a, **k)

    monkeypatch.setattr(iterative, "cg_log_post_raw", spy_raw)
    monkeypatch.setattr(device_slice, "sample", spy_sample)

    X, y = _data(N=120)
    opts = dict(
        CG_OPTS,
        n_samples=2,
        thin=1,
        burn=2,
        cg_sample_tol=1e-2,
        cg_sample_max_iter=7,
    )
    # Segmented (gate forced low): bounded shrink default.
    monkeypatch.setattr(gp_mod, "_CG_SAMPLE_SEG_MIN_N", 64)
    gp = _make_gp()
    np.random.seed(3)
    hyp, _res, _sr = gp.fit(X=X, y=y, options=dict(opts))
    assert seen["tol"] == 1e-2 and seen["max_iter"] == 7
    assert seen["max_shrink"] == 48
    assert np.all(np.isfinite(hyp))

    # Unsegmented: the 256 safety default (and fit-budget fallbacks).
    monkeypatch.setattr(gp_mod, "_CG_SAMPLE_SEG_MIN_N", 10_000)
    del opts["cg_sample_tol"], opts["cg_sample_max_iter"]
    gp2 = _make_gp()
    np.random.seed(3)
    gp2.fit(X=X, y=y, options=dict(opts))
    assert seen["tol"] == CG_OPTS["cg_tol"]
    assert seen["max_shrink"] == 256


def test_cg_sampling_host_driver(monkeypatch):
    """Above _CG_SAMPLE_HOST_MIN_N (or on cg_sample_driver='host') the
    fixed-probe chain is driven from the HOST at one EVALUATION per
    dispatch: move-granularity segments bound a dispatch's eval count
    but not its device time, and at 65k a single wide-interval burn-in
    move crossed the ~6-min TPU watchdog (r4, third crash).  The
    reference-parity SliceSampler drives the jitted CG+SLQ
    log-posterior; the device sampler must NOT be called, and the
    result keeps the sampling_result contract."""
    from gpyreg_tpu import gp as gp_mod
    from gpyreg_tpu.inference import device_slice

    calls = {"device": 0}
    real = device_slice.sample

    def spy(*a, **k):
        calls["device"] += 1
        return real(*a, **k)

    monkeypatch.setattr(device_slice, "sample", spy)

    X, y = _data(N=120)
    opts = dict(
        CG_OPTS, n_samples=2, thin=1, burn=2, cg_sample_driver="host"
    )
    gp = _make_gp()
    np.random.seed(7)
    hyp, _res, sr = gp.fit(X=X, y=y, options=dict(opts))
    assert calls["device"] == 0
    assert hyp.shape == (2, gp._spec().hyp_N)
    assert np.all(np.isfinite(hyp))
    for field in ("samples", "f_vals", "exit_flag", "log_priors"):
        assert field in sr
    assert np.all(np.isfinite(sr["f_vals"]))
    # The posterior store took the host-driven samples.
    mu, s2 = gp.predict(X[:16])
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(s2))

    # The auto gate selects the host driver purely on N.
    monkeypatch.setattr(gp_mod, "_CG_SAMPLE_HOST_MIN_N", 64)
    del opts["cg_sample_driver"]
    gp2 = _make_gp()
    np.random.seed(7)
    hyp2, _res, _sr = gp2.fit(X=X, y=y, options=dict(opts))
    assert calls["device"] == 0
    assert np.all(np.isfinite(hyp2))
    # Same law as the device chain: samples stay in the MAP region.
    assert np.max(np.abs(hyp2 - hyp)) < 1.0

    # And cg_sample_driver='device' forces the device tiers back on.
    gp3 = _make_gp()
    np.random.seed(7)
    gp3.fit(
        X=X, y=y, options=dict(opts, cg_sample_driver="device")
    )
    assert calls["device"] == 1
