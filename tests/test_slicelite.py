"""slicelite sampler: cold path (slice chain) + the warm-refit ESS
shortcut (MATLAB oracle gplite_train.m:178-197, 359-390): when the
previous hyperposterior samples still cover the new posterior
(importance-weight ESS fraction > 0.5), fit() skips design + MAP and
refreshes each previous sample with a few no-adapt slice sweeps.
"""

import numpy as np
import pytest

import gpyreg_tpu as gpr


def _make(seed=1234, n=30):
    np.random.seed(seed)
    gp = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    X = np.random.uniform(-3, 3, (n, 2))
    y = (np.sin(np.sum(X, 1)) + 0.1 * np.random.randn(n))[:, None]
    return gp, X, y


_OPTS = {"sampler": "slicelite", "n_samples": 6, "opts_N": 1, "init_N": 32}


def test_slicelite_cold_fit():
    gp, X, y = _make()
    hyp, opt_res, samp_res = gp.fit(X=X, y=y, options=dict(_OPTS))
    assert hyp.shape[0] == 6
    assert opt_res is not None  # full pipeline ran
    assert "ess_frac" not in samp_res
    # Warm state recorded for the next refit.
    assert gp._warm_hyp.shape == hyp.shape
    assert np.all(np.isfinite(gp._warm_logp))


def test_slicelite_warm_refit_shortcut():
    gp, X, y = _make()
    hyp1, _, _ = gp.fit(X=X, y=y, options=dict(_OPTS))
    # Refit on identical data: ESS fraction is ~1, the shortcut fires.
    hyp2, opt_res2, samp_res2 = gp.fit(X=X, y=y, options=dict(_OPTS))
    assert opt_res2 is None  # design + MAP skipped
    assert samp_res2["ess_frac"] > 0.5
    assert samp_res2["thin_eff"] >= 1
    assert hyp2.shape == hyp1.shape
    assert np.all(np.isfinite(samp_res2["f_vals"]))
    # The refreshed samples stay near the previous posterior mass.
    assert np.all(np.isfinite(hyp2))
    mu, s2 = gp.predict(np.random.uniform(-3, 3, (8, 2)))
    assert np.all(np.isfinite(mu)) and np.all(s2 > 0)
    # Timings record the skipped phases.
    assert gp.fit_timings["design_s"] == 0.0


def test_slicelite_warm_refit_grows_data():
    # The PyVBMC pattern: a few new points, posterior barely moves.
    gp, X, y = _make(n=40)
    gp.fit(X=X, y=y, options=dict(_OPTS))
    np.random.seed(77)
    Xn = np.vstack([X, np.random.uniform(-3, 3, (2, 2))])
    yn = np.vstack(
        [y, (np.sin(np.sum(Xn[-2:], 1)))[:, None]]
    )
    hyp, opt_res, samp_res = gp.fit(X=Xn, y=yn, options=dict(_OPTS))
    # With 2 extra points of 40 the overlap is typically high; either
    # branch must produce a healthy fit, and if the shortcut fired the
    # result must advertise it.
    if opt_res is None:
        assert samp_res["ess_frac"] > 0.5
    mu, s2 = gp.predict(Xn[:5])
    assert np.all(np.isfinite(mu)) and np.all(s2 > 0)


def test_slicelite_explicit_hyp0_logp():
    # Fresh object (the cross-object PyVBMC flow): previous samples and
    # their log posteriors passed explicitly.
    gp1, X, y = _make()
    hyp1, _, sr1 = gp1.fit(X=X, y=y, options=dict(_OPTS))
    logp1 = gp1._warm_logp  # the stored per-sample log posteriors

    gp2, _, _ = _make()
    opts = dict(_OPTS)
    opts["hyp0_logp"] = logp1
    hyp2, opt_res2, sr2 = gp2.fit(X=X, y=y, hyp0=hyp1, options=opts)
    assert opt_res2 is None
    assert sr2["ess_frac"] > 0.5
    assert hyp2.shape[0] == 6


def test_slicelite_low_ess_runs_full_pipeline():
    gp, X, y = _make()
    gp.fit(X=X, y=y, options=dict(_OPTS))
    # Replace the data wholesale: the old samples are a poor cover.
    np.random.seed(99)
    X2 = np.random.uniform(-3, 3, (30, 2))
    y2 = (5.0 * np.cos(2.0 * X2[:, 0] * X2[:, 1]))[:, None]
    hyp, opt_res, samp_res = gp.fit(X=X2, y=y2, options=dict(_OPTS))
    assert opt_res is not None
    assert "ess_frac" not in samp_res


def test_slicelite_logp_length_mismatch_raises():
    gp, X, y = _make()
    hyp1, _, _ = gp.fit(X=X, y=y, options=dict(_OPTS))
    opts = dict(_OPTS)
    opts["hyp0_logp"] = np.zeros(3)  # wrong length
    with pytest.raises(ValueError, match="hyp0_logp"):
        gp.fit(X=X, y=y, hyp0=hyp1, options=opts)


def test_slicelite_log_p_reference_alias():
    """The reference's option spelling "log_P" (gaussian_process.py:997,
    gplite LogP) works as an alias of hyp0_logp."""
    gp1, X, y = _make()
    hyp1, _, _ = gp1.fit(X=X, y=y, options=dict(_OPTS))
    logp1 = gp1._warm_logp

    gp2, _, _ = _make()
    opts = dict(_OPTS)
    opts["log_P"] = logp1
    hyp2, opt_res2, sr2 = gp2.fit(X=X, y=y, hyp0=hyp1, options=opts)
    assert opt_res2 is None
    assert sr2["ess_frac"] > 0.5


def test_slicelite_warm_refit_memory_groups(monkeypatch):
    """The warm-refit chains hit the same ~5x(B,N,N) live-copy HBM wall
    as fit(n_chains=...): s_N=8 at N=16384 f32 needs ~41 GB as one
    batch (measured compile-time OOM, round-4).  Forcing one-chain
    groups must produce the same-shaped, finite refit result."""
    import gpyreg_tpu.gp as gpmod

    gp, X, y = _make()
    hyp1, _, _ = gp.fit(X=X, y=y, options=dict(_OPTS))
    monkeypatch.setattr(
        gpmod, "_chain_batch_hbm_estimate", lambda *a, **k: 1e18
    )
    with pytest.warns(UserWarning, match="sequential groups"):
        hyp2, opt_res2, sr2 = gp.fit(X=X, y=y, options=dict(_OPTS))
    assert opt_res2 is None  # the shortcut still fired
    assert sr2["ess_frac"] > 0.5
    assert hyp2.shape == hyp1.shape
    assert np.all(np.isfinite(hyp2))
    assert np.all(np.isfinite(sr2["f_vals"]))
    mu, s2 = gp.predict(np.random.uniform(-3, 3, (8, 2)))
    assert np.all(np.isfinite(mu)) and np.all(s2 > 0)


def test_slicelite_shifted_data_scales_thin_eff():
    """The degradation path engages GRADUALLY (VERDICT r4 #5, the
    PyVBMC inner-loop pattern): identical data refreshes with
    thin_eff=1 (ESS ~ 1); a moderate data shift lowers the ESS
    fraction into (ess_thresh, 1) and scales thin_eff up by the
    documented formula (gplite_train.m:192-195); a wholesale shift
    falls back to the full pipeline."""
    opts = dict(_OPTS)
    opts["thin"] = 5

    # Identical data: full overlap, minimal refresh budget.
    gp, X, y = _make(n=40)
    gp.fit(X=X, y=y, options=dict(opts))
    _, o_i, s_i = gp.fit(X=X, y=y, options=dict(opts))
    assert o_i is None
    assert s_i["ess_frac"] > 0.95
    assert s_i["thin_eff"] == 1

    # Moderate shift (+4 of 40 points, 10%): the shortcut still fires
    # but with degraded ESS and a scaled-up refresh budget.
    gp2, _, _ = _make(n=40)
    gp2.fit(X=X, y=y, options=dict(opts))
    np.random.seed(504)
    Xn = np.vstack([X, np.random.uniform(-3, 3, (4, 2))])
    yn = np.vstack(
        [y, (np.sin(np.sum(Xn[-4:], 1)) + 0.1 * np.random.randn(4))[
            :, None
        ]]
    )
    _, o_s, s_s = gp2.fit(X=Xn, y=yn, options=dict(opts))
    assert o_s is None
    assert 0.5 < s_s["ess_frac"] < 0.95
    assert s_s["thin_eff"] > s_i["thin_eff"]
    # The budget matches the documented formula exactly.
    expected = max(
        1, round(5 * (1 - (s_s["ess_frac"] - 0.5) / 0.5))
    )
    assert s_s["thin_eff"] == expected

    # Wholesale shift: ESS collapses below threshold -> full pipeline
    # (covered in spirit by test_slicelite_low_ess_runs_full_pipeline;
    # asserted here to pin the three-regime progression in one place).
    gp3, _, _ = _make(n=40)
    gp3.fit(X=X, y=y, options=dict(opts))
    np.random.seed(99)
    X2 = np.random.uniform(-3, 3, (40, 2))
    y2 = (5.0 * np.cos(2.0 * X2[:, 0] * X2[:, 1]))[:, None]
    _, o_f, s_f = gp3.fit(X=X2, y=y2, options=dict(opts))
    assert o_f is not None
    assert "ess_frac" not in s_f
