"""Segmented (bounded-dispatch) fit/sampler paths match the monolithic
one-dispatch programs.

The TPU runtime kills any single dispatch whose device execution runs
longer than ~6 minutes, so above ``map_optimize.SEG_MIN_N`` padded rows
the fused design+multistart program and the device slice chain split
into bounded dispatches with device-carried state (map_optimize.py
`_design_optimize_segmented`, device_slice.py `_run_chain_segmented`).
These tests force the segmented paths at small N on CPU and check they
reproduce the monolithic results (exactly for the optimizer; to ULP
tolerance for the chain, where XLA may reassociate the density across
the different program boundaries).
"""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gpyreg_tpu as gpr


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_state():
    """Drop every compiled executable before this module's compiles.

    The segmented-chain programs are the largest XLA CPU compiles in the
    suite; run late (alphabetical order) after ~300 tests' executables
    have accumulated, LLVM's in-process JIT has intermittently
    segfaulted inside backend_compile (observed twice, different tests,
    never reproducible standalone).  Clearing JAX's executable caches
    first gives the compiler a clean arena; everything recompiles on
    demand."""
    jax.clear_caches()
    yield
from gpyreg_tpu.inference import device_slice as ds
from gpyreg_tpu.inference import map_optimize as mo


def _make_gp():
    return gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )


def _problem():
    rng = np.random.default_rng(7)
    X = rng.uniform(-3, 3, (40, 2))
    y = np.sin(X).sum(1, keepdims=True) + 0.1 * rng.standard_normal(
        (40, 1)
    )
    return X, y


def _captured_design_optimize_args():
    """Run one fit capturing design_optimize's exact inputs, so both
    paths can be compared on identical data (the design RNG is
    stateful across fits)."""
    X, y = _problem()
    gp = _make_gp()
    captured = {}
    orig = mo.design_optimize

    def capture(obj_raw, design, LB, UB, f_args, **kw):
        captured.update(
            obj_raw=obj_raw,
            design=np.array(design),
            LB=np.array(LB),
            UB=np.array(UB),
            f_args=f_args,
            kw=kw,
        )
        return orig(obj_raw, design, LB, UB, f_args, **kw)

    mo.design_optimize = capture
    try:
        gp.fit(
            X=X, y=y, options={"n_samples": 0, "opts_N": 2, "init_N": 32}
        )
    finally:
        mo.design_optimize = orig
    return captured


class TestSegmentedDesignOptimize:
    def test_matches_fused_path(self):
        cap = _captured_design_optimize_args()
        kw = dict(cap["kw"])
        kw.pop("segments", None)
        fused = mo.design_optimize(
            cap["obj_raw"],
            cap["design"],
            cap["LB"],
            cap["UB"],
            cap["f_args"],
            **kw,
        )
        for segments in [(8, 7), (1, 1), (1000, 1000)]:
            seg = mo.design_optimize(
                cap["obj_raw"],
                cap["design"],
                cap["LB"],
                cap["UB"],
                cap["f_args"],
                **kw,
                segments=segments,
            )
            # Optimized points, objective values, sorted candidate pool.
            np.testing.assert_array_equal(
                np.asarray(fused[0]), np.asarray(seg[0])
            )
            np.testing.assert_array_equal(
                np.asarray(fused[1]), np.asarray(seg[1])
            )
            # widths_default: jnp.std vs np.std differ at ULP level.
            np.testing.assert_allclose(
                np.asarray(fused[3]), np.asarray(seg[3]), atol=1e-12
            )
            np.testing.assert_array_equal(
                np.asarray(fused[4]), np.asarray(seg[4])
            )
            np.testing.assert_array_equal(
                np.asarray(fused[5]), np.asarray(seg[5])
            )

    def test_segment_plan_gates_on_n(self):
        assert mo.segment_plan(mo.SEG_MIN_N - 1, 1024, 3, 500) is None
        plan = mo.segment_plan(16384, 1024, 3, 500)
        assert plan is not None
        design_seg, iter_seg = plan
        assert 1 <= design_seg <= 1024
        assert 1 <= iter_seg <= 500
        # Budgets shrink as N grows.
        d2, i2 = mo.segment_plan(32768, 1024, 3, 500)
        assert d2 <= design_seg and i2 <= iter_seg
        assert mo.sweep_segment_plan(mo.SEG_MIN_N - 1, 13) is None
        assert 1 <= mo.sweep_segment_plan(16384, 13) <= 512


def _logf():
    def log_f(x):
        return -0.5 * jnp.sum(x**2) - 0.1 * jnp.sum(x**4)

    return log_f


class TestSegmentedChain:
    def test_matches_monolithic(self):
        log_f = _logf()
        key = jax.random.key(42)
        x0 = np.array([0.5, -0.3, 1.2])
        kw = dict(
            widths=np.array([1.0, 2.0, 0.5]),
            LB=np.full(3, -5.0),
            UB=np.full(3, 5.0),
            n_samples=20,
            thin=2,
            burn=7,
            diagnostics=False,
        )
        r1, st1 = ds.sample(log_f, x0, key, **kw)
        for seg in (1, 3, 100):
            r2, st2 = ds.sample(log_f, x0, key, **kw, seg_sweeps=seg)
            np.testing.assert_allclose(
                r1["samples"], r2["samples"], rtol=0, atol=1e-12
            )
            np.testing.assert_allclose(
                r1["f_vals"], r2["f_vals"], rtol=0, atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(st1.x), np.asarray(st2.x), atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(st1.widths), np.asarray(st2.widths), atol=1e-12
            )
            # The PRNG stream advanced identically (exact: key splits
            # are integer ops).
            np.testing.assert_array_equal(
                np.asarray(jax.random.key_data(st1.key)),
                np.asarray(jax.random.key_data(st2.key)),
            )

    def test_with_prior_and_step_out(self):
        log_f = _logf()

        def log_prior(x):
            return -0.05 * jnp.sum(jnp.abs(x))

        key = jax.random.key(3)
        x0 = np.zeros(2)
        kw = dict(
            widths=np.array([1.0, 1.5]),
            LB=np.full(2, -4.0),
            UB=np.full(2, 4.0),
            n_samples=12,
            thin=1,
            burn=4,
            diagnostics=False,
            log_prior=log_prior,
            step_out=True,
        )
        r1, _ = ds.sample(log_f, x0, key, **kw)
        r2, _ = ds.sample(log_f, x0, key, **kw, seg_sweeps=5)
        np.testing.assert_allclose(
            r1["samples"], r2["samples"], atol=1e-12
        )
        np.testing.assert_allclose(
            r1["log_priors"], r2["log_priors"], atol=1e-12
        )

    def test_ragged_totals_share_one_program_per_phase(self):
        """Totals that don't divide the segment size must NOT compile
        extra _chain_seg shapes: the tail overshoot is masked by the
        traced ``limit`` (PRNG-preserving no-op sweeps), never re-shaped
        — each extra shape is a minutes-long remote compile at 16k."""
        jax.clear_caches()
        log_f = _logf()
        key = jax.random.key(5)
        kw = dict(
            widths=np.ones(2),
            LB=np.full(2, -4.0),
            UB=np.full(2, 4.0),
            n_samples=7,
            thin=3,
            burn=7,  # ragged: 7 % 5 != 0, eff_N=19 % 5 != 0
            diagnostics=False,
        )
        r1, _ = ds.sample(log_f, np.zeros(2), key, **kw)

        class _CompileCounter(logging.Handler):
            def __init__(self):
                super().__init__()
                self.n = 0

            def emit(self, record):
                msg = record.getMessage()
                if "Compiling" in msg and "_chain_seg" in msg:
                    self.n += 1

        counter = _CompileCounter()
        logger = logging.getLogger("jax._src.interpreters.pxla")
        logger.addHandler(counter)
        old_level = logger.level
        logger.setLevel(logging.WARNING)
        jax.config.update("jax_log_compiles", True)
        try:
            r2, _ = ds.sample(
                log_f, np.zeros(2), key, **kw, seg_sweeps=5
            )
        finally:
            jax.config.update("jax_log_compiles", False)
            logger.removeHandler(counter)
            logger.setLevel(old_level)
        np.testing.assert_allclose(r1["samples"], r2["samples"], atol=1e-12)
        # one burn program + one collect program, nothing for the tails
        assert counter.n == 2, f"expected 2 _chain_seg compiles, got {counter.n}"

    def test_sample_chains_segmented(self):
        log_f = _logf()
        key = jax.random.key(11)
        x0s = np.tile(np.array([0.5, -0.3, 1.2]), (4, 1))
        kw = dict(
            widths=np.array([1.0, 2.0, 0.5]),
            LB=np.full(3, -5.0),
            UB=np.full(3, 5.0),
            n_samples=10,
            burn=4,
        )
        xa, fa = ds.sample_chains(log_f, x0s, key, **kw)
        xb, fb = ds.sample_chains(log_f, x0s, key, **kw, seg_sweeps=3)
        np.testing.assert_allclose(np.asarray(xa), xb, atol=1e-12)
        np.testing.assert_allclose(np.asarray(fa), fb, atol=1e-12)


class TestSegmentedMala:
    def test_matches_monolithic(self):
        from gpyreg_tpu.inference import mala

        log_f = _logf()
        key = jax.random.key(7)
        x0 = np.array([0.5, -0.3, 1.2])
        kw = dict(
            widths=np.array([1.0, 2.0, 0.5]),
            LB=np.full(3, -5.0),
            UB=np.full(3, 5.0),
            n_samples=20,
            thin=2,
            burn=11,
            diagnostics=False,
        )
        r1, p1 = mala.sample(log_f, x0, key, **kw)
        for seg in (1, 7, 13, 1000):
            r2, p2 = mala.sample(log_f, x0, key, **kw, seg_iters=seg)
            np.testing.assert_allclose(
                r1["samples"], r2["samples"], atol=1e-12
            )
            np.testing.assert_allclose(
                r1["f_vals"], r2["f_vals"], atol=1e-12
            )
            assert r1["accept_rate"] == r2["accept_rate"]
            np.testing.assert_allclose(p1, p2, atol=1e-12)

    def test_with_prior(self):
        from gpyreg_tpu.inference import mala

        log_f = _logf()

        def lp(x):
            return -0.05 * jnp.sum(jnp.abs(x))

        key = jax.random.key(8)
        x0 = np.zeros(2)
        kw = dict(
            LB=np.full(2, -4.0),
            UB=np.full(2, 4.0),
            n_samples=15,
            burn=6,
            diagnostics=False,
            log_prior=lambda h: lp(h),
        )
        r1, _ = mala.sample(log_f, x0, key, **kw)
        r2, _ = mala.sample(log_f, x0, key, **kw, seg_iters=9)
        np.testing.assert_allclose(
            r1["samples"], r2["samples"], atol=1e-12
        )
        np.testing.assert_allclose(
            r1["log_priors"], r2["log_priors"], atol=1e-12
        )


class TestSegmentedEnsembleSlice:
    def test_matches_monolithic(self):
        from gpyreg_tpu.inference import ensemble_slice as eis

        log_f = _logf()
        key = jax.random.key(9)
        x0 = np.array([0.5, -0.3, 1.2])
        kw = dict(
            widths=np.ones(3),
            LB=np.full(3, -5.0),
            UB=np.full(3, 5.0),
            n_samples=24,
            thin=2,
            burn=5,
            diagnostics=False,
        )
        r1, w1 = eis.sample(log_f, x0, key, **kw)
        for seg in (1, 3, 1000):
            r2, w2 = eis.sample(log_f, x0, key, **kw, seg_iters=seg)
            np.testing.assert_allclose(
                r1["samples"], r2["samples"], atol=1e-12
            )
            np.testing.assert_allclose(
                r1["f_vals"], r2["f_vals"], atol=1e-12
            )
            np.testing.assert_allclose(w1, w2, atol=1e-12)


class TestSegmentedFitEndToEnd:
    def test_gp_fit_forced_segmentation(self):
        """Full GP.fit (MAP + MCMC) with segmentation forced matches
        the monolithic fit when all RNG streams are pinned."""
        X, y = _problem()

        def fit_once():
            np.random.seed(1234)
            gp = _make_gp()
            gp.fit(
                X=X,
                y=y,
                options={"n_samples": 6, "opts_N": 2, "init_N": 32},
            )
            return np.asarray(gp.get_hyperparameters(as_array=True))

        h_mono = fit_once()
        orig_plan = mo.segment_plan
        orig_sweep = mo.sweep_segment_plan
        mo.segment_plan = lambda nr, B0, opts_N, max_iter, **kw: (8, 7)
        mo.sweep_segment_plan = lambda nr, n_dims: 2
        try:
            h_seg = fit_once()
        finally:
            mo.segment_plan = orig_plan
            mo.sweep_segment_plan = orig_sweep
        np.testing.assert_allclose(h_mono, h_seg, atol=1e-8)

    def test_gp_fit_forced_segmentation_with_mesh(self):
        """GP(mesh=...) must STILL segment above SEG_MIN_N (the
        watchdog applies regardless of sharding): the sharded
        segmented fit's MAP phase matches the mesh-less segmented fit.
        Only the MAP phase is compared — the mesh-less and mesh MCMC
        paths draw different streams by construction."""
        from gpyreg_tpu.parallel import mesh as pmesh

        X, y = _problem()

        def fit_once(mesh):
            np.random.seed(1234)
            gp = gpr.GP(
                D=2,
                covariance=gpr.covariance_functions.SquaredExponential(),
                mean=gpr.mean_functions.ConstantMean(),
                noise=gpr.noise_functions.GaussianNoise(constant_add=True),
                mesh=mesh,
            )
            gp.fit(
                X=X,
                y=y,
                options={"n_samples": 0, "opts_N": 2, "init_N": 32},
            )
            return np.asarray(gp.get_hyperparameters(as_array=True))

        orig_plan = mo.segment_plan
        mo.segment_plan = lambda nr, B0, opts_N, max_iter, **kw: (8, 7)
        try:
            h_seg = fit_once(None)
            h_seg_mesh = fit_once(pmesh.make_mesh(8))
        finally:
            mo.segment_plan = orig_plan
        np.testing.assert_allclose(h_seg, h_seg_mesh, rtol=1e-7)


def test_chain_protocol_change_compile_reuse():
    """A chain protocol change (burn / chain_thin) at fixed B must
    REUSE the compiled segment programs (VERDICT r4 #7): the phase
    totals enter the per-dispatch program as TRACED args (limit / i0)
    and the sweeps-per-dispatch budget depends only on (nr, n_dims,
    B), so only the small kept-draw pack program (static thin, new
    eff_N shape) may recompile.  Guards the minutes-scale remote
    recompile bill a 16k protocol change would otherwise pay."""
    from gpyreg_tpu import _compile_log

    orig_min = mo.SEG_MIN_N
    mo.SEG_MIN_N = 1  # force the segmented chain path at small N
    try:
        X, y = _problem()
        np.random.seed(99)
        gp = _make_gp()
        opts = {
            "n_samples": 4,
            "thin": 2,
            "burn": 4,
            "opts_N": 1,
            "init_N": 16,
            "n_chains": 2,
        }
        gp.fit(X=X, y=y, options=opts)
        n_cold = gp.fit_timings["n_compiles"]
        assert n_cold > 0  # the cold fit really compiled programs

        # Protocol change at fixed B: longer burn + in-chain thinning.
        gp.fit(options={**opts, "burn": 8, "chain_thin": 2})
        n_warm = gp.fit_timings["n_compiles"]
        assert n_warm <= 4, (
            f"protocol change recompiled {n_warm} programs "
            f"(cold: {n_cold}) — segment-program reuse broken"
        )
    finally:
        mo.SEG_MIN_N = orig_min


def test_chain_group_override_sequential_chains():
    """``chain_group=1`` runs the B chains as sequential single-chain
    groups (the fastest single-chip plan at compute-saturating N —
    see inference.sampling.chain_group_plan): same public contract,
    valid cross-chain diagnostics, B distinct chains."""
    mo_orig = mo.SEG_MIN_N
    mo.SEG_MIN_N = 1
    try:
        X, y = _problem()
        np.random.seed(123)
        gp = _make_gp()
        opts = {
            "n_samples": 6,
            "thin": 2,
            "burn": 6,
            "opts_N": 1,
            "init_N": 16,
            "n_chains": 3,
            "chain_group": 1,
        }
        hyp, _, sr = gp.fit(X=X, y=y, options=opts)
        assert hyp.shape[0] == 6
        assert sr["n_chains"] == 3
        assert sr["R"] is not None and sr["R"].shape == (5,)
        assert np.all(np.isfinite(sr["R"]))
        # Groups of one chain each: the chains are genuinely distinct
        # (independent keys), so the pooled draws are not degenerate.
        assert np.std(np.asarray(hyp), axis=0).max() > 0
    finally:
        mo.SEG_MIN_N = mo_orig


def test_sample_width_base_false_drops_floor():
    """``width_base=False`` removes the end-of-burn geometric floor:
    the adapted widths land at 5*std of the burn window instead of
    max(5*std, sqrt(5*std*base)) (reference slice_sample.py:535-543),
    and the chain stays a valid sampler of the target."""
    log_f = lambda x: -0.5 * jnp.sum((x / 0.05) ** 2)  # sigma=0.05
    key = jax.random.key(11)
    wide = np.array([10.0, 10.0])  # caller widths >> posterior scale
    _, st_base = ds.sample(
        log_f, np.zeros(2), key, widths=wide, n_samples=50, burn=100
    )
    _, st_free = ds.sample(
        log_f, np.zeros(2), key, widths=wide, n_samples=50, burn=100,
        width_base=False,
    )
    w_base = np.asarray(st_base.widths)
    w_free = np.asarray(st_free.widths)
    # Floor path: sqrt(5*std * 10) ~ sqrt(0.25*10) ~ 1.6 (>> 5*std).
    # Free path: 5*std ~ 0.25.
    assert np.all(w_free < 0.5)
    assert np.all(w_base > 1.0)
    np.testing.assert_allclose(w_base**2, w_free * 10.0, rtol=0.35)
    # Moments still correct without the floor.
    res, _ = ds.sample(
        log_f, np.zeros(1), jax.random.key(12), widths=np.array([5.0]),
        n_samples=3000, burn=200, width_base=False,
    )
    s = np.asarray(res["samples"])
    assert abs(np.mean(s)) < 0.01
    assert abs(np.std(s) - 0.05) < 0.01


def test_fit_sample_width_base_option():
    """The fit-level ``sample_width_base=False`` option reaches the
    device chain: the fit completes and samples the same posterior
    (pooled mean within tolerance of the default-protocol fit)."""
    X, y = _problem()
    np.random.seed(321)
    gp1 = _make_gp()
    base_opts = {
        "n_samples": 8,
        "thin": 2,
        "burn": 20,
        "opts_N": 1,
        "init_N": 16,
    }
    hyp1, _, _ = gp1.fit(X=X, y=y, options=base_opts)
    np.random.seed(321)
    gp2 = _make_gp()
    hyp2, _, _ = gp2.fit(
        X=X, y=y, options={**base_opts, "sample_width_base": False}
    )
    # Same posterior, different width protocol: agree loosely.
    m1, m2 = np.mean(np.asarray(hyp1), 0), np.mean(np.asarray(hyp2), 0)
    sd = np.std(np.asarray(hyp1), 0) + np.std(np.asarray(hyp2), 0) + 0.3
    assert np.all(np.abs(m1 - m2) < 4 * sd)


def test_chain_eval_counts_reported():
    """The segmented chain drivers count density evaluations (the
    reference sampler's funccount, slice_sample.py:157): every
    shrinkage proposal is one eval, so each sweep costs >= D evals;
    the count is surfaced per chain by fit(n_chains=...) and on the
    single-chain result dict."""
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    res, _ = ds.sample(
        log_f, np.zeros(3), jax.random.key(21),
        n_samples=10, burn=10, seg_sweeps=4,
    )
    assert res["n_evals"] is not None
    assert res["n_evals"] >= 20 * 3  # (burn+kept) sweeps x D moves

    x0s = np.zeros((2, 3))
    s, f = ds.sample_chains(
        log_f, x0s, jax.random.key(22),
        n_samples=5, burn=5, seg_sweeps=3,
    )
    ev = ds.sample_chains.last_n_evals
    assert ev is not None and ev.shape == (2,)
    assert np.all(ev >= 10 * 3)


def test_chain_group_plan_equal_sizes():
    """Over-memory chain batches split into EQUAL-size groups (the
    largest divisor of B within the memory cap): one compiled batched
    shape serves every group — a ragged (3, 3, 2) split would compile
    two multi-minute 16k segment programs."""
    import gpyreg_tpu.gp as gpm
    from gpyreg_tpu.inference import sampling as sp

    gp = _make_gp()
    orig = gpm._chain_batch_hbm_estimate
    # Force g_max = 3 regardless of the device: 3 chains fit, 4 don't.
    gpm._chain_batch_hbm_estimate = (
        lambda b, n, it, n_dev=1: int(4e9)
    )
    try:
        try:
            import jax as _jax

            hbm = _jax.devices()[0].memory_stats()["bytes_limit"]
        except Exception:
            hbm = 16e9
        g_max = max(1, int((hbm - gpm._CHAIN_HBM_RESERVE) // int(4e9)))
        sizes, keys = sp.chain_group_plan(
            gp, 8, 16384, jax.random.key(0)
        )
        if g_max >= 8:
            assert sizes == [8]
        else:
            g = max(d for d in range(1, g_max + 1) if 8 % d == 0)
            assert sizes == [g] * (8 // g)
        assert len(keys) == len(sizes)
        # Explicit override: fully sequential.
        sizes1, keys1 = sp.chain_group_plan(
            gp, 5, 16384, jax.random.key(0), group=1
        )
        assert sizes1 == [1] * 5 and len(keys1) == 5
    finally:
        gpm._chain_batch_hbm_estimate = orig
