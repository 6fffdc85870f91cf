"""Batched device MAP optimizer: box-transform round-trips, bounded
quadratic minimization across start batches, fixed dimensions, and
agreement with scipy L-BFGS-B on a GP NLML objective."""

import numpy as np
import pytest
import scipy.optimize

import jax.numpy as jnp

from gpyreg_tpu.inference.map_optimize import (
    _make_transform,
    multistart_map,
)


def test_transform_roundtrip_all_bound_kinds():
    LB = np.array([-1.0, 0.0, -np.inf, -np.inf, 2.0])
    UB = np.array([1.0, np.inf, 5.0, np.inf, 2.0])  # last dim fixed
    to_x, to_z, bp = _make_transform(LB, UB)
    x = np.array([0.3, 1.7, -2.2, 0.9, 2.0])
    x_rt = np.asarray(to_x(to_z(jnp.asarray(x), bp), bp))
    assert np.allclose(x_rt, x, atol=1e-9)
    # Any z maps inside the box.
    z = np.array([50.0, -30.0, 10.0, -3.0, 0.0])
    x2 = np.asarray(to_x(jnp.asarray(z), bp))
    assert np.all(x2 >= LB - 1e-12) and np.all(x2 <= UB + 1e-12)
    assert x2[-1] == 2.0
    # Same finiteness pattern, different values -> same cached closures
    # (the jitted optimizer program is reused across refits).
    to_x2, _, bp2 = _make_transform(LB - 0.5, UB - 0.5)
    assert to_x2 is to_x
    assert not np.allclose(np.asarray(bp2), np.asarray(bp))


def test_bounded_quadratic():
    # min (x - c)^2 with c partially outside the box.
    c = jnp.asarray([0.5, 2.0, -3.0])
    LB = np.array([-1.0, -1.0, -1.0])
    UB = np.array([1.0, 1.0, 1.0])

    def obj(x):
        return jnp.sum((x - c) ** 2)

    starts = np.array([[0.0, 0.0, 0.0], [0.9, -0.9, 0.5]])
    xs, fs, results = multistart_map(obj, starts, LB, UB, tol=1e-10)
    for x in xs:
        assert np.allclose(x[0], 0.5, atol=1e-5)
        assert x[1] > 1.0 - 1e-3  # driven to the upper bound
        assert x[2] < -1.0 + 1e-3  # driven to the lower bound
    assert all(r.success for r in results)


def test_gp_objective_matches_scipy():
    import gpyreg_tpu as gpr

    rng = np.random.default_rng(0)
    N, D = 40, 2
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
    gp.X, gp.y = X, y
    LB = np.full(5, -8.0)
    UB = np.full(5, 8.0)
    start = np.array([[0.1, 0.1, 0.2, -1.0, 0.0]])

    fns, args = gp._obj_args()
    xs, fs, _ = multistart_map(
        fns["obj_raw"], start, LB, UB, f_args=args, tol=1e-8
    )

    res = scipy.optimize.minimize(
        fun=lambda h: gp._objective(h, grad=True),
        x0=start[0],
        jac=True,
        bounds=list(zip(LB, UB)),
        tol=1e-8,
    )
    # Same basin -> same objective value (iterates may differ).
    assert abs(fs[0] - res.fun) < 1e-4 * max(1.0, abs(res.fun))


def test_design_optimize_start_selection_matches_host_logic():
    """The fused program's top-k + low-noise-restart selection
    (map_optimize._run_design_optimize) must reproduce the host-side
    selection logic (reference gaussian_process.py:1112-1125) on the
    same design and objective values."""
    import math

    from gpyreg_tpu.inference.map_optimize import design_optimize

    rng = np.random.default_rng(0)
    n, B0, cov_N = 4, 64, 1
    design = rng.normal(size=(B0, n))
    LB = np.full(n, -10.0)
    UB = np.full(n, 10.0)

    # A deterministic, jit-friendly objective: quadratic bowl.
    def obj_raw(h):
        return jnp.sum((h - 0.5) ** 2)

    xs, fs, results, widths, X_sorted, y_sorted = design_optimize(
        obj_raw,
        design,
        LB,
        UB,
        tol=1e-8,
        opts_N=3,
        low_noise_idx=cov_N,
        chunk=16,
    )

    # Host replication of the selection.
    y_host = np.array([float(np.sum((h - 0.5) ** 2)) for h in design])
    order = np.argsort(y_host)
    X0 = design[order]
    y0 = y_host[order]
    starts = X0[:3].copy()
    xx, noise_y = X0[3:], y0[3:]
    nz_order = np.argsort(xx[:, cov_N])
    m = math.ceil(0.2 * len(noise_y))
    cand = nz_order[:m]
    starts[1] = xx[cand[np.argmin(noise_y[cand])]]

    np.testing.assert_allclose(np.asarray(X_sorted), X0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(y_sorted), y0, atol=1e-10)
    np.testing.assert_allclose(widths, np.std(design, 0, ddof=1), atol=1e-10)
    # All three optimized starts must converge to the bowl's minimum.
    np.testing.assert_allclose(xs, 0.5, atol=1e-4)
    assert np.all(fs < 1e-6)


def test_design_f_args_rank_on_subset_optimize_on_full():
    """design_f_args ranks the candidates with DIFFERENT objective
    arguments than the optimization phase (the gp.fit design_subset
    knob): starts must follow the design-args ordering while the
    optimum and reported objective values come from the full args."""
    from gpyreg_tpu.inference.map_optimize import design_optimize

    def obj_raw(h, c):
        return jnp.sum((h - c) ** 2)

    # Ranked against c=2: [1.5], [3.0], [0.1]; optimum under c=0 is 0.
    design = np.array([[1.5], [0.1], [3.0]])
    LB, UB = np.array([-10.0]), np.array([10.0])
    full = (np.float64(0.0),)
    sub = (np.float64(2.0),)
    for segments in (None, (2, 50)):
        xs, fs, results, widths, X_sorted, y_sorted = design_optimize(
            obj_raw,
            design,
            LB,
            UB,
            f_args=full,
            design_f_args=sub,
            tol=1e-10,
            opts_N=1,
            segments=segments,
        )
        np.testing.assert_allclose(
            np.asarray(X_sorted), [[1.5], [3.0], [0.1]], atol=1e-12
        )
        np.testing.assert_allclose(  # ranking values are subset values
            np.asarray(y_sorted), [0.25, 1.0, 3.61], atol=1e-10
        )
        np.testing.assert_allclose(xs, 0.0, atol=1e-5)
        assert fs[0] < 1e-8  # full-args objective at the optimum


def test_gp_fit_design_subset_matches_full_ranking_fit():
    """GP.fit(options={'design_subset': n}) must reach the same MAP
    optimum as the full-data ranking on a well-conditioned problem (the
    subset only changes which starting points are picked)."""
    import gpyreg_tpu as gpr

    rng = np.random.default_rng(7)
    X = rng.uniform(-3, 3, (160, 1))
    y = np.sin(X) + 0.1 * rng.normal(size=(160, 1))
    opts = {"n_samples": 0, "opts_N": 2, "init_N": 32}

    def make():
        return gpr.GP(
            D=1,
            covariance=gpr.covariance_functions.SquaredExponential(),
            mean=gpr.mean_functions.ConstantMean(),
            noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        )

    gp_full = make()
    np.random.seed(3)
    hyp_f, res_f, _ = gp_full.fit(X=X, y=y, options=dict(opts))
    gp_sub = make()
    np.random.seed(3)
    hyp_s, res_s, _ = gp_sub.fit(
        X=X, y=y, options={**opts, "design_subset": 48}
    )
    f_full = res_f.fun
    f_sub = res_s.fun
    assert abs(f_full - f_sub) < 1e-3 * max(1.0, abs(f_full))
    # n_sub >= N falls back to the identical full-ranking path.
    gp_id = make()
    np.random.seed(3)
    hyp_i, res_i, _ = gp_id.fit(
        X=X, y=y, options={**opts, "design_subset": 10_000}
    )
    np.testing.assert_allclose(hyp_i, hyp_f, atol=1e-12)


def test_design_chunk_sized_by_ranking_rows():
    """The design-eval vmap chunk follows the rows the RANKING program
    evaluates: with design_subset active the subset size governs the
    workspace, not the full padded N (which would serialize the subset
    evaluations the knob exists to batch — chunk=1 at 16k)."""
    from gpyreg_tpu.gp import _design_chunk

    # Full-N sizing at north-star scale: one candidate at a time.
    assert _design_chunk(16384, 1024) == 1
    # Subset ranking at the same scale batches wide.
    assert _design_chunk(4096, 1024) == 4
    assert _design_chunk(1024, 1024) == 64
    # Small problems cap at the design size and stay a power of two.
    assert _design_chunk(64, 1024) == 1024
    assert _design_chunk(64, 100) == 64
