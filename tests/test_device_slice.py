"""Device-resident (fully-jitted) slice sampler: statistical correctness
against analytic moments, key-determinism, bounds, fixed dimensions,
multi-chain vmap.  Mirrors the strategy of reference
testing/test_slice_sample.py with a keyed PRNG instead of the global
NumPy seed (SURVEY.md section 7, hard part 1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpyreg_tpu.inference import device_slice


def test_key_determinism_and_chaining():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    key = jax.random.key(0)

    res1, _ = device_slice.sample(
        log_f, np.zeros(3), key, n_samples=60, burn=30
    )
    res2, st = device_slice.sample(
        log_f, np.zeros(3), key, n_samples=30, burn=30
    )
    res3, _ = device_slice.sample(
        log_f, np.zeros(3), key, n_samples=30, burn=0, state=st
    )
    assert np.allclose(res1["samples"][:30], res2["samples"])
    # Chained continuation reproduces the tail of the long run.
    assert np.allclose(res1["samples"][30:], res3["samples"])


def test_normal_moments():
    mu, sigma = 1.5, 2.0
    log_f = lambda x: -0.5 * jnp.sum(((x - mu) / sigma) ** 2)
    res, _ = device_slice.sample(
        log_f, np.array([0.5]), jax.random.key(1), n_samples=4000
    )
    s = res["samples"]
    assert abs(np.mean(s) - mu) < 0.15
    assert abs(np.std(s) - sigma) < 0.2


def test_exponential_lower_bound():
    lam = 1.3
    log_f = lambda x: -lam * jnp.sum(x)
    res, _ = device_slice.sample(
        log_f,
        np.array([1.0]),
        jax.random.key(2),
        LB=np.array([0.0]),
        n_samples=4000,
    )
    s = res["samples"]
    assert np.all(s >= 0)
    assert abs(np.mean(s) - 1 / lam) < 0.1


def test_uniform_bounded():
    log_f = lambda x: jnp.asarray(0.0)
    res, _ = device_slice.sample(
        log_f,
        np.array([0.5]),
        jax.random.key(3),
        LB=np.array([0.0]),
        UB=np.array([1.0]),
        n_samples=4000,
    )
    s = res["samples"]
    assert np.all((s >= 0) & (s <= 1))
    assert abs(np.mean(s) - 0.5) < 0.05
    assert abs(np.var(s) - 1 / 12) < 0.02


def test_mvn_moments():
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    icov = jnp.asarray(np.linalg.inv(cov))
    log_f = lambda x: -0.5 * x @ icov @ x
    res, _ = device_slice.sample(
        log_f, np.zeros(2), jax.random.key(4), n_samples=5000
    )
    s = res["samples"]
    assert np.max(np.abs(np.mean(s, 0))) < 0.15
    assert np.max(np.abs(np.cov(s.T) - cov)) < 0.35


def test_fixed_dimension():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    res, _ = device_slice.sample(
        log_f,
        np.array([0.0, 0.7]),
        jax.random.key(5),
        LB=np.array([-np.inf, 0.7]),
        UB=np.array([np.inf, 0.7]),
        n_samples=200,
    )
    assert np.all(res["samples"][:, 1] == 0.7)


def test_thinning_shapes():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    res, _ = device_slice.sample(
        log_f, np.zeros(2), jax.random.key(6), n_samples=50, thin=3, burn=20
    )
    assert res["samples"].shape == (50, 2)
    assert res["f_vals"].shape == (50, 1)


def test_multi_chain():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    x0s = 0.1 * np.arange(8)[:, None] * np.ones((8, 2))
    samples, f_vals = device_slice.sample_chains(
        log_f, x0s, jax.random.key(7), n_samples=1500, burn=300
    )
    assert samples.shape == (8, 1500, 2)
    assert f_vals.shape == (8, 1500)
    pooled = samples.reshape(-1, 2)
    assert np.max(np.abs(np.mean(pooled, axis=0))) < 0.1
    assert np.max(np.abs(np.var(pooled, axis=0) - 1.0)) < 0.15
    # Chains differ (independent keys).
    assert not np.allclose(samples[0], samples[1])


def test_input_validation():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    with pytest.raises(ValueError):
        device_slice.sample(
            log_f,
            np.zeros(2),
            jax.random.key(8),
            LB=np.ones(2) * 0.5,
            UB=np.ones(2),
            n_samples=10,
        )
    with pytest.raises(ValueError):
        device_slice.sample(
            log_f, np.zeros(2), jax.random.key(9), widths=-1.0, n_samples=10
        )
    with pytest.raises(ValueError):
        device_slice.sample(
            log_f, np.zeros(2), jax.random.key(10), n_samples=10, thin=0
        )
    with pytest.raises(ValueError):
        device_slice.sample(
            lambda x: jnp.asarray(jnp.nan),
            np.zeros(2),
            jax.random.key(11),
            n_samples=10,
        )


def test_shrink_cap_exit_keeps_current_point():
    """On max_shrink cap exit the sweep must keep the CURRENT point and
    its density — not the last rejected proposal (whose density is
    below the slice level; a spike density makes every proposal reject,
    so with a tiny cap the old behavior wrote -inf f_vals into the
    chain)."""
    import jax.numpy as jnp

    from gpyreg_tpu.inference import device_slice as ds

    def log_spike(x):
        return jnp.where(jnp.all(jnp.abs(x) < 1e-12), 0.0, -jnp.inf)

    key = jax.random.key(0)
    res, _ = ds.sample(
        log_spike,
        np.zeros(2),
        key,
        widths=np.full(2, 10.0),
        LB=np.full(2, -5.0),
        UB=np.full(2, 5.0),
        n_samples=5,
        burn=2,
        max_shrink=3,
        diagnostics=False,
    )
    assert np.all(res["samples"] == 0.0)
    assert np.all(np.isfinite(res["f_vals"]))


def test_ensemble_shrink_cap_exit_keeps_walker():
    """Ensemble twin of the cap-exit contract: capped walkers stay put
    with finite densities instead of moving to rejected proposals."""
    import jax.numpy as jnp

    from gpyreg_tpu.inference import ensemble_slice as es

    def log_spike(x):
        return jnp.where(jnp.all(jnp.abs(x) < 1e-12), 0.0, -jnp.inf)

    res, _ = es.sample(
        log_spike,
        np.zeros((6, 2)),  # every walker starts ON the spike
        jax.random.key(1),
        LB=np.full(2, -5.0),
        UB=np.full(2, 5.0),
        n_samples=8,
        n_walkers=6,
        burn=2,
        max_shrink=3,
    )
    assert np.all(res["samples"] == 0.0)
    assert np.all(np.isfinite(res["f_vals"]))


def test_moveseg_matches_monolithic_chain():
    """Move-granularity segmentation (seg_moves, built for matrix-free
    chains whose single eval is a multi-second program) replays
    _run_chain's exact key-split order: with width adaptation off, the
    segmented chain must reproduce the monolithic chain's draws
    BIT-EXACTLY at every partition size (same moves, same keys, same
    arithmetic — the partition is purely a dispatch boundary)."""
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    key = jax.random.key(7)
    common = dict(
        n_samples=24,
        thin=2,
        burn=20,
        adaptive=False,
        widths=np.full(3, 2.0),
        LB=np.full(3, -8.0),
        UB=np.full(3, 8.0),
    )
    mono, _ = device_slice.sample(
        log_f, np.zeros(3), key, **common
    )
    for k in (1, 2, 3):
        seg, _ = device_slice.sample(
            log_f, np.zeros(3), key, seg_moves=k, **common
        )
        np.testing.assert_array_equal(seg["samples"], mono["samples"])
        np.testing.assert_allclose(
            seg["f_vals"], mono["f_vals"], rtol=0, atol=1e-12
        )


def test_moveseg_adaptive_partition_invariance():
    """With burn-in width adaptation ON, exact cross-program bit parity
    with the monolithic chain is not a JAX guarantee (the end-of-burn
    5*std rule compiles standalone in the move driver; XLA's FMA/
    reassociation choices differ per program, so widths agree to ulps,
    not bits, and accept boundaries amplify ulps into different — but
    equally valid — trajectories).  The contract instead: (a) the
    partition size is purely a dispatch knob — k=1/2/3 chains are
    bit-identical to EACH OTHER; (b) the adapted widths match the
    monolithic rule to float precision."""
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    key = jax.random.key(7)
    common = dict(
        n_samples=24,
        thin=2,
        burn=21,
        widths=np.full(3, 2.0),
        LB=np.full(3, -8.0),
        UB=np.full(3, 8.0),
    )
    mono, st_m = device_slice.sample(
        log_f, np.zeros(3), key, **common
    )
    seg1, st_1 = device_slice.sample(
        log_f, np.zeros(3), key, seg_moves=1, **common
    )
    for k in (2, 3):
        segk, st_k = device_slice.sample(
            log_f, np.zeros(3), key, seg_moves=k, **common
        )
        np.testing.assert_array_equal(
            segk["samples"], seg1["samples"]
        )
        np.testing.assert_array_equal(
            np.asarray(st_k.widths), np.asarray(st_1.widths)
        )
    np.testing.assert_allclose(
        np.asarray(st_1.widths),
        np.asarray(st_m.widths),
        rtol=1e-10,
    )
    # Same law: post-burn draws from the same start agree in
    # distribution (loose moment check on a short run).
    assert np.all(np.isfinite(seg1["samples"]))
    assert np.abs(np.mean(seg1["samples"])) < 1.5


def test_moveseg_rejects_rd_move():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    with pytest.raises(ValueError, match="cw"):
        device_slice.sample(
            log_f,
            np.zeros(2),
            jax.random.key(0),
            n_samples=2,
            seg_moves=1,
            move="rd",
        )
