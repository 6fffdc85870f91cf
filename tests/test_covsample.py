"""Random-direction slice sampler ('covsample'): the MATLAB oracle's
gplite_train.m:392-407 sampler (eissample_lite with W=1, whose default
transition operator is transSliceSampleRD, eissample_lite.m:938-980).
Statistical correctness against analytic moments, key determinism,
bounds, fixed dimensions, segmented-dispatch equality, and the GP.fit
wiring — mirroring tests/test_device_slice.py's strategy.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gpyreg_tpu as gpr
from gpyreg_tpu.inference import device_slice


def test_rd_key_determinism_and_chaining():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    key = jax.random.key(0)

    res1, _ = device_slice.sample(
        log_f, np.zeros(3), key, n_samples=60, burn=30, move="rd"
    )
    res2, st = device_slice.sample(
        log_f, np.zeros(3), key, n_samples=30, burn=30, move="rd"
    )
    res3, _ = device_slice.sample(
        log_f, np.zeros(3), key, n_samples=30, burn=0, state=st, move="rd"
    )
    assert np.allclose(res1["samples"][:30], res2["samples"])
    assert np.allclose(res1["samples"][30:], res3["samples"])


def test_rd_normal_moments():
    mu, sigma = 1.5, 2.0
    log_f = lambda x: -0.5 * jnp.sum(((x - mu) / sigma) ** 2)
    res, _ = device_slice.sample(
        log_f,
        np.array([0.5]),
        jax.random.key(1),
        n_samples=4000,
        move="rd",
    )
    s = res["samples"]
    assert abs(np.mean(s) - mu) < 0.15
    assert abs(np.std(s) - sigma) < 0.2


def test_rd_correlated_mvn_moments():
    # The RD move's reason to exist: correlated targets that a
    # coordinate-wise sweep random-walks through.
    C = np.array([[2.0, 1.4], [1.4, 1.5]])
    Ci = np.linalg.inv(C)
    log_f = lambda x: -0.5 * x @ jnp.asarray(Ci) @ x
    res, _ = device_slice.sample(
        log_f,
        np.zeros(2),
        jax.random.key(3),
        n_samples=8000,
        burn=1000,
        move="rd",
    )
    s = res["samples"]
    assert np.all(np.abs(np.mean(s, axis=0)) < 0.2)
    assert np.allclose(np.cov(s.T), C, atol=0.45)


def test_rd_bounded_uniform():
    log_f = lambda x: jnp.asarray(0.0)
    LB, UB = np.array([-2.0, 0.0]), np.array([1.0, 3.0])
    res, _ = device_slice.sample(
        log_f,
        np.array([0.0, 1.0]),
        jax.random.key(4),
        LB=LB,
        UB=UB,
        n_samples=3000,
        move="rd",
    )
    s = res["samples"]
    assert np.all(s >= LB) and np.all(s <= UB)
    # Uniform on the box: mean at the center, var = (b-a)^2/12.
    assert np.allclose(np.mean(s, axis=0), (LB + UB) / 2, atol=0.15)
    assert np.allclose(
        np.var(s, axis=0), (UB - LB) ** 2 / 12.0, rtol=0.25
    )


def test_rd_fixed_dimension():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    LB = np.array([-np.inf, 0.7])
    UB = np.array([np.inf, 0.7])
    res, _ = device_slice.sample(
        log_f,
        np.array([0.0, 0.7]),
        jax.random.key(5),
        LB=LB,
        UB=UB,
        n_samples=500,
        move="rd",
    )
    s = res["samples"]
    assert np.all(s[:, 1] == 0.7)
    assert np.std(s[:, 0]) > 0.5  # the free dim still mixes


def test_rd_segmented_matches_monolithic():
    log_f = lambda x: -0.5 * jnp.sum(x**2)
    key = jax.random.key(6)
    res_m, _ = device_slice.sample(
        log_f, np.zeros(3), key, n_samples=40, burn=20, move="rd"
    )
    res_s, _ = device_slice.sample(
        log_f,
        np.zeros(3),
        key,
        n_samples=40,
        burn=20,
        move="rd",
        seg_sweeps=7,
    )
    assert np.array_equal(res_m["samples"], res_s["samples"])
    assert np.array_equal(res_m["f_vals"], res_s["f_vals"])


def test_rd_rejects_step_out():
    with pytest.raises(ValueError, match="step_out"):
        device_slice.sample(
            lambda x: -jnp.sum(x**2),
            np.zeros(2),
            jax.random.key(0),
            move="rd",
            step_out=True,
        )
    with pytest.raises(ValueError, match="move"):
        device_slice.sample(
            lambda x: -jnp.sum(x**2),
            np.zeros(2),
            jax.random.key(0),
            move="ads",
        )


def _small_gp():
    np.random.seed(1234)
    gp = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    X = np.random.uniform(-3, 3, (30, 2))
    y = (np.sin(np.sum(X, 1)) + 0.1 * np.random.randn(30))[:, None]
    return gp, X, y


def test_gp_fit_covsample():
    gp, X, y = _small_gp()
    hyp, opt_res, samp_res = gp.fit(
        X=X,
        y=y,
        options={
            "sampler": "covsample",
            "n_samples": 6,
            "opts_N": 1,
            "init_N": 32,
        },
    )
    assert hyp.shape[0] == 6
    assert np.all(np.isfinite(samp_res["f_vals"]))
    # Diagnostics populated like the default sampler's.
    assert samp_res["exit_flag"] in (1, 0, -1, -2, -3)
    assert samp_res["R"] is not None
    mu, s2 = gp.predict(np.random.uniform(-3, 3, (8, 2)))
    assert np.all(np.isfinite(mu)) and np.all(s2 > 0)


def test_gp_fit_covsample_host_backend_rejected():
    gp, X, y = _small_gp()
    with pytest.raises(ValueError, match="covsample"):
        gp.fit(
            X=X,
            y=y,
            options={
                "sampler": "covsample",
                "sampler_backend": "host",
                "n_samples": 4,
                "opts_N": 1,
                "init_N": 16,
            },
        )


def test_gp_fit_covsample_multichain():
    gp, X, y = _small_gp()
    hyp, _, samp_res = gp.fit(
        X=X,
        y=y,
        options={
            "sampler": "covsample",
            "n_chains": 2,
            "n_samples": 6,
            "opts_N": 1,
            "init_N": 32,
        },
    )
    assert hyp.shape[0] == 6
    assert samp_res["n_chains"] == 2
