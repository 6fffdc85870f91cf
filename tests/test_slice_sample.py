"""Slice sampler tests: statistical correctness against analytic
moments, chained-run determinism, input validation (mirrors reference
testing/test_slice_sample.py)."""

import numpy as np
import pytest
import scipy.stats

from gpyreg_tpu.slice_sample import SliceSampler


def test_determinism_chained_runs():
    """One 300-sample run equals three chained 100-sample runs under the
    same seed (reference test at test_slice_sample.py:18-36).  D=1 as in
    the reference: for D>1 the axis-scan permutation state resets at call
    boundaries (in the reference too), so chaining only matches for D=1.
    """
    log_f = lambda x: -0.5 * np.sum(x**2)

    np.random.seed(42)
    s1 = SliceSampler(log_f, np.array([0.5]), options={"display": "off"})
    all_samples = s1.sample(300)["samples"]

    np.random.seed(42)
    s2 = SliceSampler(log_f, np.array([0.5]), options={"display": "off"})
    # First chained call must use the same burn-in as the long run
    # (reference test passes burn=100 explicitly, test_slice_sample.py:27).
    parts = [s2.sample(100, burn=100)["samples"]]
    parts += [s2.sample(100)["samples"] for _ in range(2)]
    chained = np.concatenate(parts)

    assert np.all(all_samples == chained)


def test_normal_moments():
    mu_true, sigma_true = 1.5, 2.0
    log_f = lambda x: -0.5 * np.sum(((x - mu_true) / sigma_true) ** 2)
    np.random.seed(1)
    sampler = SliceSampler(
        log_f, np.array([0.5]), options={"display": "off"}
    )
    res = sampler.sample(3000)
    s = res["samples"]
    assert abs(np.mean(s) - mu_true) < 0.15
    assert abs(np.std(s) - sigma_true) < 0.2


def test_exponential_lower_bound():
    lam = 1.3
    log_f = lambda x: -lam * np.sum(x)
    np.random.seed(2)
    sampler = SliceSampler(
        log_f, np.array([1.0]), LB=np.array([0.0]),
        options={"display": "off"},
    )
    res = sampler.sample(3000)
    s = res["samples"]
    assert np.all(s >= 0)
    assert abs(np.mean(s) - 1 / lam) < 0.1


def test_uniform_bounded():
    log_f = lambda x: 0.0
    np.random.seed(3)
    sampler = SliceSampler(
        log_f,
        np.array([0.5]),
        LB=np.array([0.0]),
        UB=np.array([1.0]),
        options={"display": "off"},
    )
    res = sampler.sample(3000)
    s = res["samples"]
    assert np.all((s >= 0) & (s <= 1))
    assert abs(np.mean(s) - 0.5) < 0.05
    assert abs(np.var(s) - 1 / 12) < 0.02


def test_mvn_moments():
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    icov = np.linalg.inv(cov)
    log_f = lambda x: -0.5 * x @ icov @ x
    np.random.seed(4)
    sampler = SliceSampler(
        log_f, np.zeros(2), options={"display": "off"}
    )
    s = sampler.sample(4000)["samples"]
    assert np.max(np.abs(np.mean(s, 0))) < 0.15
    assert np.max(np.abs(np.cov(s.T) - cov)) < 0.35


def test_mixture_of_normals():
    # Well-overlapping bimodal target.
    log_f = lambda x: np.log(
        0.5 * np.exp(-0.5 * np.sum((x - 1.0) ** 2))
        + 0.5 * np.exp(-0.5 * np.sum((x + 1.0) ** 2))
    )
    np.random.seed(5)
    s = SliceSampler(log_f, np.zeros(1), options={"display": "off"}).sample(
        4000
    )["samples"]
    assert abs(np.mean(s)) < 0.2
    assert abs(np.var(s) - 2.0) < 0.3  # var = 1 + mu^2 spread


def test_fixed_dimension():
    log_f = lambda x: -0.5 * np.sum(x**2)
    np.random.seed(6)
    sampler = SliceSampler(
        log_f,
        np.array([0.0, 0.7]),
        LB=np.array([-np.inf, 0.7]),
        UB=np.array([np.inf, 0.7]),
        options={"display": "off"},
    )
    s = sampler.sample(200)["samples"]
    assert np.all(s[:, 1] == 0.7)


def test_input_validation():
    log_f = lambda x: -0.5 * np.sum(x**2)
    with pytest.raises(ValueError):
        SliceSampler(log_f, np.zeros((2, 2)))
    with pytest.raises(ValueError):
        SliceSampler(log_f, np.zeros(2), LB=np.zeros(3))
    with pytest.raises(ValueError):
        SliceSampler(
            log_f, np.zeros(2), LB=np.ones(2), UB=np.zeros(2)
        )
    with pytest.raises(ValueError):
        SliceSampler(log_f, np.zeros(2), widths=-1.0)
    with pytest.raises(ValueError):
        SliceSampler(
            log_f, np.zeros(2), LB=np.ones(2) * 0.5, UB=np.ones(2)
        )
    sampler = SliceSampler(log_f, np.zeros(2), options={"display": "off"})
    with pytest.raises(ValueError):
        sampler.sample(10, thin=0)
    with pytest.raises(ValueError):
        sampler.sample(10, burn=-1)
    with pytest.raises(ValueError):
        SliceSampler(
            lambda x: np.nan, np.zeros(2), options={"display": "off"}
        ).sample(10)


def test_diagnostics_output():
    log_f = lambda x: -0.5 * np.sum(x**2)
    np.random.seed(7)
    sampler = SliceSampler(
        log_f, np.zeros(2), options={"display": "off", "diagnostics": True}
    )
    res = sampler.sample(400)
    assert res["exit_flag"] in (1, 0, -1, -2, -3)
    assert res["R"].shape == (2,)
    assert res["eff_N"].shape == (2,)
    assert res["samples"].shape == (400, 2)
    assert res["f_vals"].shape[0] == 400


def test_thinning_and_burn():
    log_f = lambda x: -0.5 * np.sum(x**2)
    np.random.seed(8)
    sampler = SliceSampler(log_f, np.zeros(1), options={"display": "off"})
    res = sampler.sample(50, thin=3, burn=20)
    assert res["samples"].shape == (50, 1)
    # func_count >= one eval per proposal in (burn + eff_N) iterations
    assert sampler.func_count >= 20 + 50 + 49 * 2


def test_beta_bounded():
    """Beta target on [0, 1] (reference test_slice_sample.py:99-108)."""
    rv = scipy.stats.beta(2.31, 0.627)
    np.random.seed(9)
    sampler = SliceSampler(
        rv.logpdf,
        np.array([0.5]),
        LB=np.array([0.0]),
        UB=np.array([1.0]),
        options={"display": "off"},
    )
    s = sampler.sample(8000)["samples"]
    assert abs(rv.mean() - s.mean()) < 0.1
    assert abs(rv.var() - s.var()) < 0.1


def test_multivariate_normal_mean():
    """3-D correlated Gaussian (reference test_slice_sample.py:111-124)."""
    mean = np.array([0.68, 0.6, 0.4])
    cov = np.array(
        [[1.58, 0.96, -1.2], [0.96, 2.17, -1.725], [-1.2, -1.725, 1.85]]
    )
    rv = scipy.stats.multivariate_normal(mean, cov)
    np.random.seed(10)
    sampler = SliceSampler(
        rv.logpdf, np.array([0.5, -0.5, 1.0]), options={"display": "off"}
    )
    s = sampler.sample(8000)["samples"]
    assert np.all(np.abs(mean - s.mean(0)) < 0.12)


def test_multivariate_t_mean():
    """Heavy-tailed multivariate-t (reference test_slice_sample.py:127-133)."""
    loc = np.array([1.0, -0.5])
    shape = np.array([[2.1, 0.3], [0.3, 1.5]])
    rv = scipy.stats.multivariate_t(loc, shape, df=3)
    np.random.seed(11)
    sampler = SliceSampler(
        rv.logpdf, np.array([0.5, 0.5]), options={"display": "off"}
    )
    s = sampler.sample(8000)["samples"]
    assert np.all(np.abs(loc - s.mean(0)) < 0.15)


def test_device_sampler_multivariate_t():
    """The DEVICE sampler passes the same heavy-tailed statistics."""
    import jax
    import jax.numpy as jnp

    from gpyreg_tpu.inference import device_slice

    loc = jnp.asarray([1.0, -0.5])
    P = jnp.linalg.inv(jnp.asarray([[2.1, 0.3], [0.3, 1.5]]))
    df = 3.0

    def log_f(x):
        d = x - loc
        q = d @ P @ d
        return -0.5 * (df + 2) * jnp.log1p(q / df)

    res, _ = device_slice.sample(
        log_f,
        np.array([0.5, 0.5]),
        jax.random.key(12),
        widths=2 * np.ones(2),
        LB=-50 * np.ones(2),
        UB=50 * np.ones(2),
        n_samples=6000,
        burn=1000,
    )
    s = res["samples"]
    assert np.all(np.abs(np.asarray(loc) - s.mean(0)) < 0.15)
