"""f32 conditioning floor on the constant-noise lower bound.

Below sn2 ~ C*N*eps32*var(y) the f32 Cholesky cannot resolve the kernel
(cond(K) > 1/eps32) and the in-jit jitter escalation silently acts as an
unreported noise term; `GP._f32_noise_floor` raises the fit-local noise
lower bound so fitted hyperparameters stay dtype-honest (measured at the
north-star N=16384 workload; no reference analog — the reference is
f64-only with LB=log(1e-6), noise_functions.py:107).
"""

import numpy as np

import gpyreg_tpu as gpr


def _gp(dtype, N):
    gp = gpr.GP(
        D=2,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        dtype=dtype,
    )
    rng = np.random.default_rng(0)
    gp.X = rng.uniform(-3, 3, (N, 2))
    gp.y = np.sin(gp.X.sum(1, keepdims=True)) + 0.1 * rng.standard_normal(
        (N, 1)
    )
    return gp


def _bounds(gp):
    cov_N = gp.covariance.hyperparameter_count(2)
    hyp_N = cov_N + 1 + 1  # + const noise + const mean
    LB = np.full(hyp_N, -15.0)
    UB = np.full(hyp_N, 15.0)
    return LB, UB, cov_N


def expected_floor(gp):
    return 0.5 * np.log(
        gp._F32_NOISE_FLOOR_C
        * gp.X.shape[0]
        * float(np.finfo(np.float32).eps)
        * float(np.var(gp.y))
    )


class TestF32NoiseFloor:
    def test_raises_lb_at_large_n_f32(self):
        gp = _gp(np.float32, 5000)
        LB, UB, cov_N = _bounds(gp)
        out = gp._f32_noise_floor(LB, UB, cov_N, {})
        assert out[cov_N] == min(expected_floor(gp), UB[cov_N])
        assert out[cov_N] > LB[cov_N]
        # Only the noise entry changes; the input LB is not mutated.
        np.testing.assert_array_equal(np.delete(out, cov_N),
                                      np.delete(LB, cov_N))
        assert LB[cov_N] == -15.0

    def test_noop_for_f64(self):
        gp = _gp(np.float64, 5000)
        LB, UB, cov_N = _bounds(gp)
        out = gp._f32_noise_floor(LB, UB, cov_N, {})
        assert out is LB

    def test_noop_below_min_n(self):
        gp = _gp(np.float32, 512)
        LB, UB, cov_N = _bounds(gp)
        out = gp._f32_noise_floor(LB, UB, cov_N, {})
        assert out is LB

    def test_forced_on_small_n(self):
        gp = _gp(np.float32, 512)
        LB, UB, cov_N = _bounds(gp)
        out = gp._f32_noise_floor(LB, UB, cov_N, {"f32_noise_floor": True})
        assert out[cov_N] == min(expected_floor(gp), UB[cov_N])

    def test_disabled_by_option(self):
        gp = _gp(np.float32, 5000)
        LB, UB, cov_N = _bounds(gp)
        out = gp._f32_noise_floor(
            LB, UB, cov_N, {"f32_noise_floor": False}
        )
        assert out is LB

    def test_numeric_override(self):
        gp = _gp(np.float32, 5000)
        LB, UB, cov_N = _bounds(gp)
        out = gp._f32_noise_floor(
            LB, UB, cov_N, {"f32_noise_floor": -1.25}
        )
        assert out[cov_N] == -1.25

    def test_no_constant_noise_term(self):
        gp = _gp(np.float32, 5000)
        gp.noise = gpr.noise_functions.GaussianNoise(
            user_provided_add=True, scale_user_provided=True
        )
        LB, UB, cov_N = _bounds(gp)
        out = gp._f32_noise_floor(LB, UB, cov_N, {})
        assert out is LB

    def test_existing_lb_above_floor_kept(self):
        gp = _gp(np.float32, 5000)
        LB, UB, cov_N = _bounds(gp)
        LB[cov_N] = 1.0  # user pinned tighter than the floor
        out = gp._f32_noise_floor(LB, UB, cov_N, {})
        assert out is LB
