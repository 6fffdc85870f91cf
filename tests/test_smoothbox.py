"""Smoothbox distribution and uuinv tests (reference
testing/test_smoothbox.py / test_smoothbox_student_t.py): pdf
normalization, cdf/ppf inverse round-trips, limiting values."""

import numpy as np
import scipy.integrate
import scipy.stats

from gpyreg_tpu.f_min_fill import (
    smoothbox_cdf,
    smoothbox_ppf,
    smoothbox_student_t_cdf,
    smoothbox_student_t_ppf,
    uuinv,
)


def _smoothbox_pdf(x, sigma, a, b):
    C = 1.0 + (b - a) / (sigma * np.sqrt(2 * np.pi))
    if x < a:
        return scipy.stats.norm.pdf(x, loc=a, scale=sigma) / C
    if x <= b:
        return 1.0 / (C * sigma * np.sqrt(2 * np.pi))
    return scipy.stats.norm.pdf(x, loc=b, scale=sigma) / C


def _smoothbox_t_pdf(x, df, sigma, a, b):
    c = scipy.special.gamma(0.5 * (df + 1)) / (
        scipy.special.gamma(0.5 * df) * sigma * np.sqrt(df * np.pi)
    )
    C = 1.0 + (b - a) * c
    if x < a:
        return scipy.stats.t.pdf(x, df, loc=a, scale=sigma) / C
    if x <= b:
        return c / C
    return scipy.stats.t.pdf(x, df, loc=b, scale=sigma) / C


def test_smoothbox_pdf_integrates_to_one():
    sigma, a, b = 0.7, -1.0, 2.0
    val, _ = scipy.integrate.quad(
        lambda x: _smoothbox_pdf(x, sigma, a, b), -np.inf, np.inf
    )
    assert abs(val - 1.0) < 1e-8


def test_smoothbox_t_pdf_integrates_to_one():
    df, sigma, a, b = 3, 0.7, -1.0, 2.0
    val, _ = scipy.integrate.quad(
        lambda x: _smoothbox_t_pdf(x, df, sigma, a, b), -np.inf, np.inf
    )
    assert abs(val - 1.0) < 1e-8


def test_smoothbox_cdf_limits():
    sigma, a, b = 0.5, -1.0, 1.5
    assert smoothbox_cdf(-np.inf, sigma, a, b) == 0.0
    assert abs(smoothbox_cdf(np.inf, sigma, a, b) - 1.0) < 1e-12
    # cdf is the integral of the pdf
    for x in [-2.0, -1.0, 0.3, 1.5, 2.5]:
        val, _ = scipy.integrate.quad(
            lambda t: _smoothbox_pdf(t, sigma, a, b), -np.inf, x
        )
        assert abs(smoothbox_cdf(x, sigma, a, b) - val) < 1e-8


def test_smoothbox_ppf_roundtrip():
    sigma, a, b = 0.5, -1.0, 1.5
    for q in [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
        x = smoothbox_ppf(q, sigma, a, b)
        assert abs(smoothbox_cdf(x, sigma, a, b) - q) < 1e-10


def test_smoothbox_t_ppf_roundtrip():
    df, sigma, a, b = 3, 0.5, -1.0, 1.5
    for q in [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
        x = smoothbox_student_t_ppf(q, df, sigma, a, b)
        assert abs(smoothbox_student_t_cdf(x, df, sigma, a, b) - q) < 1e-10


def test_uuinv_basic():
    B = [-2.0, -1.0, 1.0, 2.0]
    w = 0.5
    p = np.linspace(0, 1, 101)
    x = uuinv(p, B, w)
    assert np.all(np.diff(x) >= 0)  # monotone
    assert x[0] == B[0] and abs(x[-1] - B[3]) < 1e-12
    # Half the mass lands inside the plausible box.
    inner = (x >= B[1]) & (x <= B[2])
    assert abs(np.mean(inner) - w) < 0.05


def test_uuinv_w_one():
    B = [-2.0, -1.0, 1.0, 2.0]
    p = np.linspace(0, 1, 11)
    x = uuinv(p, B, 1.0)
    assert np.allclose(x, p * 2 - 1)


def test_uuinv_degenerate():
    # Outer intervals are points: delta + uniform mixture.
    B = [-1.0, -1.0, 1.0, 1.0]
    p = np.array([0.0, 0.2, 0.5, 0.8, 1.0])
    x = uuinv(p, B, 0.6)
    assert x[0] == -1.0 and x[-1] == 1.0


def test_uuinv_out_of_range_is_nan():
    B = [-2.0, -1.0, 1.0, 2.0]
    x = uuinv(np.array([-0.1, 1.1]), B, 0.5)
    assert np.all(np.isnan(x))


def test_vectorized_functions_match_reference_pointwise():
    """Our vectorized smoothbox cdf/ppf and uuinv equal the reference's
    scalar implementations on dense grids (reference f_min_fill.py:
    183-372)."""
    import sys

    sys.path.insert(0, "/root/reference")
    from gpyreg.f_min_fill import (
        smoothbox_cdf as r_cdf,
        smoothbox_ppf as r_ppf,
        smoothbox_student_t_cdf as r_tcdf,
        smoothbox_student_t_ppf as r_tppf,
        uuinv as r_uuinv,
    )

    from gpyreg_tpu.f_min_fill import (
        smoothbox_cdf,
        smoothbox_ppf,
        smoothbox_student_t_cdf,
        smoothbox_student_t_ppf,
        uuinv,
    )

    sigma, a, b, df = 0.7, -1.2, 2.3, 3.0
    xs = np.linspace(-6, 8, 101)
    qs = np.linspace(1e-6, 1 - 1e-6, 101)

    cdf_v = smoothbox_cdf(xs, sigma, a, b)
    tcdf_v = smoothbox_student_t_cdf(xs, df, sigma, a, b)
    for i, x in enumerate(xs):
        assert abs(cdf_v[i] - r_cdf(x, sigma, a, b)) < 1e-12
        assert abs(tcdf_v[i] - r_tcdf(x, df, sigma, a, b)) < 1e-12

    ppf_v = smoothbox_ppf(qs, sigma, a, b)
    tppf_v = smoothbox_student_t_ppf(qs, df, sigma, a, b)
    for i, q in enumerate(qs):
        # Deep upper tail: our 1 - Z*(1-q) argument deliberately
        # deviates from the reference's cancellation-prone
        # C*q - (C-1) by <= 1 ulp of the ARGUMENT, which the steep
        # tail quantile amplifies (reference ppf(1.0) can even return
        # finite); allow the amplified ulp there, bit-level elsewhere.
        tail = 1e-7 if q > 0.999 else 1e-10
        assert abs(ppf_v[i] - r_ppf(q, sigma, a, b)) < tail
        assert abs(tppf_v[i] - r_tppf(q, df, sigma, a, b)) < tail
    # Exact limits (the reference's own test_smoothbox.py:62-68, which
    # the pre-fix argument form failed for some (sigma, a, b)).
    assert smoothbox_ppf(0.0, sigma, a, b) == -np.inf
    assert smoothbox_ppf(1.0, sigma, a, b) == np.inf
    assert smoothbox_student_t_ppf(0.0, df, sigma, a, b) == -np.inf
    assert smoothbox_student_t_ppf(1.0, df, sigma, a, b) == np.inf

    for B, w in (
        ([-3.0, -1.0, 1.0, 3.0], 0.5),
        ([-3.0, -1.0, 1.0, 3.0], 0.0),
        ([-3.0, -1.0, 1.0, 3.0], 1.0),
        ([-1.0, -1.0, 1.0, 1.0], 0.6),  # degenerate outer intervals
    ):
        ours = uuinv(qs, B, w)
        ref = r_uuinv(qs, B, w)
        assert np.allclose(ours, ref, atol=1e-12, equal_nan=True)
    # Out-of-range quantiles -> NaN (reference behavior).
    bad = uuinv(np.array([-0.1, 1.1]), [-3.0, -1.0, 1.0, 3.0], 0.5)
    assert np.all(np.isnan(bad))
