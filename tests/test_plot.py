"""Smoke tests for GP.plot (reference gaussian_process.py:1985-2215):
panel layout for D=1 and D=2, with and without data overlay."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

import gpyreg_tpu as gpr


def _fitted_gp(D):
    rng = np.random.default_rng(0)
    N = 25
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
    hyp = np.concatenate([np.zeros(D), [0.0], [-2.0], [0.0]])[None, :]
    gp.update(X_new=X, y_new=y, hyp=hyp)
    return gp


def test_plot_1d():
    gp = _fitted_gp(1)
    gp.plot()
    assert plt.gcf().axes, "plot produced no axes"
    plt.close("all")


def test_plot_2d():
    gp = _fitted_gp(2)
    gp.plot(delta_y=2.0)
    # D x D panel matrix (diagonal profiles + off-diagonal contours).
    assert len(plt.gcf().axes) >= 4
    plt.close("all")


def _profile_inputs(gp, i, lo, hi, x0, n_line=1000):
    ticks, pts = gp._plot_line_inputs(i, lo, hi, n_line, x0)
    mu, s2 = gp.predict(pts, add_noise=False)
    return np.asarray(ticks), mu.ravel(), s2.ravel()


def test_plot_2d_panel_semantics():
    """Pins the reference's visual contract (gaussian_process.py:
    1985-2215): D x D layout, the diagonal profile's mean line and
    +/-1.96 sigma band equal hand-computed predictions, the x0
    marker sits at the argmax-y data point, and the lower-triangle
    panel contours the SD while the upper contours the mean."""
    gp = _fitted_gp(2)
    fig = gp.plot()
    axes = fig.axes
    assert len(axes) == 4  # D x D

    # Expected default ranges: data box +/- RMS posterior lengthscale
    # (hyp log-ell = 0 -> reach 1.0 exactly).
    lo = np.min(gp.X, axis=0) - 1.0
    hi = np.max(gp.X, axis=0) + 1.0
    x0 = gp.X[np.argmax(gp.y.ravel())]

    for i, ax in ((0, axes[0]), (1, axes[3])):
        ticks, mu, s2 = _profile_inputs(gp, i, lo[i], hi[i], x0)
        band = 1.96 * np.sqrt(s2)
        lines = ax.get_lines()
        # mean, lower band, upper band, x0 vline (in draw order)
        ys = [ln.get_ydata() for ln in lines[:3]]
        np.testing.assert_allclose(ys[0], mu, rtol=0, atol=1e-10)
        got_band = sorted(
            (ys[1], ys[2]), key=lambda v: float(np.sum(v))
        )
        np.testing.assert_allclose(
            got_band[0], mu - band, rtol=0, atol=1e-10
        )
        np.testing.assert_allclose(
            got_band[1], mu + band, rtol=0, atol=1e-10
        )
        # x0 marker on the profile.
        vx = lines[3].get_xdata()
        assert np.allclose(vx, x0[i])
        assert ax.get_xlim() == (lo[i], hi[i])

    # Off-diagonal orientation: lower panel (axes[2] = axes[1][0])
    # spans (x_1, x_2) ranges; upper (axes[1] = axes[0][1]) the swap.
    assert np.allclose(axes[2].get_xlim(), (lo[0], hi[0]))
    assert np.allclose(axes[2].get_ylim(), (lo[1], hi[1]))
    assert np.allclose(axes[1].get_xlim(), (lo[1], hi[1]))
    assert np.allclose(axes[1].get_ylim(), (lo[0], hi[0]))
    # Lower contours the SD field, upper the mean field: compare the
    # contour level ranges against hand-computed field ranges.
    n_grid = 100
    gx = np.linspace(lo[0], hi[0], n_grid)
    gy = np.linspace(lo[1], hi[1], n_grid)
    GX, GY = np.meshgrid(gx, gy)
    pts = np.broadcast_to(x0, (n_grid * n_grid, 2)).copy()
    pts[:, 0] = GX.ravel()
    pts[:, 1] = GY.ravel()
    mu, s2 = gp.predict(pts, add_noise=False)
    sd = np.sqrt(s2)

    def _levels(ax):
        from matplotlib.contour import QuadContourSet

        for obj in ax.findobj(QuadContourSet):
            return np.asarray(obj.levels)
        return None

    lv_sd = _levels(axes[2])
    lv_mu = _levels(axes[1])
    if lv_sd is not None and lv_mu is not None:
        # Auto levels bracket the field range.
        assert lv_sd.min() >= 0.0
        assert lv_sd.max() <= sd.max() + np.ptp(sd)
        assert lv_mu.min() >= mu.min() - np.ptp(mu)
        assert lv_mu.max() <= mu.max() + np.ptp(mu)
        # And the two panels plot DIFFERENT fields: an SD level set
        # lives inside the SD range, far from the mean's (which goes
        # negative here).
        assert lv_mu.min() < 0 < lv_sd.min() + lv_sd.max()
    plt.close("all")


def test_plot_delta_y_auto_ranging():
    """delta_y zooms each diagonal axis to the contiguous tick window
    where |mean - mean(x0)| < delta_y, widened by half a step
    (reference gaussian_process.py delta-y zoom semantics) — computed
    by hand here and compared to the axis limits."""
    gp = _fitted_gp(2)
    delta_y = 0.5
    lo = np.min(gp.X, axis=0) - 1.0
    hi = np.max(gp.X, axis=0) + 1.0
    x0 = gp.X[np.argmax(gp.y.ravel())]
    mu0, _ = gp.predict(np.atleast_2d(x0), add_noise=False)

    expected = []
    for i in range(2):
        ticks, mu, _ = _profile_inputs(gp, i, lo[i], hi[i], x0)
        near = np.abs(mu - mu0.ravel()[0]) < delta_y
        step = ticks[1] - ticks[0]
        sel = np.nonzero(near)[0]
        assert sel.size, "test setup: delta_y window must be non-empty"
        expected.append(
            (ticks[sel[0]] - 0.5 * step, ticks[sel[-1]] + 0.5 * step)
        )
        # the zoom must actually engage (a vacuous window would make
        # this test pin nothing)
        assert expected[-1][0] > lo[i] or expected[-1][1] < hi[i]

    fig = gp.plot(delta_y=delta_y)
    axes = fig.axes
    for i, ax in ((0, axes[0]), (1, axes[3])):
        np.testing.assert_allclose(
            ax.get_xlim(), expected[i], rtol=1e-12
        )
    plt.close("all")
