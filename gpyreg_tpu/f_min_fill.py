"""Space-filling hyperparameter initialization.

API parity with reference f_min_fill.py.  Design generation (Sobol or
uniform, warped through prior inverse-CDFs) happens on the host with
NumPy/SciPy — it is cheap and sequential.  The expensive part, evaluating
the objective at all N design points (the reference's top hot loop,
f_min_fill.py:175-176: 1024 sequential NLML evaluations), is delegated to
a batched evaluator: :class:`~gpyreg_tpu.gp.GP` passes a vectorized
``f_batch`` that runs chunked vmapped NLML on the TPU.
"""

import warnings

import numpy as np
import scipy as sp


def f_min_fill(
    f,
    x0,
    LB: np.ndarray,
    UB: np.ndarray,
    PLB: np.ndarray,
    PUB: np.ndarray,
    hprior: dict,
    N: int,
    design: str = None,
    f_batch=None,
):
    """Create a space-filling design, evaluate ``f`` everywhere, sort.

    Parameters mirror reference f_min_fill.py:11-57.  ``f_batch``, if
    given, maps an (N, hyp_N) array to an (N,) array of objective values
    in one call (the TPU-batched path); otherwise ``f`` is called
    point-wise like the reference.

    Returns (X sorted by objective ascending, sorted objective values).
    """
    if design is None:
        design = "sobol"

    N0 = x0.shape[0]
    n_vars = np.max(
        [x0.shape[1], np.size(LB), np.size(UB), np.size(PLB), np.size(PUB)]
    )

    # Clip provided points into bounds.
    x0 = np.minimum(np.maximum(x0, LB), UB)

    sX = None
    if N > N0:
        if design == "sobol":
            sampler = sp.stats.qmc.Sobol(d=n_vars, scramble=False)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                S = sampler.random(n=N - N0 + 1)[1:, :]  # drop the zero point
            # Random column permutation decorrelates the assignment of
            # Sobol dimensions to hyperparameters (reference :92).
            np.random.shuffle(S.T)
        elif design == "rand":
            S = np.random.uniform(size=(N - N0, n_vars))
        else:
            raise ValueError(
                "Unknown design: got "
                + design
                + ' and expected either "sobol" or "rand"'
            )
        sX = np.zeros((N - N0, n_vars))

        # Warp each dimension through its prior inverse-CDF
        # (reference f_min_fill.py:104-168).
        for i in range(n_vars):
            mu = hprior["mu"][i]
            sigma = hprior["sigma"][i]
            a = hprior["a"][i]
            b = hprior["b"][i]

            if not np.isfinite(mu) and not np.isfinite(sigma):
                # Uniform prior.
                if np.isfinite(LB[i]) and np.isfinite(UB[i]):
                    if LB[i] == UB[i]:
                        sX[:, i] = LB[i]
                    else:
                        # Mixture of uniforms over full/plausible boxes:
                        # half the mass inside the plausible box.
                        w = 0.5 ** (1 / n_vars)
                        sX[:, i] = uuinv(
                            S[:, i], [LB[i], PLB[i], PUB[i], UB[i]], w
                        )
                else:
                    sX[:, i] = S[:, i] * (PUB[i] - PLB[i]) + PLB[i]
            elif np.isfinite(a) and np.isfinite(b):
                # Smoothbox (student-t) prior; force fat tails df <= 3.
                df = hprior["df"][i]
                if not np.isfinite(df):
                    df = 3
                df = np.minimum(df, 3)
                if df == 0:
                    cdf_lb = smoothbox_cdf(LB[i], sigma, a, b)
                    cdf_ub = smoothbox_cdf(UB[i], sigma, a, b)
                    S_scaled = cdf_lb + (cdf_ub - cdf_lb) * S[:, i]
                    sX[:, i] = [
                        smoothbox_ppf(q, sigma, a, b) for q in S_scaled
                    ]
                else:
                    tcdf_lb = smoothbox_student_t_cdf(LB[i], df, sigma, a, b)
                    tcdf_ub = smoothbox_student_t_cdf(UB[i], df, sigma, a, b)
                    S_scaled = tcdf_lb + (tcdf_ub - tcdf_lb) * S[:, i]
                    sX[:, i] = [
                        smoothbox_student_t_ppf(q, df, sigma, a, b)
                        for q in S_scaled
                    ]
            else:
                # Gaussian / student-t prior; force fat tails df <= 3.
                df = hprior["df"][i]
                if not np.isfinite(df):
                    df = 3
                df = np.minimum(df, 3)
                if df == 0:
                    cdf_lb = sp.stats.norm.cdf((LB[i] - mu) / sigma)
                    cdf_ub = sp.stats.norm.cdf((UB[i] - mu) / sigma)
                    S_scaled = cdf_lb + (cdf_ub - cdf_lb) * S[:, i]
                    sX[:, i] = sp.stats.norm.ppf(S_scaled) * sigma + mu
                else:
                    tcdf_lb = sp.stats.t.cdf((LB[i] - mu) / sigma, df)
                    tcdf_ub = sp.stats.t.cdf((UB[i] - mu) / sigma, df)
                    S_scaled = tcdf_lb + (tcdf_ub - tcdf_lb) * S[:, i]
                    sX[:, i] = sp.stats.t.ppf(S_scaled, df) * sigma + mu

    X = x0 if sX is None else np.concatenate([x0, sX])

    if f_batch is not None:
        y = np.asarray(f_batch(X), dtype=np.float64).reshape(-1)
        # Failed evaluations (NaN from an unfactorizable kernel matrix)
        # sort last instead of aborting the whole design.
        y = np.where(np.isfinite(y), y, np.inf)
    else:
        y = np.full((N,), np.inf)
        for i in range(N):
            y[i] = f(X[i, :])

    order = np.argsort(y)
    return X[order, :], y[order]


def uuinv(p, B, w):
    """Inverse CDF of a mixture of uniforms.

    ``w * U(B[1], B[2]) + (1-w)/2 * (U(B[0], B[1]) + U(B[2], B[3]))``
    — reference f_min_fill.py:183-246, including the degenerate
    delta-mixture case when the outer intervals have zero length.
    """
    assert B[0] <= B[1] <= B[2] <= B[3]
    assert 0 <= w <= 1
    p = np.asarray(p, dtype=np.float64)
    x = np.zeros(p.shape)
    L = B[3] - B[0] + B[1] - B[2]

    if w == 1:
        return p * (B[2] - B[1]) + B[1]

    if L == 0:
        # Outer intervals are points: delta + uniform mixture.
        i1 = p <= (1 - w) / 2
        x[i1] = B[0]
        if w != 0:
            i2 = (p <= (1 - w) / 2 + w) & ~i1
            x[i2] = (p[i2] - (1 - w) / 2) * (B[2] - B[1]) / w + B[1]
        i3 = p > (1 - w) / 2 + w
        x[i3] = B[3]
        return x

    # Lower outer segment.
    p1 = (1 - w) * (B[1] - B[0]) / L
    i1 = p <= p1
    x[i1] = B[0] + p[i1] * L / (1 - w)

    # Plausible (inner) segment.
    i2 = (p <= p1 + w) & ~i1
    if w != 0:
        x[i2] = (p[i2] - p1) * (B[2] - B[1]) / w + B[1]

    # Upper outer segment.
    i3 = p > p1 + w
    x[i3] = (p[i3] - w - p1) * L / (1 - w) + B[2]

    x[p < 0] = np.nan
    x[p > 1] = np.nan
    return x


def smoothbox_cdf(x: float, sigma: float, a: float, b: float):
    """CDF of the smoothbox distribution: flat on [a, b] with Gaussian
    flanks of scale sigma (reference f_min_fill.py:249-274)."""
    # Normalization so the pdf integrates to 1.
    C = 1.0 + (b - a) / (sigma * np.sqrt(2 * np.pi))
    if x < a:
        return sp.stats.norm.cdf(x, loc=a, scale=sigma) / C
    if x <= b:
        return (0.5 + (x - a) / (sigma * np.sqrt(2 * np.pi))) / C
    return (C - 1.0 + sp.stats.norm.cdf(x, loc=b, scale=sigma)) / C


def smoothbox_student_t_cdf(
    x: float, df: float, sigma: float, a: float, b: float
):
    """CDF of the smoothbox student-t distribution (t flanks)."""
    c = sp.special.gamma(0.5 * (df + 1)) / (
        sp.special.gamma(0.5 * df) * sigma * np.sqrt(df * np.pi)
    )
    C = 1.0 + (b - a) * c
    if x < a:
        return sp.stats.t.cdf(x, df, loc=a, scale=sigma) / C
    if x <= b:
        return (0.5 + (x - a) * c) / C
    return (C - 1.0 + sp.stats.t.cdf(x, df, loc=b, scale=sigma)) / C


def smoothbox_ppf(q: float, sigma: float, a: float, b: float):
    """Quantile function of the smoothbox distribution."""
    C = 1.0 + (b - a) / (sigma * np.sqrt(2 * np.pi))
    if q < 0.5 / C:
        return sp.stats.norm.ppf(C * q, loc=a, scale=sigma)
    if q <= (C - 0.5) / C:
        return (q * C - 0.5) * sigma * np.sqrt(2 * np.pi) + a
    return sp.stats.norm.ppf(C * q - (C - 1), loc=b, scale=sigma)


def smoothbox_student_t_ppf(
    q: float, df: float, sigma: float, a: float, b: float
):
    """Quantile function of the smoothbox student-t distribution."""
    c = sp.special.gamma(0.5 * (df + 1)) / (
        sp.special.gamma(0.5 * df) * sigma * np.sqrt(df * np.pi)
    )
    C = 1.0 + (b - a) * c
    if q < 0.5 / C:
        return sp.stats.t.ppf(C * q, df, loc=a, scale=sigma)
    if q <= (C - 0.5) / C:
        return (q * C - 0.5) / c + a
    return sp.stats.t.ppf(C * q - (C - 1), df, loc=b, scale=sigma)
