"""Static model specification and the pure mean/noise/cov evaluators.

A :class:`ModelSpec` is a hashable, frozen description of the GP model
family (covariance kind, mean kind, noise feature flags, dimension).  It is
passed as a static argument to jitted functions, so each model family
compiles once per data shape.

Hyperparameter vector layout matches the reference exactly
(gaussian_process.py:174: cov hyps, then noise hyps, then mean hyps).
"""

from dataclasses import dataclass

import jax.numpy as jnp

from ..ops.kernels import cov_hyp_count, kernel_matrix

COV_KINDS = (
    "se",
    "m1",
    "m3",
    "m5",
    "rq",
    "se_iso",
    "m1_iso",
    "m3_iso",
    "m5_iso",
)
MEAN_KINDS = (
    "zero",
    "const",
    "negquad",
    # gplite-oracle means (gplite_meanfun.m:10-18)
    "linear",
    "quad",
    "posquad",
    "se_mean",
    "negse_mean",
)

# User-supplied mean functions (the oracle accepts function handles,
# gplite_meanfun.m:10-18,43-50).  Registered callables are keyed by name
# so the ModelSpec stays a frozen/hashable string-keyed description:
# spec.mean == "custom:<name>" dispatches here.  Entries are
# (value_fn, hyp_count_fn) with value_fn(hyp_mean, X) -> (N,) jittable
# and hyp_count_fn(D) -> int.
_CUSTOM_MEANS = {}


def register_custom_mean(name: str, value_fn, hyp_count):
    """Register a user mean function under ``name``.

    ``value_fn(hyp_mean, X) -> (N,)`` must be jittable (pure jax.numpy);
    ``hyp_count`` is an int or a callable ``D -> int``.  Re-registering
    the same name with the same callable is a no-op; with a different
    callable it raises (compiled programs are cached per spec string —
    silently swapping the function under a live name would serve stale
    compilations).
    """
    count_fn = hyp_count if callable(hyp_count) else (lambda D: int(hyp_count))
    if name in _CUSTOM_MEANS:
        if _CUSTOM_MEANS[name][0] is not value_fn:
            raise ValueError(
                f"A different mean function is already registered under "
                f"{name!r}; pick a unique name (compiled programs are "
                f"cached per registered name)."
            )
        return f"custom:{name}"
    _CUSTOM_MEANS[name] = (value_fn, count_fn)
    return f"custom:{name}"


def custom_mean_entry(kind: str):
    name = kind.split(":", 1)[1]
    if name not in _CUSTOM_MEANS:
        raise ValueError(
            f"Custom mean {name!r} is not registered (construct the "
            f"CustomMean / call register_custom_mean first)."
        )
    return _CUSTOM_MEANS[name]


@dataclass(frozen=True)
class ModelSpec:
    """Static GP model family description (hashable; jit-static)."""

    D: int
    cov: str  # one of COV_KINDS
    mean: str  # one of MEAN_KINDS
    noise_constant: bool  # constant_add
    noise_user: int  # 0: none, 1: add s2 as-is, 2: scaled by exp(hyp)
    noise_rectified: bool  # rectified-linear output-dependent noise
    outwarp: str = None  # None or an OUTWARP_KINDS entry

    def __post_init__(self):
        if self.cov not in COV_KINDS:
            raise ValueError(f"Unknown covariance kind {self.cov}")
        if self.mean.startswith("custom:"):
            custom_mean_entry(self.mean)  # raises if unregistered
        elif self.mean not in MEAN_KINDS:
            raise ValueError(f"Unknown mean kind {self.mean}")
        if self.outwarp is not None:
            from ..outwarp_functions import OUTWARP_KINDS

            if self.outwarp not in OUTWARP_KINDS:
                raise ValueError(
                    f"Unknown output warping kind {self.outwarp}"
                )

    @property
    def cov_N(self) -> int:
        return cov_hyp_count(self.cov, self.D)

    @property
    def mean_N(self) -> int:
        # reference mean_functions.py:27,155,284; gplite_meanfun.m:57-127
        if self.mean.startswith("custom:"):
            return custom_mean_entry(self.mean)[1](self.D)
        return {
            "zero": 0,
            "const": 1,
            "negquad": 1 + 2 * self.D,
            "linear": 1 + self.D,
            "quad": 1 + 2 * self.D,
            "posquad": 1 + 2 * self.D,
            "se_mean": 2 + 2 * self.D,
            "negse_mean": 2 + 2 * self.D,
        }[self.mean]

    @property
    def noise_N(self) -> int:
        # reference noise_functions.py:43-59
        n = 0
        if self.noise_constant:
            n += 1
        if self.noise_user == 2:
            n += 1
        if self.noise_rectified:
            n += 2
        return n

    @property
    def outwarp_N(self) -> int:
        if self.outwarp is None:
            return 0
        from ..outwarp_functions import outwarp_hyp_count

        return outwarp_hyp_count(self.outwarp)

    @property
    def hyp_N(self) -> int:
        return self.cov_N + self.noise_N + self.mean_N + self.outwarp_N

    # --- hyp slicing (cov | noise | mean | outwarp ordering,
    #     matlab/gplite/private/gplite_core.m:16) ---

    def split_hyp(self, hyp):
        c, n, m = self.cov_N, self.noise_N, self.mean_N
        return hyp[:c], hyp[c : c + n], hyp[c + n : c + n + m]

    def outwarp_hyp(self, hyp):
        return hyp[self.cov_N + self.noise_N + self.mean_N :]


def mean_value(spec: ModelSpec, hyp_mean, X):
    """Mean function m(X), shape (N,).

    Parity: reference mean_functions.py (ZeroMean :126, ConstantMean :255,
    NegativeQuadratic :384-388).
    """
    N, D = X.shape
    if spec.mean.startswith("custom:"):
        # User handle (gplite_meanfun.m:43-50): jittable value function.
        value_fn = custom_mean_entry(spec.mean)[0]
        return jnp.reshape(value_fn(hyp_mean, X), (N,))
    if spec.mean == "zero":
        return jnp.zeros((N,), dtype=X.dtype)
    if spec.mean == "const":
        return hyp_mean[0] * jnp.ones((N,), dtype=X.dtype)
    if spec.mean == "linear":
        return hyp_mean[0] + X @ hyp_mean[1 : 1 + D]
    if spec.mean == "quad":
        return (
            hyp_mean[0]
            + X @ hyp_mean[1 : 1 + D]
            + (X**2) @ hyp_mean[1 + D : 1 + 2 * D]
        )
    if spec.mean in ("negquad", "posquad"):
        sgn = -1.0 if spec.mean == "negquad" else 1.0
        m0 = hyp_mean[0]
        xm = hyp_mean[1 : 1 + D]
        omega = jnp.exp(hyp_mean[1 + D : 1 + 2 * D])
        z2 = ((X - xm) / omega) ** 2
        return m0 + sgn * 0.5 * jnp.sum(z2, axis=1)
    if spec.mean in ("se_mean", "negse_mean"):
        sgn = 1.0 if spec.mean == "se_mean" else -1.0
        m0 = hyp_mean[0]
        xm = hyp_mean[1 : 1 + D]
        omega = jnp.exp(hyp_mean[1 + D : 1 + 2 * D])
        hgt = jnp.exp(hyp_mean[1 + 2 * D])
        z2 = ((X - xm) / omega) ** 2
        return m0 + sgn * hgt * jnp.exp(-0.5 * jnp.sum(z2, axis=1))
    raise ValueError(f"Unknown mean kind {spec.mean}")


def noise_variance(spec: ModelSpec, hyp_noise, y, s2, dtype):
    """Observation noise variance sn2.

    Returns a scalar jnp array if the noise is input/output independent,
    else a (N,1) array — mirroring reference noise_functions.py:179-283.
    ``y`` and ``s2`` are (N,1) arrays or None (None handled statically).
    """
    i = 0
    if spec.noise_constant:
        sn2 = jnp.exp(2.0 * hyp_noise[i])
        i += 1
    else:
        # Floor at machine spacing, reference noise_functions.py:251.
        sn2 = jnp.asarray(jnp.finfo(jnp.float64).eps, dtype=dtype)

    if spec.noise_user == 1 and s2 is not None:
        sn2 = sn2 + s2
    elif spec.noise_user == 2:
        if s2 is not None:
            sn2 = sn2 + jnp.exp(hyp_noise[i]) * s2
        i += 1

    if spec.noise_rectified:
        if y is not None:
            y_thresh = hyp_noise[i]
            w2 = jnp.exp(2.0 * hyp_noise[i + 1])
            zz = jnp.maximum(0.0, y_thresh - y)
            sn2 = sn2 + w2 * zz**2
        i += 2

    return sn2


def cov_matrix(spec: ModelSpec, hyp_cov, X, Z=None, diag=False):
    return kernel_matrix(spec.cov, hyp_cov, X, Z=Z, diag=diag)
