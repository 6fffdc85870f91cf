"""Hamiltonian Monte Carlo sampler, fully jitted.

Port of the MATLAB oracle's ``'hmc'`` sampler option
(matlab/gplite/gplite_train.m:433-447; the ``hmc2`` backend itself is
not shipped in the reference tree, so the transition kernel here is the
standard leapfrog-HMC construction).  The gplite driver conventions are
preserved: 10 leapfrog steps per proposal (gplite_train.m:437), the
slice ``Widths`` as the position-scale preconditioner (:442), and —
unlike MALA — no Nhyp scaling of the sample/burn counts (an HMC
proposal already moves every dimension through a full trajectory).

TPU-native design mirrors :mod:`gpyreg_tpu.inference.mala`: the
trajectory gradients come from the same ``value_and_grad`` bundle as
the MAP optimizer, the whole chain runs as ``lax.scan`` over iterations
with an inner ``lax.scan`` over leapfrog steps, and the host pays ONE
packed device->host pull.  Above ``map_optimize.SEG_MIN_N`` padded rows
the chain runs as equal-size bounded dispatches with device-carried
state (the TPU runtime kills any dispatch executing longer than ~6
minutes; overshoot iterations are discarded in the pack program).

Kernel (position x, whitened coordinates z = x / m_sqrt on free dims):

    p0 ~ N(0, I);  L x [p += eps/2 m g;  x += eps m p;  p += eps/2 m g]
    log a = (v' - |p'|^2/2) - (v - |p0|^2/2)

Out-of-bounds / NaN targets evaluate to -inf with zero gradient (the
trajectory coasts; the MH test rejects), the same contract as the
slice/MALA samplers; the leapfrog map stays reversible and
volume-preserving, so the correction is exact.  During burn-in the
step size adapts by Robbins-Monro toward the 0.651 optimal HMC
acceptance rate (Beskos et al. 2013) with a +/-10% per-proposal step
jitter breaking trajectory periodicity, and the diagonal
preconditioner re-estimates from the running chain variance (Welford)
exactly as in MALA; both freeze after burn-in so detailed balance
holds for every kept sample.
"""

import logging
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .mala import _masked_value_and_grad

_logger = logging.getLogger("HMCSampler")

_TARGET_ACCEPT = 0.651  # optimal HMC acceptance (Beskos et al. 2013)
_ADAPT_START = 16  # Welford warm-up before rescaling the diagonal


def _hmc_step(log_f, LB, UB, M_sqrt, burn, n_leap, f_args):
    """Per-iteration leapfrog-HMC kernel shared by the monolithic and
    segmented chains (``burn`` may be traced in the latter)."""
    vg = _masked_value_and_grad(log_f, LB, UB, f_args)
    free = M_sqrt > 0.0  # fixed dims (LB == UB) carry zero scale

    def step(carry, it):
        x, v, g, log_eps, m_sqrt, w_mean, w_m2, key = carry
        key, k_mom, k_jit, k_acc = jax.random.split(key, 4)
        # +/-10% step jitter: fixed (eps, L) trajectories can resonate
        # with the target's length scales (Neal 2011 section 5.4.2.2).
        eps = jnp.exp(log_eps) * jax.random.uniform(
            k_jit, minval=0.9, maxval=1.1
        )
        p0 = (
            jax.random.normal(k_mom, x.shape, dtype=x.dtype)
            * free.astype(x.dtype)
        )

        def leap(c, _):
            xq, vq, gq, p = c
            p = p + 0.5 * eps * m_sqrt * gq
            xq = xq + eps * m_sqrt * p
            vq, gq = vg(xq)
            p = p + 0.5 * eps * m_sqrt * gq
            return (xq, vq, gq, p), None

        (x_new, v_new, g_new, p_new), _ = lax.scan(
            leap, (x, v, g, p0), None, length=n_leap
        )

        log_ratio = (v_new - 0.5 * jnp.sum(p_new * p_new)) - (
            v - 0.5 * jnp.sum(p0 * p0)
        )
        log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
        accept_p = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_ratio, 0.0)))
        u = jax.random.uniform(k_acc, minval=jnp.finfo(x.dtype).tiny)
        accept = jnp.log(u) < log_ratio

        x = jnp.where(accept, x_new, x)
        v = jnp.where(accept, v_new, v)
        g = jnp.where(accept, g_new, g)

        # --- burn-in adaptation (frozen afterwards), as in mala.py ---
        adapt = it < burn
        eta = (it + 1.0) ** -0.55
        log_eps = jnp.where(
            adapt, log_eps + eta * (accept_p - _TARGET_ACCEPT), log_eps
        )
        cnt = it + 1.0
        delta = x - w_mean
        w_mean_new = w_mean + delta / cnt
        w_m2_new = w_m2 + delta * (x - w_mean_new)
        w_mean = jnp.where(adapt, w_mean_new, w_mean)
        w_m2 = jnp.where(adapt, w_m2_new, w_m2)
        var = w_m2 / jnp.maximum(cnt - 1.0, 1.0)
        m_est = jnp.sqrt(jnp.maximum(var, 1e-6 * M_sqrt * M_sqrt))
        use_est = jnp.logical_and(adapt, it >= _ADAPT_START)
        m_sqrt = jnp.where(jnp.logical_and(use_est, free), m_est, m_sqrt)

        return (
            x,
            v,
            g,
            log_eps,
            m_sqrt,
            w_mean,
            w_m2,
            key,
        ), (x, v, accept)

    return vg, step


@partial(
    jax.jit,
    static_argnames=("log_f", "n_iters", "burn", "n_leap", "log_prior"),
)
def _run_chain(
    log_f,
    x0,
    key,
    LB,
    UB,
    M_sqrt,
    log_eps0,
    n_iters: int,
    burn: int,
    n_leap: int,
    f_args,
    log_prior=None,
):
    vg, step = _hmc_step(log_f, LB, UB, M_sqrt, burn, n_leap, f_args)
    v0, g0 = vg(x0)
    (x, v, g, log_eps, m_sqrt, _, _, key), (xs, vs, accepts) = lax.scan(
        step,
        (
            x0,
            v0,
            g0,
            log_eps0,
            M_sqrt,
            jnp.zeros_like(x0),
            jnp.zeros_like(x0),
            key,
        ),
        jnp.arange(n_iters, dtype=x0.dtype),
    )
    return _pack(v0, log_eps, xs, vs, accepts, burn, f_args, log_prior)


def _pack(v0, log_eps, xs, vs, accepts, burn, f_args, log_prior):
    """One-pull result layout (same as mala.py): row 0 =
    [init_log_Px, accept_rate, final_log_eps, 0...]; rows 1..n =
    [f_val, log_prior, x]."""
    kept_x = xs[burn:]
    kept_v = vs[burn:]
    if log_prior is not None:
        lp = jax.vmap(lambda h: log_prior(h, *f_args))(kept_x)
    else:
        lp = jnp.zeros_like(kept_v)
    D = xs.shape[1]
    acc_rate = jnp.mean(accepts[burn:].astype(xs.dtype))
    head = jnp.concatenate(
        [
            jnp.stack([v0, acc_rate, log_eps]),
            jnp.zeros((D - 1,), dtype=xs.dtype),
        ]
    )[None, :]
    body = jnp.concatenate(
        [kept_v[:, None], lp[:, None], kept_x], axis=1
    )
    return jnp.concatenate([head, body], axis=0)


# --- Segmented (bounded-dispatch) chain: mala.py pattern — equal-size
# segments (ONE compiled program), overshoot discarded in the pack.


@partial(jax.jit, static_argnames=("log_f",))
def _hmc_init(log_f, x0, key, LB, UB, M_sqrt, log_eps0, f_args):
    vg = _masked_value_and_grad(log_f, LB, UB, f_args)
    v0, g0 = vg(x0)
    z = jnp.zeros_like(x0)
    return (x0, v0, g0, log_eps0, M_sqrt, z, z, key), v0


@partial(jax.jit, static_argnames=("log_f", "seg", "n_leap"))
def _hmc_seg(
    log_f, carry, i0, LB, UB, M_sqrt, burn, seg: int, n_leap: int, f_args
):
    _, step = _hmc_step(log_f, LB, UB, M_sqrt, burn, n_leap, f_args)
    carry, (xs, vs, accepts) = lax.scan(
        step, carry, i0 + jnp.arange(seg, dtype=carry[0].dtype)
    )
    return carry, xs, vs, accepts


@partial(jax.jit, static_argnames=("n_iters", "burn", "log_prior"))
def _hmc_pack_blocks(
    v0,
    log_eps,
    xs_blocks,
    vs_blocks,
    acc_blocks,
    n_iters: int,
    burn: int,
    f_args,
    log_prior,
):
    xs = jnp.concatenate(xs_blocks, axis=0)[:n_iters]
    vs = jnp.concatenate(vs_blocks, axis=0)[:n_iters]
    accepts = jnp.concatenate(acc_blocks, axis=0)[:n_iters]
    return _pack(v0, log_eps, xs, vs, accepts, burn, f_args, log_prior)


def _run_chain_segmented(
    log_f,
    x0,
    key,
    LB,
    UB,
    M_sqrt,
    log_eps0,
    n_iters,
    burn,
    n_leap,
    f_args,
    log_prior,
    seg,
):
    n_segs = -(-int(n_iters) // int(seg))
    seg_eq = -(-int(n_iters) // n_segs)
    carry, v0 = _hmc_init(
        log_f, x0, key, LB, UB, M_sqrt, log_eps0, f_args
    )
    xs_blocks, vs_blocks, acc_blocks = [], [], []
    for k in range(n_segs):
        carry, xs, vs, acc = _hmc_seg(
            log_f,
            carry,
            np.float64(k * seg_eq),
            LB,
            UB,
            M_sqrt,
            np.float64(burn),
            seg_eq,
            int(n_leap),
            f_args,
        )
        xs_blocks.append(xs)
        vs_blocks.append(vs)
        acc_blocks.append(acc)
    return _hmc_pack_blocks(
        v0,
        carry[3],
        tuple(xs_blocks),
        tuple(vs_blocks),
        tuple(acc_blocks),
        int(n_iters),
        int(burn),
        f_args,
        log_prior,
    )


def sample(
    log_f,
    x0,
    key,
    n_samples: int,
    widths=None,
    LB=None,
    UB=None,
    burn: int = None,
    thin: int = 1,
    step_size: float = None,
    n_leapfrog: int = 10,
    f_args=(),
    log_prior=None,
    diagnostics: bool = True,
    seg_iters: int = None,
):
    """Draw ``n_samples`` (thinned) samples from ``log_f`` with HMC.

    Interface mirrors :func:`gpyreg_tpu.inference.mala.sample`.
    ``n_leapfrog`` is gplite's ``steps`` (default 10,
    gplite_train.m:437); ``step_size`` the initial step size (gplite's
    ``stepadj``, default 0.01, :439 — adapted during burn-in);
    ``widths`` the position-scale preconditioner (:442).

    Returns ``(result_dict, final_position)``.
    """
    x0 = np.asarray(x0, dtype=np.float64).ravel()
    D = x0.shape[0]

    def _expand(v, default):
        if v is None:
            return np.full((D,), default)
        return np.broadcast_to(
            np.asarray(v, dtype=np.float64).ravel(), (D,)
        ).copy()

    LBa = _expand(LB, -np.inf)
    UBa = _expand(UB, np.inf)
    if np.any(x0 < LBa) or np.any(x0 > UBa):
        raise ValueError(
            "The initial starting point X0 is outside the bounds."
        )

    w = _expand(widths, np.nan)
    fin = np.isfinite(LBa) & np.isfinite(UBa)
    w = np.where(np.isnan(w), np.where(fin, (UBa - LBa) / 2.0, 1.0), w)
    w = np.maximum(w, np.finfo(np.float64).tiny)
    w = np.where(LBa == UBa, 0.0, w)  # fixed dims: pinned

    if step_size is None:
        step_size = 0.01
    if burn is None:
        burn = round(n_samples / 3)
    eff = n_samples * thin
    n_iters = int(burn + eff)

    chain = (
        _run_chain_segmented if seg_iters is not None else _run_chain
    )
    if seg_iters is not None:
        args_tail = (
            n_iters,
            int(burn),
            int(n_leapfrog),
            tuple(f_args),
            log_prior,
            int(seg_iters),
        )
    else:
        args_tail = (
            n_iters,
            int(burn),
            int(n_leapfrog),
            tuple(f_args),
            log_prior,
        )
    packed = np.asarray(
        chain(
            log_f,
            x0,
            key,
            # Host-side numpy: the uploads fold into the dispatch
            # (CLAUDE.md eager-upload rule; cf. device_slice.sample).
            LBa,
            UBa,
            np.asarray(w),
            np.float64(np.log(step_size)),
            *args_tail,
        )
    )  # the chain's single device->host pull
    init_log_Px = packed[0, 0]
    accept_rate = float(packed[0, 1])
    if not np.isfinite(init_log_Px):
        raise ValueError(
            "The initial starting point X0 needs to evaluate to a real "
            "number (not Inf or NaN)."
        )
    f_vals = packed[1:, 0]
    log_priors = packed[1:, 1]
    samples = packed[1:, 2:]
    samples = samples[thin - 1 :: thin][:n_samples]
    f_vals = f_vals[thin - 1 :: thin][:n_samples]
    log_priors = log_priors[thin - 1 :: thin][:n_samples]

    if log_prior is not None:
        f_vals = f_vals - log_priors

    _logger.info(
        "\nSampling terminated: %d samples, burn-in %d, "
        "acceptance rate %.2f, final step size %.3g",
        n_samples,
        burn,
        accept_rate,
        float(np.exp(packed[0, 2])),
    )

    if diagnostics:
        from .device_slice import diagnose

        exit_flag, R, eff_N = diagnose(samples)
    else:
        exit_flag, R, eff_N = 0, None, None

    result = {
        "samples": samples,
        "f_vals": f_vals.reshape(-1, 1),
        "log_priors": log_priors,
        "exit_flag": exit_flag,
        "R": R,
        "eff_N": eff_N,
        "accept_rate": accept_rate,
    }
    return result, samples[-1] if len(samples) else x0
