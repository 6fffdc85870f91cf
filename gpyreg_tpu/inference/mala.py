"""Metropolis-adjusted Langevin (MALA) sampler, fully jitted.

Port of the MATLAB oracle's ``'mala'`` sampler option
(matlab/gplite/gplite_train.m:409-431; the ``malasample_vbmc`` backend
itself is not shipped in the reference tree, so the transition kernel
here is the standard MALA construction).  The gplite driver conventions
are preserved: the step-size preconditioner defaults to the slice
``Widths`` (gplite_train.m:417-422), and because MALA moves all
dimensions at once the driver scales the sample/burn/thin counts by the
number of hyperparameters (gplite_train.m:413,424,431) — that scaling
lives in :meth:`gpyreg_tpu.gp.GP.fit`.

TPU-native design: the proposal uses the same ``value_and_grad`` bundle
as the MAP optimizer (autodiff replaces gplite's hand-coded gradients),
and the whole chain — proposal, Metropolis correction, dual-averaging
step-size adaptation during burn-in — runs inside one ``lax.scan``
program with a single packed device->host pull, like the device slice
sampler (inference/device_slice.py).

Transition kernel (per step, position x, step size e, preconditioner
M = diag(widths^2)):

    mu_fwd = x + (e^2/2) * M * grad log pi(x)
    x'     = mu_fwd + e * sqrt(M) * xi,          xi ~ N(0, I)
    log a  = log pi(x') - log pi(x)
             + log q(x | x') - log q(x' | x)     (Metropolis-Hastings)

Out-of-bounds / NaN targets evaluate to -inf (always rejected), the
same contract as the slice samplers.  During burn-in two things adapt
(then freeze, so detailed balance holds for every kept sample):

1. the scalar step size, toward the 0.574 optimal MALA acceptance rate
   (Roberts & Rosenthal 1998) by Robbins-Monro on log e;
2. the diagonal preconditioner, re-estimated from the running
   per-dimension chain variance (Welford) — the initial ``widths`` come
   from the space-filling design's spread, which can overestimate the
   posterior scale of individual hyperparameters by orders of
   magnitude, and a scalar step size cannot fix a mismatched diagonal
   (the same reason the slice sampler re-estimates widths from the
   burn-in second half, reference slice_sample.py:513-543).

The Langevin drift is norm-truncated (drift length capped at a few
preconditioner units — "truncated MALA", Roberts & Tweedie 1996) so a
single step into a steep-gradient region cannot catapult the chain.
"""

import logging
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_logger = logging.getLogger("MALASampler")

_TARGET_ACCEPT = 0.574  # optimal MALA acceptance (Roberts & Rosenthal)


def _masked_value_and_grad(log_f, LB, UB, f_args):
    """(x) -> (value, grad) with out-of-bounds/NaN -> (-inf, 0)."""
    vg = jax.value_and_grad(lambda x: log_f(x, *f_args))

    def f(x):
        v, g = vg(x)
        v = jnp.where(jnp.isnan(v), -jnp.inf, v)
        in_bounds = jnp.all((x >= LB) & (x <= UB))
        v = jnp.where(in_bounds, v, -jnp.inf)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return v, g

    return f


def _mala_step(log_f, LB, UB, M_sqrt, burn, f_args):
    """Per-iteration truncated-drift MALA kernel, shared by the
    monolithic chain and the segmented (bounded-dispatch) chain —
    ``burn`` may be a traced scalar in the latter.  Returns
    ``(vg, step)``."""
    vg = _masked_value_and_grad(log_f, LB, UB, f_args)
    free = M_sqrt > 0.0  # fixed dims (LB == UB) carry zero scale
    _MAX_DRIFT = 4.0  # truncated-MALA drift cap, preconditioner units
    _ADAPT_START = 16  # Welford warm-up before rescaling the diagonal

    def log_q(x_to, mu, M_inv_sqrt):
        # N(mu, e^2 M) log density up to the normalization (cancels in
        # the MH ratio: forward and backward share the same e and M);
        # the caller divides by e^2.
        z = (x_to - mu) * M_inv_sqrt
        return -0.5 * jnp.sum(z * z)

    def step(carry, it):
        x, v, g, log_eps, m_sqrt, w_mean, w_m2, key = carry
        key, k_prop, k_acc = jax.random.split(key, 3)
        eps = jnp.exp(log_eps)
        e2 = eps * eps
        M = m_sqrt * m_sqrt
        m_inv_sqrt = jnp.where(free, 1.0 / jnp.where(free, m_sqrt, 1.0), 0.0)

        # Truncated Langevin drift: cap its preconditioned length.
        drift = 0.5 * e2 * M * g
        dnorm = jnp.sqrt(jnp.sum((drift * m_inv_sqrt) ** 2))
        cap = _MAX_DRIFT * eps
        drift = drift * jnp.minimum(1.0, cap / jnp.maximum(dnorm, 1e-300))

        mu_fwd = x + drift
        xi = jax.random.normal(k_prop, x.shape, dtype=x.dtype)
        x_new = mu_fwd + eps * m_sqrt * xi
        v_new, g_new = vg(x_new)
        drift_b = 0.5 * e2 * M * g_new
        dnorm_b = jnp.sqrt(jnp.sum((drift_b * m_inv_sqrt) ** 2))
        drift_b = drift_b * jnp.minimum(
            1.0, cap / jnp.maximum(dnorm_b, 1e-300)
        )
        mu_bwd = x_new + drift_b

        # log q ratio with the shared e^2 scale (normalizations cancel).
        log_ratio = (
            v_new
            - v
            + (
                log_q(x, mu_bwd, m_inv_sqrt)
                - log_q(x_new, mu_fwd, m_inv_sqrt)
            )
            / e2
        )
        log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
        accept_p = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_ratio, 0.0)))
        u = jax.random.uniform(k_acc, minval=jnp.finfo(x.dtype).tiny)
        accept = jnp.log(u) < log_ratio

        x = jnp.where(accept, x_new, x)
        v = jnp.where(accept, v_new, v)
        g = jnp.where(accept, g_new, g)

        # --- burn-in adaptation (frozen afterwards) ---
        adapt = it < burn
        # Robbins-Monro on log e toward the optimal acceptance.
        eta = (it + 1.0) ** -0.55
        log_eps = jnp.where(
            adapt,
            log_eps + eta * (accept_p - _TARGET_ACCEPT),
            log_eps,
        )
        # Welford running variance of the chain -> preconditioner.
        cnt = it + 1.0
        delta = x - w_mean
        w_mean_new = w_mean + delta / cnt
        w_m2_new = w_m2 + delta * (x - w_mean_new)
        w_mean = jnp.where(adapt, w_mean_new, w_mean)
        w_m2 = jnp.where(adapt, w_m2_new, w_m2)
        var = w_m2 / jnp.maximum(cnt - 1.0, 1.0)
        # Rescale only after a warm-up, floored against collapse when
        # the early chain barely moves.
        m_est = jnp.sqrt(jnp.maximum(var, 1e-6 * M_sqrt * M_sqrt))
        use_est = jnp.logical_and(adapt, it >= _ADAPT_START)
        m_sqrt = jnp.where(
            jnp.logical_and(use_est, free), m_est, m_sqrt
        )
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


def _pack(v0, log_eps, xs, vs, accepts, burn, f_args, log_prior):
    """One-pull result packing shared by the monolithic and segmented
    chains: row 0 = [init_log_Px, accept_rate(post-burn),
    final_log_eps, 0...]; rows 1..n = [f_val, log_prior, x] — the ABI
    sample() reads (hmc._pack mirrors the same layout)."""
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


@partial(
    jax.jit,
    static_argnames=("log_f", "n_iters", "burn", "log_prior"),
)
def _run_chain(
    log_f,
    x0,  # (D,)
    key,
    LB,
    UB,
    M_sqrt,  # (D,) preconditioner sqrt diagonal (widths)
    log_eps0,  # scalar, log initial step size
    n_iters: int,
    burn: int,
    f_args,
    log_prior=None,
):
    vg, step = _mala_step(log_f, LB, UB, M_sqrt, burn, f_args)
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


# --- Segmented (bounded-dispatch) chain: same kernel, same stream, but
# no single dispatch runs more than ``seg`` iterations (the TPU runtime
# kills dispatches executing >~6 min; see device_slice.py).  The carry
# (position, value, gradient, step size, preconditioner, Welford
# moments, key) stays device-resident between dispatches; sample blocks
# are packed by one final program (one pull).


@partial(jax.jit, static_argnames=("log_f",))
def _mala_init(log_f, x0, key, LB, UB, M_sqrt, log_eps0, f_args):
    vg = _masked_value_and_grad(log_f, LB, UB, f_args)
    v0, g0 = vg(x0)
    z = jnp.zeros_like(x0)
    return (x0, v0, g0, log_eps0, M_sqrt, z, z, key), v0


@partial(jax.jit, static_argnames=("log_f", "seg"))
def _mala_seg(log_f, carry, i0, LB, UB, M_sqrt, burn, seg: int, f_args):
    _, step = _mala_step(log_f, LB, UB, M_sqrt, burn, f_args)
    carry, (xs, vs, accepts) = lax.scan(
        step, carry, i0 + jnp.arange(seg, dtype=carry[0].dtype)
    )
    return carry, xs, vs, accepts


@partial(
    jax.jit, static_argnames=("n_iters", "burn", "log_prior")
)
def _mala_pack(
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
    # Trailing padding iterations (equal-size segments) are discarded
    # here; they never reach the host.
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
    f_args,
    log_prior,
    seg,
):
    """Bounded-dispatch twin of :func:`_run_chain` (same packed output).

    Segments are equal-sized (ONE compiled program — a ragged tail
    would remote-compile a second multi-minute program at 16k); the
    final segment may overshoot ``n_iters``, and the pack program
    discards the overshoot before anything reaches the host."""
    n_segs = -(-int(n_iters) // int(seg))
    seg_eq = -(-int(n_iters) // n_segs)
    carry, v0 = _mala_init(
        log_f, x0, key, LB, UB, M_sqrt, log_eps0, f_args
    )
    xs_blocks, vs_blocks, acc_blocks = [], [], []
    for k in range(n_segs):
        carry, xs, vs, acc = _mala_seg(
            log_f,
            carry,
            np.float64(k * seg_eq),
            LB,
            UB,
            M_sqrt,
            np.float64(burn),
            seg_eq,
            f_args,
        )
        xs_blocks.append(xs)
        vs_blocks.append(vs)
        acc_blocks.append(acc)
    return _mala_pack(
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
    f_args=(),
    log_prior=None,
    diagnostics: bool = True,
    seg_iters: int = None,
):
    """Draw ``n_samples`` (thinned) samples from ``log_f`` with MALA.

    Interface mirrors :func:`gpyreg_tpu.inference.device_slice.sample`:
    ``log_f`` is a jittable ``(x, *f_args) -> scalar`` log density;
    ``widths`` sets the diagonal preconditioner (gplite_train.m:417-422
    uses the slice widths); ``step_size`` the initial global step-size
    scale (gplite's ``Stepsize`` option, gplite_train.m:40; default
    ``(2.4)/sqrt(D)``, the classic preconditioned-proposal scaling,
    adapted during burn-in).  ``log_prior`` (optional, jittable
    ``(x, *f_args) -> scalar``) reports per-sample prior values in
    ``log_priors`` and is excluded from ``f_vals``.

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
    # Fixed dimensions (LB == UB) get zero proposal scale: pinned.
    w = np.where(LBa == UBa, 0.0, w)

    if step_size is None:
        step_size = 2.4 / np.sqrt(D)
    if burn is None:
        burn = round(n_samples / 3)
    eff = n_samples * thin
    n_iters = int(burn + eff)

    chain = (
        _run_chain_segmented if seg_iters is not None else _run_chain
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
            n_iters,
            int(burn),
            tuple(f_args),
            log_prior,
            *(() if seg_iters is None else (int(seg_iters),)),
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
