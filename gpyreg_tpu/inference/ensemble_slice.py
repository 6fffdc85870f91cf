"""Ensemble slice sampling, fully jitted (device-resident).

Port of the MATLAB oracle's ensemble MCMC (eissample_lite.m, default
transition operator transSliceSampleRD :938-998): each walker slice
samples along the difference direction of two other walkers
(``w = (x_r2 - x_r1) * sigma_factor``), giving an affine-invariant,
gradient-free sampler that adapts to the posterior's scale/correlation
automatically.

TPU-native redesign: instead of the oracle's sequential walker updates,
walkers are split into two half-ensembles updated alternately (the
standard complementary-ensembles construction, valid MCMC): every walker
in the active half draws its direction from the *frozen* half, so the
whole half updates in one vmapped batch — K/2 slice shrinkage loops and
their log-density evaluations fuse into single batched XLA ops per step.

The 1-D slice update along direction w from x: level = logP + log(u);
bracket t in [-r, 1-r] (direction already carries the scale); shrink on
rejection; out-of-bounds and NaN evaluate to -inf (eissample_lite.m's
logPfuns contract).
"""

import logging
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_logger = logging.getLogger("EnsembleSliceSampler")


@lru_cache(maxsize=None)
def _log_prior_batch_fn(log_prior, n_args: int):
    """Jitted batched log-prior evaluation, cached on the callable's
    identity (get_fns bundles are lru_cached per model spec, so warm
    refits reuse the compiled program)."""
    in_axes = (0,) + (None,) * n_args
    return jax.jit(jax.vmap(log_prior, in_axes=in_axes))


def diagnose_ensemble(chain_x, n_requested: int):
    """Cross-walker convergence diagnostics of an ensemble chain.

    ``chain_x`` is the post-burn (n_iters, K, D) walker history.  Every
    walker is an MCMC chain targeting the same density, so the standard
    multi-chain Gelman-Rubin R-hat / effective-N estimators apply
    directly (the MATLAB oracle computes the same cross-walker
    diagnostics in eissample_lite.m's output stage; thresholds and exit
    flags mirror reference slice_sample.py:604-647: 1 converged,
    -3 max R > 1.5, -2 max R > 1.1, -1 eff_N < requested/10, 0 unknown).
    """
    from ..slice_sample import effective_n, gelman_rubin

    n_iters, K, D = chain_x.shape
    if n_iters < 2 or K < 2:
        return 0, None, None
    chains = np.transpose(np.asarray(chain_x), (1, 0, 2))  # (K, n, D)
    R = gelman_rubin(chains)
    eff_N = effective_n(chains)
    # The variogram estimator's truncated sum can come up empty on very
    # short per-walker chains (the ensemble trades chain length for
    # width), yielding a non-positive artifact; fall back to the
    # independent-draw bound m*n — exactly what the estimator gives when
    # only the lag-0 autocorrelation term survives.
    eff_N = np.where(
        np.isfinite(eff_N) & (eff_N > 0), eff_N, float(K * n_iters)
    )

    exit_flag = 0
    if np.any(R > 1.5):
        _logger.info(
            " * Detected lack of convergence! (max R = %.2f >> 1, "
            "mean R = %.2f)",
            np.max(R),
            np.mean(R),
        )
        exit_flag = -3
    elif np.any(R > 1.1):
        _logger.info(
            " * Detected probable lack of convergence! (max R = %.2f > 1"
            ", mean R = %.2f)",
            np.max(R),
            np.mean(R),
        )
        exit_flag = -2
    if np.any(eff_N < n_requested / 10.0):
        _logger.info(
            " * Low number of effective samples! (min eff_N = %.1f, "
            "mean eff_N = %.1f, requested N = %d)",
            np.min(eff_N),
            np.mean(eff_N),
            n_requested,
        )
        if exit_flag == 0:
            exit_flag = -1
    if exit_flag == 0:
        exit_flag = 1
    return exit_flag, R, eff_N


def _masked_log_f(log_f, LB, UB, f_args):
    def f(x):
        v = log_f(x, *f_args)
        in_bounds = jnp.all((x >= LB) & (x <= UB))
        v = jnp.where(jnp.isnan(v), -jnp.inf, v)
        return jnp.where(in_bounds, v, -jnp.inf)

    return f


def _eis_step(logpdf, H, max_shrink, sigma_factor):
    """One ensemble iteration (both half-ensemble moves), shared by the
    monolithic and the segmented (bounded-dispatch) chains."""

    def slice_1d(x, logP, w, key):
        """One slice-sampling move along direction w from x."""
        k_level, k_pos, k_prop = jax.random.split(key, 3)
        log_uprime = logP + jnp.log(
            jax.random.uniform(k_level, minval=jnp.finfo(x.dtype).tiny)
        )
        rr = jax.random.uniform(k_pos)
        t_l = -rr
        t_r = 1.0 - rr

        def cond(c):
            *_, shrink, done = c
            return jnp.logical_and(~done, shrink < max_shrink)

        def body(c):
            key, t_l, t_r, t, logPp, shrink, _ = c
            key, ku = jax.random.split(key)
            u = jax.random.uniform(ku)
            t_new = u * (t_r - t_l) + t_l
            logPp_new = logpdf(x + t_new * w)
            accept = logPp_new > log_uprime
            stuck = t_new == 0.0
            t_r_new = jnp.where(~accept & (t_new > 0.0), t_new, t_r)
            t_l_new = jnp.where(~accept & (t_new < 0.0), t_new, t_l)
            return (
                key,
                t_l_new,
                t_r_new,
                t_new,
                logPp_new,
                shrink + 1,
                accept | stuck,
            )

        init = (
            k_prop,
            t_l,
            t_r,
            jnp.asarray(0.0, dtype=x.dtype),
            logP,
            jnp.asarray(0, dtype=jnp.int32),
            jnp.asarray(False),
        )
        _, _, _, t, logP_new, _, done = lax.while_loop(
            cond, body, init
        )
        # On max_shrink cap exit (done=False) the carry holds the last
        # REJECTED proposal: the walker keeps its current position and
        # density (cf. device_slice.do_dim's cap-exit contract).
        t = jnp.where(done, t, 0.0)
        logP_new = jnp.where(done, logP_new, logP)
        return x + t * w, logP_new

    def update_half(active_x, active_logP, frozen_x, key):
        """Vmapped move of one half-ensemble; directions from the
        frozen half (eissample_lite.m:957-962 parallel branch)."""
        n = active_x.shape[0]
        keys = jax.random.split(key, n + 1)
        k_pick, k_moves = keys[0], keys[1:]
        # Two distinct frozen walkers per active walker.
        i1 = jax.random.randint(k_pick, (n,), 0, H)
        off = jax.random.randint(
            jax.random.fold_in(k_pick, 1), (n,), 1, H
        )
        i2 = (i1 + off) % H
        w = (frozen_x[i2] - frozen_x[i1]) * sigma_factor

        return jax.vmap(slice_1d)(active_x, active_logP, w, k_moves)

    def step(carry, _):
        xs, logPs, key = carry
        key, kA, kB = jax.random.split(key, 3)
        xA, lA = update_half(xs[:H], logPs[:H], xs[H:], kA)
        xB, lB = update_half(xs[H:], logPs[H:], xA, kB)
        xs = jnp.concatenate([xA, xB])
        logPs = jnp.concatenate([lA, lB])
        return (xs, logPs, key), (xs, logPs)

    return step


@partial(
    jax.jit,
    static_argnames=(
        "log_f",
        "n_iters",
        "max_shrink",
        "sigma_factor",
    ),
)
def _run(
    log_f,
    x0s,  # (K, D), K even
    key,
    LB,
    UB,
    n_iters: int,
    max_shrink: int,
    sigma_factor: float,
    f_args,
):
    K, D = x0s.shape
    logpdf = _masked_log_f(log_f, LB, UB, f_args)
    step = _eis_step(logpdf, K // 2, max_shrink, sigma_factor)
    logP0 = jax.vmap(logpdf)(x0s)
    (xs, logPs, _), (chain_x, chain_logP) = lax.scan(
        step, (x0s, logP0, key), None, length=n_iters
    )
    return chain_x, chain_logP, logP0


@partial(jax.jit, static_argnames=("log_f",))
def _eis_init(log_f, x0s, LB, UB, f_args):
    return jax.vmap(_masked_log_f(log_f, LB, UB, f_args))(x0s)


@partial(
    jax.jit,
    static_argnames=("log_f", "seg", "max_shrink", "sigma_factor"),
)
def _eis_seg(
    log_f,
    xs,
    logPs,
    key,
    LB,
    UB,
    seg: int,
    max_shrink: int,
    sigma_factor: float,
    f_args,
):
    logpdf = _masked_log_f(log_f, LB, UB, f_args)
    step = _eis_step(logpdf, xs.shape[0] // 2, max_shrink, sigma_factor)
    (xs, logPs, key), (chain_x, chain_logP) = lax.scan(
        step, (xs, logPs, key), None, length=seg
    )
    return xs, logPs, key, chain_x, chain_logP


def _run_segmented(
    log_f,
    x0s,
    key,
    LB,
    UB,
    n_iters: int,
    max_shrink: int,
    sigma_factor: float,
    f_args,
    seg: int,
):
    """Bounded-dispatch twin of :func:`_run` (TPU watchdog: see
    device_slice.py).  Segments are equal-sized (one compiled program);
    blocks concatenate host-side — the caller pulls the full chain
    history either way."""
    n_segs = -(-int(n_iters) // int(seg))
    seg_eq = -(-int(n_iters) // n_segs)
    logP0 = _eis_init(log_f, x0s, LB, UB, f_args)
    xs, logPs = x0s, logP0
    bx, bl = [], []
    done = 0
    while done < n_iters:
        xs, logPs, key, cx, cl = _eis_seg(
            log_f,
            xs,
            logPs,
            key,
            LB,
            UB,
            seg_eq,
            max_shrink,
            sigma_factor,
            f_args,
        )
        bx.append(cx)
        bl.append(cl)
        done += seg_eq
    chain_x = np.concatenate([np.asarray(b) for b in bx])[:n_iters]
    chain_logP = np.concatenate([np.asarray(b) for b in bl])[:n_iters]
    return chain_x, chain_logP, logP0


def sample(
    log_f,
    x0,
    key,
    n_samples: int,
    n_walkers: int = None,
    widths=None,
    LB=None,
    UB=None,
    burn: int = None,
    thin: int = 1,
    sigma_factor: float = 5.0,
    max_shrink: int = 256,
    f_args=(),
    log_prior=None,
    diagnostics: bool = True,
    seg_iters: int = None,
):
    """Draw ``n_samples`` from ``log_f`` with ensemble slice sampling.

    Interface mirrors eissample_lite.m:1-86: ``x0`` may be a single
    point or a (m, D) stack; missing walkers are created by jittering
    (eissample_lite.m:12-14); the default ensemble size is
    K = 2*(D+1) (:31-34) rounded up to even.  Returns
    (result_dict, final_walker_positions).

    ``log_prior`` (optional) is a jittable ``(x, *f_args) -> scalar``
    additive log-hyperprior already included in ``log_f``; when given,
    per-sample prior values are reported in ``log_priors`` and
    subtracted from ``f_vals`` (reference slice_sample.py:281-284
    result contract).  With ``diagnostics`` (default True), the result
    carries cross-walker split R-hat / effective-N and the reference's
    exit flags (see :func:`diagnose_ensemble`).
    """
    x0 = np.atleast_2d(np.asarray(x0, dtype=np.float64))
    D = x0.shape[1]
    if n_walkers is None:
        n_walkers = 2 * (D + 1)
    n_walkers = max(4, n_walkers + (n_walkers % 2))

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
    w = np.where(
        np.isnan(w), np.where(fin, (UBa - LBa) / 2.0, 10.0), w
    )

    # Build the ensemble: keep given rows, jitter to fill.
    key, k_fill = jax.random.split(key)
    if x0.shape[0] >= n_walkers:
        ens = x0[:n_walkers].copy()
    else:
        need = n_walkers - x0.shape[0]
        base = x0[np.arange(need) % x0.shape[0]]
        jitter = 0.1 * w * np.asarray(
            jax.random.normal(k_fill, (need, D))
        )
        ens = np.concatenate([x0, base + jitter])
    ens = np.minimum(np.maximum(ens, LBa), UBa)

    if burn is None:
        burn = int(np.ceil(n_samples / 3))
    # Samples per iteration = n_walkers; iterations needed:
    eff = n_samples * thin
    n_keep_iters = -(-eff // n_walkers)
    n_iters = burn + n_keep_iters

    runner = _run if seg_iters is None else partial(
        _run_segmented, seg=int(seg_iters)
    )
    chain_x, chain_logP, logP0 = runner(
        log_f,
        # Host-side numpy: the uploads fold into the dispatch
        # (CLAUDE.md eager-upload rule; cf. device_slice.sample).
        ens,
        key,
        LBa,
        UBa,
        int(n_iters),
        int(max_shrink),
        float(sigma_factor),
        tuple(f_args),
    )
    if not np.all(np.isfinite(np.asarray(logP0))):
        raise ValueError(
            "The initial starting points must evaluate to a real number "
            "(not Inf or NaN)."
        )

    chain_keep = np.asarray(chain_x[burn:])  # (n_keep_iters, K, D)
    kept_x = chain_keep.reshape(-1, D)
    kept_l = np.asarray(chain_logP[burn:]).reshape(-1)
    kept_x = kept_x[::thin][:n_samples]
    kept_l = kept_l[::thin][:n_samples]

    if log_prior is not None:
        lp_fn = _log_prior_batch_fn(log_prior, len(f_args))
        log_priors = np.asarray(lp_fn(kept_x, *f_args), dtype=np.float64)
        # The chain carries the full density; split the reported values
        # so f_vals excludes the prior (reference result contract).
        f_vals = kept_l - log_priors
    else:
        log_priors = np.zeros((kept_x.shape[0],))
        f_vals = kept_l

    if diagnostics:
        exit_flag, R, eff_N = diagnose_ensemble(
            chain_keep, n_requested=n_samples
        )
    else:
        exit_flag, R, eff_N = 0, None, None

    result = {
        "samples": kept_x,
        "f_vals": f_vals.reshape(-1, 1),
        "log_priors": log_priors,
        "exit_flag": exit_flag,
        "R": R,
        "eff_N": eff_N,
    }
    return result, np.asarray(chain_x[-1])
