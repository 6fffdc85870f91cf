"""Fully-jitted coordinate-wise slice sampler (device-resident MCMC).

TPU-native counterpart of the host :class:`~gpyreg_tpu.slice_sample.SliceSampler`
(itself a parity port of reference slice_sample.py).  The entire chain —
random axis scan, bracket placement, shrinkage loop, burn-in width
adaptation — runs inside one XLA program, so sampling a GP hyperposterior
costs zero host round-trips per NLML evaluation (the reference pays one
Python call per evaluation, reference gaussian_process.py:1221 →
slice_sample.py:369-554).

Algorithmic parity notes (vs reference slice_sample.py):
- bracket: ``x_l = x - r*w``, ``x_r = x + (1-r)*w``, clamped to just
  outside the bounds (:414-424); proposals outside [LB, UB] evaluate to
  -inf (the bound mask in __log_pdf_bound :649-683).
- shrinkage: propose uniformly in [x_l, x_r], shrink the side of the
  proposal until accepted (:437-457).  The reference's unbounded loop is
  capped at ``max_shrink`` proposals (it warns at >= 10); on cap-exit the
  current point is kept.
- burn-in width adaptation: shrink>3 -> w/1.1, shrink<2 -> w*1.2 (:461-478)
  and the 5*std(second half of burn) rule at the end of burn-in (:513-543).
- fixed dimensions (LB == UB) are skipped (:406).

The sampler is a pure function of a PRNG key: same key -> same chain
(the determinism analog of reference testing/test_slice_sample.py:18-36).
``vmap``-able over chains; the inner while_loops batch as masked selects.
"""

import logging
import math
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_logger = logging.getLogger("DeviceSliceSampler")


class SliceState(NamedTuple):
    """Chain state, resumable across sample() calls."""

    x: jnp.ndarray  # (D,) current position
    log_Px: jnp.ndarray  # () current log density
    widths: jnp.ndarray  # (D,) current slice widths
    key: jnp.ndarray  # PRNG key


def _masked_log_f(log_f, LB, UB, f_args=(), log_prior=None):
    """Wrap log_f with the bound mask, optional additive log prior, and
    NaN -> -inf handling (reference slice_sample.py:649-683: out of
    bounds, NaN target, or non-finite prior all yield -inf)."""

    def f(x):
        v = log_f(x, *f_args)
        v = jnp.where(jnp.isnan(v), -jnp.inf, v)
        if log_prior is not None:
            p = log_prior(x)
            v = jnp.where(jnp.isfinite(p), v + p, -jnp.inf)
            v = jnp.where(jnp.isnan(v), -jnp.inf, v)
        in_bounds = jnp.all((x >= LB) & (x <= UB))
        return jnp.where(in_bounds, v, -jnp.inf)

    return f


def diagnose(samples: np.ndarray):
    """Split-chain convergence diagnostics of a single chain.

    Host post-processing of the device chain output, with the reference
    sampler's split-R-hat / effective-N semantics and exit flags
    (reference slice_sample.py:604-647): the chain is halved into two
    pseudo-chains; flags: 1 converged, -3 max R > 1.5, -2 max R > 1.1,
    -1 low effective N (< N/10), 0 unknown.  Returns
    ``(exit_flag, R (D,), eff_N (D,))``.
    """
    from ..slice_sample import effective_n, gelman_rubin

    N = samples.shape[0]
    half = math.floor(N / 2)
    if half < 2:
        return 0, None, None
    split = np.array([samples[0:half, :], samples[half : 2 * half, :]])
    R = gelman_rubin(split)
    eff_N = effective_n(split)

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
    if np.any(eff_N < N / 10.0):
        _logger.info(
            " * Low number of effective samples! (min eff_N = %.1f, "
            "mean eff_N = %.1f, requested N = %d)",
            np.min(eff_N),
            np.mean(eff_N),
            N,
        )
        if exit_flag == 0:
            exit_flag = -1
    if exit_flag == 0:
        exit_flag = 1
    return exit_flag, R, eff_N


def _dim_body_factory(
    logpdf, LB, UB, LB_out, UB_out, fixed, max_shrink, adapt, step_out=False
):
    """The coordinate-wise slice MOVE as a fori_loop body over a sweep
    permutation: carry = (x, log_Px, widths, key, perm, shrinks), body
    index j selects perm[j].  Shared by :func:`_sweep` (full sweeps)
    and :func:`_move_chunk` (move-granularity bounded dispatches for
    chains whose per-eval cost is seconds)."""
    MAX_STEP_OUT = 1024  # safety cap; -inf outside bounds ends the walk

    def do_dim(dd, x, log_Px, width, key):
        k_level, k_pos, k_prop = jax.random.split(key, 3)
        log_uprime = log_Px + jnp.log(
            jax.random.uniform(k_level, minval=jnp.finfo(x.dtype).tiny)
        )
        rr = jax.random.uniform(k_pos)
        x_l = jnp.maximum(x[dd] - rr * width, LB_out[dd])
        x_r = jnp.minimum(x[dd] + (1.0 - rr) * width, UB_out[dd])

        if step_out:
            # Stepping-out (reference slice_sample.py:408-417): widen
            # each side by `width` while the density there still clears
            # the slice level.
            def so_cond_l(c):
                xl, steps = c
                return jnp.logical_and(
                    logpdf(x.at[dd].set(xl)) > log_uprime,
                    steps < MAX_STEP_OUT,
                )

            def so_body_l(c):
                xl, steps = c
                return xl - width, steps + 1

            x_l, _ = lax.while_loop(
                so_cond_l, so_body_l, (x_l, jnp.asarray(0, jnp.int32))
            )

            def so_cond_r(c):
                xr, steps = c
                return jnp.logical_and(
                    logpdf(x.at[dd].set(xr)) > log_uprime,
                    steps < MAX_STEP_OUT,
                )

            def so_body_r(c):
                xr, steps = c
                return xr + width, steps + 1

            x_r, _ = lax.while_loop(
                so_cond_r, so_body_r, (x_r, jnp.asarray(0, jnp.int32))
            )

        def cond(c):
            _, _, _, _, _, shrink, done = c
            return jnp.logical_and(~done, shrink < max_shrink)

        def body(c):
            key, x_l, x_r, xp, log_Pp, shrink, _ = c
            key, ku = jax.random.split(key)
            u = jax.random.uniform(ku)
            xp_new = u * (x_r - x_l) + x_l
            log_Pp_new = logpdf(x.at[dd].set(xp_new))
            accept = log_Pp_new > log_uprime
            stuck = xp_new == x[dd]
            # Shrink the side the rejected proposal fell on.
            x_r_new = jnp.where(~accept & (xp_new > x[dd]), xp_new, x_r)
            x_l_new = jnp.where(~accept & (xp_new < x[dd]), xp_new, x_l)
            return (
                key,
                x_l_new,
                x_r_new,
                xp_new,
                log_Pp_new,
                shrink + 1,
                accept | stuck,
            )

        init = (
            k_prop,
            x_l,
            x_r,
            x[dd],
            log_Px,
            jnp.asarray(0, dtype=jnp.int32),
            jnp.asarray(False),
        )
        _, _, _, xp, log_Pp, shrink, done = lax.while_loop(
            cond, body, init
        )
        # On max_shrink cap exit (done=False) the carry holds the last
        # REJECTED proposal: keep the current point and its density
        # instead (the documented cap-exit contract; the reference's
        # unbounded loop can only exit accepted, slice_sample.py:437).
        xp = jnp.where(done, xp, x[dd])
        log_Pp = jnp.where(done, log_Pp, log_Px)
        return x.at[dd].set(xp), log_Pp, shrink

    def dim_body(j, carry):
        x, log_Px, widths, key, perm, shrinks = carry
        dd = perm[j]
        key, k_dim = jax.random.split(key)

        def process(_):
            x_new, log_Px_new, shrink = do_dim(
                dd, x, log_Px, widths[dd], k_dim
            )
            w = widths[dd]
            if adapt:
                delta = UB[dd] - LB[dd]
                # eps-scaled floor standing in for np.spacing (reference
                # slice_sample.py:466-474); jnp.spacing lowers to an s64
                # bitcast that TPU's X64 rewriting does not support.
                eps = jnp.finfo(x.dtype).eps
                w_floor = jnp.where(
                    jnp.isfinite(delta),
                    eps * jnp.maximum(jnp.abs(delta), 1.0),
                    eps,
                )
                w = jnp.where(
                    shrink > 3,
                    jnp.maximum(w / 1.1, w_floor),
                    jnp.where(shrink < 2, jnp.minimum(w * 1.2, delta), w),
                )
            return x_new, log_Px_new, w, shrink

        def skip(_):
            return x, log_Px, widths[dd], jnp.asarray(0, dtype=jnp.int32)

        x_new, log_Px_new, w_new, shrink = lax.cond(
            fixed[dd], skip, process, operand=None
        )
        return (
            x_new,
            log_Px_new,
            widths.at[dd].set(w_new),
            key,
            perm,
            shrinks.at[dd].set(shrink),
        )

    return dim_body


def _sweep(
    logpdf, LB, UB, LB_out, UB_out, fixed, max_shrink, adapt, step_out=False
):
    """One full coordinate sweep (random scan order).

    Returns a function (state) -> (state, shrink_counts) where the widths
    in the output state are adapted iff ``adapt``.
    """
    D = LB.shape[0]
    dim_body = _dim_body_factory(
        logpdf, LB, UB, LB_out, UB_out, fixed, max_shrink, adapt, step_out
    )

    def sweep(state: SliceState):
        key, k_perm = jax.random.split(state.key)
        perm = jax.random.permutation(k_perm, D)
        shrinks = jnp.zeros((D,), dtype=jnp.int32)
        x, log_Px, widths, key, _, shrinks = lax.fori_loop(
            0,
            D,
            dim_body,
            (state.x, state.log_Px, state.widths, key, perm, shrinks),
        )
        return SliceState(x, log_Px, widths, key), shrinks

    return sweep


def _rd_sweep(logpdf, LB, UB, fixed, max_shrink):
    """One random-direction slice move (the MATLAB oracle's 'covsample'
    operator: gplite_train.m:392-407 runs eissample_lite with W=1
    walker, whose default transition is transSliceSampleRD,
    eissample_lite.m:938-980 -> slicesample1 :997-1230).

    Direction: ``u ~ N(0, I)`` normalized, scaled per-dimension by the
    current widths (``wvec = u .* widths``, :971-977).  Bracket: length
    1 in wvec units placed uniformly around x (:1100-1103), clipped to
    the bounds along the direction (:1105-1120; the upstream x_r branch
    drops the direction factor — here both ends take the direction
    shift its commented-out line intends).  Shrinkage only (StepOut
    errors upstream, :1126); with TolX=1e-80 the collapse tolerance is
    exact equality (:392-407 sets TolX=1e-80).  Rejection at the
    shrink cap keeps the current point.

    Returns a function (state) -> (state, shrinks) with the same
    contract as :func:`_sweep` (shrink count in slot 0); widths are
    never adapted inside the move — the oracle adapts them only at
    warm-up stage ends (eissample_lite.m:510-521), which maps onto the
    end-of-burn rule in the chain drivers.
    """
    D = LB.shape[0]

    def sweep(state: SliceState):
        x = state.x
        key, k_dir, k_level, k_pos, k_prop = jax.random.split(state.key, 5)
        u = jax.random.normal(k_dir, (D,), dtype=x.dtype)
        u = jnp.where(fixed, 0.0, u)
        nrm = jnp.sqrt(jnp.sum(u * u))
        u = u / jnp.where(nrm > 0, nrm, 1.0)
        wvec = u * state.widths

        log_uprime = state.log_Px + jnp.log(
            jax.random.uniform(k_level, minval=jnp.finfo(x.dtype).tiny)
        )

        # Bracket [x_l, x_l + wsize*wvec] with x at offset rr (in wvec
        # units); clip both ends to the bounds along the direction.
        rr = jax.random.uniform(k_pos, dtype=x.dtype)
        wsize = jnp.asarray(1.0, dtype=x.dtype)
        x_l = x - rr * wvec
        x_r = x + (wsize - rr) * wvec
        absw = jnp.abs(wvec)
        safe = jnp.where(absw > 0, absw, 1.0)
        viol_l = jnp.maximum(LB - x_l, 0.0) + jnp.maximum(x_l - UB, 0.0)
        shift_l = jnp.max(
            jnp.where(absw > 0, viol_l / safe, 0.0), initial=0.0
        )
        viol_r = jnp.maximum(LB - x_r, 0.0) + jnp.maximum(x_r - UB, 0.0)
        shift_r = jnp.max(
            jnp.where(absw > 0, viol_r / safe, 0.0), initial=0.0
        )
        x_l = x_l + wvec * shift_l
        # Exact arithmetic keeps 0 <= rr <= wsize (the bracket always
        # contains x, which is in bounds); clamp against float error.
        wsize = jnp.maximum(wsize - shift_l - shift_r, 0.0)
        rr = jnp.clip(rr - shift_l, 0.0, wsize)

        def cond(c):
            _, _, _, _, _, _, shrink, done = c
            return jnp.logical_and(~done, shrink < max_shrink)

        def body(c):
            key, x_l, rr, wsize, _, _, shrink, _ = c
            key, ku = jax.random.split(key)
            rr2 = jax.random.uniform(ku, dtype=x.dtype) * wsize
            xnew = x_l + rr2 * wvec
            log_Pnew = logpdf(xnew)
            accept = log_Pnew > log_uprime
            # Bracket collapsed onto the current point (oracle
            # eissample_lite.m:1210-1216 with tolr ~ 0).
            stuck = jnp.logical_or(rr2 == rr, jnp.all(xnew == x))
            s_r = (~accept) & (rr2 > rr) & ~stuck
            s_l = (~accept) & (rr2 < rr) & ~stuck
            wsize_n = jnp.where(s_r, rr2, jnp.where(s_l, wsize - rr2, wsize))
            x_l_n = jnp.where(s_l, xnew, x_l)
            rr_n = jnp.where(s_l, rr - rr2, rr)
            return (
                key,
                x_l_n,
                rr_n,
                wsize_n,
                jnp.where(accept, xnew, x),
                jnp.where(accept, log_Pnew, state.log_Px),
                shrink + 1,
                accept | stuck,
            )

        init = (
            k_prop,
            x_l,
            rr,
            wsize,
            x,
            state.log_Px,
            jnp.asarray(0, dtype=jnp.int32),
            jnp.asarray(False),
        )
        _, _, _, _, x_fin, log_fin, shrink, _ = lax.while_loop(
            cond, body, init
        )
        shrinks = jnp.zeros((D,), dtype=jnp.int32).at[0].set(shrink)
        return SliceState(x_fin, log_fin, state.widths, key), shrinks

    return sweep


def _make_sweeps(
    move, logpdf, LB, UB, LB_out, UB_out, fixed, max_shrink, step_out
):
    """(sweep_adapt, sweep_fixed, burn_window_half_fn) for a move kind.

    ``move`` is 'cw' (coordinate-wise, reference slice_sample.py) or
    'rd' (random-direction, oracle covsample).  The RD move has no
    in-sweep width adaptation, and its end-of-burn 5*std rule uses the
    FULL burn window (eissample_lite.m:512 std(warmup) with
    WarmUpStages=1) where the CW sampler uses the second half
    (reference slice_sample.py:513-543).
    """
    if move == "rd":
        sweep = _rd_sweep(logpdf, LB, UB, fixed, max_shrink)
        return sweep, sweep
    sweep_adapt = _sweep(
        logpdf, LB, UB, LB_out, UB_out, fixed, max_shrink,
        adapt=True, step_out=step_out,
    )
    sweep_fixed = _sweep(
        logpdf, LB, UB, LB_out, UB_out, fixed, max_shrink,
        adapt=False, step_out=step_out,
    )
    return sweep_adapt, sweep_fixed


def _burn_half(move, burn):
    """First sweep index of the width-adaptation moment window."""
    return 0 if move == "rd" else burn // 2


@partial(jax.jit, static_argnames=("D",))
def _draw_perm(key, D: int):
    """New sweep: split the chain key and draw the coordinate scan
    order (the same construction as _sweep's in-program draw)."""
    key, k_perm = jax.random.split(key)
    return key, jax.random.permutation(k_perm, D)


@partial(
    jax.jit,
    static_argnames=(
        "log_f", "k", "adapt", "max_shrink", "step_out", "log_prior"
    ),
)
def _move_chunk(
    log_f,
    x,
    log_Px,
    widths,
    key,
    perm,
    j0,
    LB,
    UB,
    LB_out,
    UB_out,
    k: int,
    adapt: bool,
    max_shrink: int,
    f_args,
    step_out: bool,
    log_prior,
):
    """``k`` coordinate moves of one sweep, starting at scan position
    ``j0`` (traced — one compiled program per (k, adapt) serves every
    position).  The unit of :func:`_run_chain_moveseg`'s bounded
    dispatches: a MOVE costs at most ~(1 + max_shrink) density evals,
    so for chains whose evals are full CG+SLQ programs (seconds each at
    N ~ 65k) this is the only granularity that keeps a dispatch under
    the TPU runtime's ~6-min device-time watchdog — sweep-level
    segments bound sweeps, not evals."""
    logpdf = _masked_log_f(log_f, LB, UB, f_args, log_prior)
    fixed = LB == UB
    dim_body = _dim_body_factory(
        logpdf, LB, UB, LB_out, UB_out, fixed, max_shrink, adapt,
        step_out,
    )
    D = x.shape[0]
    shrinks = jnp.zeros((D,), dtype=jnp.int32)
    j_end = jnp.minimum(j0 + k, D)
    x, log_Px, widths, key, _, _ = lax.fori_loop(
        j0, j_end, dim_body, (x, log_Px, widths, key, perm, shrinks)
    )
    return x, log_Px, widths, key


def _run_chain_moveseg(
    log_f,
    state,
    LB,
    UB,
    LB_out,
    UB_out,
    base_widths,
    n_samples,
    thin,
    burn,
    adaptive,
    max_shrink,
    f_args,
    step_out,
    log_prior,
    seg_moves,
):
    """Move-granularity bounded-dispatch chain: the same coordinate-wise
    sweep as :func:`_run_chain`, advanced ``seg_moves`` coordinate
    moves per device dispatch, with sweep bookkeeping (scan-order draw,
    burn-in moment window, end-of-burn 5*std width rule, sample
    collection) driven from the host.

    This exists for the matrix-free (CG+SLQ) chains at very large N:
    one density eval is a multi-second device program that REBUILDS
    kernel panels per matvec pass, so a full sweep — let alone a
    sweep-level segment — exceeds the ~6-min dispatch watchdog
    (measured: the 65k fixed-probe chain died twice before this).  The
    ~0.1 s per-dispatch tunnel latency and the two per-sweep host
    pulls (x, log_Px) are noise against multi-second moves.  The chain
    law is _run_chain's (same move kernel via _dim_body_factory, same
    per-sweep key split + permutation construction); the PRNG stream
    differs from the monolithic program's only through the explicit
    key threading, as with any distinct entry point.

    Returns ``(state, packed)`` with :func:`_run_chain`'s packed-array
    layout (row 0 = [init_log_Px, 0...]; rows 1.. = [f, log_prior, x]).
    """
    D = int(np.asarray(state.x).shape[-1])
    state = _chain_init(log_f, state, LB, UB, f_args, log_prior)
    init_log_Px = float(np.asarray(state.log_Px))
    x, log_Px, widths, key = (
        state.x, state.log_Px, state.widths, state.key,
    )
    half = burn // 2
    s_sum = np.zeros((D,), dtype=np.float64)
    s_sq = np.zeros((D,), dtype=np.float64)
    eff_N = n_samples + (n_samples - 1) * (thin - 1)
    xs, f_vals = [], []
    for s in range(burn + eff_N):
        in_burn = s < burn
        key, perm = _draw_perm(key, D)
        j0 = 0
        while j0 < D:
            x, log_Px, widths, key = _move_chunk(
                log_f, x, log_Px, widths, key, perm,
                np.int64(j0), LB, UB, LB_out, UB_out,
                int(seg_moves), bool(adaptive and in_burn),
                int(max_shrink), f_args, bool(step_out), log_prior,
            )
            j0 += int(seg_moves)
        if in_burn:
            if adaptive and s >= half:
                xh = np.asarray(x, dtype=np.float64)
                s_sum += xh
                s_sq += xh**2
            if adaptive and s == burn - 1:
                # End-of-burn 5*std rule — through the same jitted
                # device function the sweep-segmented runner uses (a
                # host-numpy mirror is NOT bit-equivalent: XLA fuses
                # s_sq/n - (s_sum/n)^2 with FMA, keeping the exact
                # x^2-rounding residue that numpy rounds to 0, and the
                # residue decides the where(new>0) branch).
                st_w = _adapt_widths(
                    SliceState(
                        x=x, log_Px=log_Px, widths=widths, key=key
                    ),
                    s_sum,
                    s_sq,
                    np.float64(burn - half),
                    LB_out,
                    UB_out,
                    base_widths
                    if base_widths is not None
                    else np.zeros((D,), dtype=np.float64),
                    base_widths is not None,
                )
                widths = st_w.widths
        else:
            xs.append(np.asarray(x, dtype=np.float64))
            f_vals.append(float(np.asarray(log_Px)))
    xs = np.stack(xs, axis=0)
    f_vals = np.asarray(f_vals, dtype=np.float64)
    samples = xs[::thin][:n_samples]
    f_kept = f_vals[::thin][:n_samples]
    if log_prior is not None:
        lp = np.asarray(
            jax.jit(jax.vmap(log_prior))(samples), dtype=np.float64
        )
    else:
        lp = np.zeros_like(f_kept)
    head = np.concatenate(
        [[init_log_Px], np.zeros((D + 1,), dtype=np.float64)]
    )[None, :]
    body = np.concatenate(
        [f_kept[:, None], lp[:, None], samples], axis=1
    )
    packed = np.concatenate([head, body], axis=0)
    state = SliceState(x=x, log_Px=log_Px, widths=widths, key=key)
    return state, packed


@partial(
    jax.jit,
    static_argnames=(
        "log_f",
        "n_samples",
        "thin",
        "burn",
        "adaptive",
        "max_shrink",
        "step_out",
        "log_prior",
        "move",
    ),
)
def _run_chain(
    log_f,
    state: SliceState,
    LB,
    UB,
    LB_out,
    UB_out,
    base_widths_or_none,
    n_samples: int,
    thin: int,
    burn: int,
    adaptive: bool,
    max_shrink: int,
    f_args=(),
    step_out: bool = False,
    log_prior=None,
    move: str = "cw",
):
    # LB_out/UB_out computed on the host: jnp.nextafter lowers to an
    # s64 bitcast that TPU's X64 rewriting rejects.
    fixed = LB == UB
    logpdf = _masked_log_f(log_f, LB, UB, f_args, log_prior)

    state = state._replace(log_Px=logpdf(state.x))
    init_log_Px = state.log_Px

    sweep_adapt, sweep_fixed = _make_sweeps(
        move, logpdf, LB, UB, LB_out, UB_out, fixed, max_shrink, step_out
    )

    # --- burn-in phase (optional width adaptation) ---
    if burn > 0:
        half = _burn_half(move, burn)

        def burn_body(carry, i):
            state, s_sum, s_sq = carry
            state, _ = (sweep_adapt if adaptive else sweep_fixed)(state)
            in_window = i >= half
            s_sum = jnp.where(in_window, s_sum + state.x, s_sum)
            s_sq = jnp.where(in_window, s_sq + state.x**2, s_sq)
            return (state, s_sum, s_sq), None

        z = jnp.zeros_like(state.x)
        (state, s_sum, s_sq), _ = lax.scan(
            burn_body, (state, z, z), jnp.arange(burn)
        )
        if adaptive:
            # End-of-burn-in 5*std rule (reference slice_sample.py:513-543).
            n_st = burn - half
            var = jnp.maximum(s_sq / n_st - (s_sum / n_st) ** 2, 0.0)
            new_widths = jnp.minimum(5.0 * jnp.sqrt(var), UB_out - LB_out)
            if base_widths_or_none is not None:
                new_widths = jnp.maximum(
                    new_widths,
                    jnp.sqrt(new_widths * base_widths_or_none),
                )
            # Keep old widths where the estimate degenerated to zero.
            new_widths = jnp.where(
                new_widths > 0, new_widths, state.widths
            )
            state = state._replace(widths=new_widths)

    # --- sampling phase (no adaptation; detailed balance holds) ---
    eff_N = n_samples + (n_samples - 1) * (thin - 1)

    def sample_body(state, _):
        state, _ = sweep_fixed(state)
        return state, (state.x, state.log_Px)

    state, (xs, log_Pxs) = lax.scan(
        sample_body, state, None, length=eff_N
    )
    samples = xs[::thin][:n_samples]
    f_vals = log_Pxs[::thin][:n_samples]
    # Pack everything the host reads into ONE array (one device->host
    # transfer; the remote tunnel charges a fixed latency per pull):
    # row 0 = [init_log_Px, 0, 0...]; rows 1..n = [f_val, log_prior, x].
    if log_prior is not None:
        lp = jax.vmap(log_prior)(samples)
    else:
        lp = jnp.zeros_like(f_vals)
    D = samples.shape[1]
    head = jnp.concatenate(
        [init_log_Px[None], jnp.zeros((D + 1,), dtype=samples.dtype)]
    )[None, :]
    body = jnp.concatenate(
        [f_vals[:, None], lp[:, None], samples], axis=1
    )
    return state, jnp.concatenate([head, body], axis=0)


# --- Segmented (bounded-dispatch) chain -----------------------------
#
# The TPU runtime kills any single dispatch whose device execution runs
# longer than roughly six minutes (see map_optimize.py SEG_MIN_N notes).
# At N=16384 one monolithic chain program executes (burn + eff_N) *
# D_hyp * ~8 NLML evaluations — far past the watchdog.  The segmented
# path below advances the chain a bounded number of sweeps per dispatch,
# carrying the SliceState (position, density, widths, PRNG key) and the
# burn-in moment accumulators on device between dispatches; sample
# blocks stay device-resident and are packed by one final program, so
# the host still pays exactly one pull.  The random stream is carried in
# the state, so segmented and monolithic chains are bit-identical.


def _chain_init_impl(log_f, state, LB, UB, f_args, log_prior):
    logpdf = _masked_log_f(log_f, LB, UB, f_args, log_prior)
    lp = logpdf(state.x)
    return state._replace(log_Px=lp)


_chain_init = partial(jax.jit, static_argnames=("log_f", "log_prior"))(
    _chain_init_impl
)


@partial(jax.jit, static_argnames=("log_f", "log_prior"))
def _chain_init_b(log_f, states, LB, UB, f_args, log_prior):
    """Batched twin of :func:`_chain_init`: one dispatch initializes all
    B chains (their NLML evals batch into one Cholesky)."""
    return jax.vmap(
        lambda st: _chain_init_impl(log_f, st, LB, UB, f_args, log_prior)
    )(states)


_CHAIN_SEG_STATICS = (
    "log_f",
    "seg",
    "adapt",
    "max_shrink",
    "step_out",
    "log_prior",
    "collect",
    "move",
)


def _chain_seg_impl(
    log_f,
    state,
    s_sum,
    s_sq,
    i0,
    half,
    limit,
    LB,
    UB,
    LB_out,
    UB_out,
    seg: int,
    adapt: bool,
    max_shrink: int,
    f_args,
    step_out: bool,
    log_prior,
    collect: bool,
    move: str = "cw",
):
    """Advance the chain ``seg`` sweeps in one dispatch.

    ``adapt``/``collect`` select the phase: burn-in segments adapt
    widths and accumulate the second-half moments (``i0``/``half``
    carry the global sweep index so the window test matches the
    monolithic scan); sampling segments collect (x, log_Px) blocks.

    ``limit`` (traced) is the phase's TOTAL sweep count: sweeps with
    global index >= limit are dead no-ops (lax.cond skips the sweep, so
    the PRNG stream is untouched).  This keeps every segment — ragged
    tail included — ONE static shape: a second shape costs a
    minutes-long remote compile at 16k (CLAUDE.md).

    Returns an ``ev`` density-evaluation count alongside the carried
    state (the reference sampler's ``funccount`` analog,
    slice_sample.py:157): each shrinkage proposal is one evaluation,
    so the per-sweep count is ``sum(shrinks)`` (plus step-out walks,
    which are not counted — the fit paths run step_out=False).
    """
    fixed = LB == UB
    D = LB.shape[0]
    logpdf = _masked_log_f(log_f, LB, UB, f_args, log_prior)
    sweep_adapt, sweep_fixed = _make_sweeps(
        move, logpdf, LB, UB, LB_out, UB_out, fixed, max_shrink, step_out
    )
    sweep = sweep_adapt if adapt else sweep_fixed

    def body(carry, i):
        state, s_sum, s_sq, ev = carry
        live = i < limit
        state, shr = lax.cond(
            live,
            sweep,
            lambda s: (s, jnp.zeros((D,), dtype=jnp.int32)),
            state,
        )
        ev = ev + jnp.sum(shr, dtype=jnp.int32)
        in_window = jnp.logical_and(i >= half, live)
        s_sum = jnp.where(in_window, s_sum + state.x, s_sum)
        s_sq = jnp.where(in_window, s_sq + state.x**2, s_sq)
        out = (state.x, state.log_Px) if collect else None
        return (state, s_sum, s_sq, ev), out

    (state, s_sum, s_sq, ev), out = lax.scan(
        body,
        (state, s_sum, s_sq, jnp.zeros((), dtype=jnp.int32)),
        i0 + jnp.arange(seg),
    )
    if collect:
        return state, s_sum, s_sq, ev, out[0], out[1]
    return state, s_sum, s_sq, ev


_chain_seg = partial(jax.jit, static_argnames=_CHAIN_SEG_STATICS)(
    _chain_seg_impl
)


@partial(jax.jit, static_argnames=_CHAIN_SEG_STATICS)
def _chain_seg_b(
    log_f,
    states,
    s_sum,
    s_sq,
    i0,
    half,
    limit,
    LB,
    UB,
    LB_out,
    UB_out,
    seg: int,
    adapt: bool,
    max_shrink: int,
    f_args,
    step_out: bool,
    log_prior,
    collect: bool,
    move: str = "cw",
):
    """Batched twin of :func:`_chain_seg`: one bounded dispatch advances
    ALL B chains ``seg`` sweeps — the chains' NLML evaluations batch
    into one XLA Cholesky per step (but each batched eval costs ~B
    lanes of compute at large N, and lockstep batching pays the worst
    lane's shrinkage count — see sampling.chain_group_plan)."""
    return jax.vmap(
        lambda st, ss, sq: _chain_seg_impl(
            log_f,
            st,
            ss,
            sq,
            i0,
            half,
            limit,
            LB,
            UB,
            LB_out,
            UB_out,
            seg,
            adapt,
            max_shrink,
            f_args,
            step_out,
            log_prior,
            collect,
            move,
        )
    )(states, s_sum, s_sq)


@partial(jax.jit, static_argnames=("has_base",))
def _adapt_widths(
    state, s_sum, s_sq, n_st, LB_out, UB_out, base_widths, has_base: bool
):
    """End-of-burn-in 5*std width rule (reference slice_sample.py:513-543)
    — the segmented twin of the in-program update in _run_chain."""
    var = jnp.maximum(s_sq / n_st - (s_sum / n_st) ** 2, 0.0)
    new_widths = jnp.minimum(5.0 * jnp.sqrt(var), UB_out - LB_out)
    if has_base:
        new_widths = jnp.maximum(
            new_widths, jnp.sqrt(new_widths * base_widths)
        )
    new_widths = jnp.where(new_widths > 0, new_widths, state.widths)
    return state._replace(widths=new_widths)


def _pack_chain_impl(
    init_log_Px, xs_blocks, lp_blocks, thin: int, n_samples: int, log_prior
):
    xs = jnp.concatenate(xs_blocks, axis=0)
    log_Pxs = jnp.concatenate(lp_blocks, axis=0)
    samples = xs[::thin][:n_samples]
    f_vals = log_Pxs[::thin][:n_samples]
    if log_prior is not None:
        lp = jax.vmap(log_prior)(samples)
    else:
        lp = jnp.zeros_like(f_vals)
    D = samples.shape[1]
    head = jnp.concatenate(
        [init_log_Px[None], jnp.zeros((D + 1,), dtype=samples.dtype)]
    )[None, :]
    body = jnp.concatenate(
        [f_vals[:, None], lp[:, None], samples], axis=1
    )
    return jnp.concatenate([head, body], axis=0)


_pack_chain = partial(
    jax.jit, static_argnames=("thin", "n_samples", "log_prior")
)(_pack_chain_impl)


@partial(jax.jit, static_argnames=("thin", "n_samples", "log_prior"))
def _pack_chain_b(
    init_log_Px, xs_blocks, lp_blocks, thin: int, n_samples: int, log_prior
):
    return jax.vmap(
        lambda ip, xb, lb: _pack_chain_impl(
            ip, xb, lb, thin, n_samples, log_prior
        )
    )(init_log_Px, xs_blocks, lp_blocks)


def _run_chain_segmented(
    log_f,
    state,
    LB,
    UB,
    LB_out,
    UB_out,
    base_widths,
    n_samples,
    thin,
    burn,
    adaptive,
    max_shrink,
    f_args,
    step_out,
    log_prior,
    seg,
    move="cw",
):
    """Bounded-dispatch twin of :func:`_run_chain`: same chain, same
    random stream, same packed output — but no dispatch executes more
    than ``seg`` sweeps.  All dispatches are issued asynchronously; the
    single blocking pull happens in the caller.

    Returns ``(state, packed, n_evals)``; ``n_evals`` is a device
    scalar (the chain's total density-evaluation count — funccount),
    accumulated lazily so the per-segment dispatches stay async."""
    D = int(np.asarray(state.x).shape[-1])
    state = _chain_init(log_f, state, LB, UB, f_args, log_prior)
    init_log_Px = state.log_Px
    z = np.zeros((D,), dtype=np.float64)
    s_sum, s_sq = z, z
    evs = []
    half = np.int64(_burn_half(move, burn))
    # Every dispatch runs the full static ``seg`` sweeps; the traced
    # ``limit`` masks the tail overshoot as PRNG-preserving no-ops, so
    # each phase compiles exactly ONE program shape.
    for i in range(0, burn, seg):
        state, s_sum, s_sq, ev_i = _chain_seg(
            log_f,
            state,
            s_sum,
            s_sq,
            np.int64(i),
            half,
            np.int64(burn),
            LB,
            UB,
            LB_out,
            UB_out,
            int(seg),
            bool(adaptive),
            int(max_shrink),
            f_args,
            bool(step_out),
            log_prior,
            False,
            str(move),
        )
        evs.append(ev_i)
    if burn > 0 and adaptive:
        n_st = np.float64(burn - _burn_half(move, burn))
        state = _adapt_widths(
            state,
            s_sum,
            s_sq,
            n_st,
            LB_out,
            UB_out,
            base_widths if base_widths is not None else z,
            base_widths is not None,
        )
    eff_N = n_samples + (n_samples - 1) * (thin - 1)
    xs_blocks, lp_blocks = [], []
    # Sampling phase: half > eff_N makes the window test always False
    # (the moment accumulators are dead weight but keep the segment
    # program shared between phases' shapes).  Tail overshoot rows
    # repeat the last live state; the pack program's [::thin]
    # [:n_samples] slice never reaches them.
    no_win = np.int64(eff_N + seg + 1)
    for i in range(0, eff_N, seg):
        state, _, _, ev_i, xs, lps = _chain_seg(
            log_f,
            state,
            z,
            z,
            np.int64(i),
            no_win,
            np.int64(eff_N),
            LB,
            UB,
            LB_out,
            UB_out,
            int(seg),
            False,
            int(max_shrink),
            f_args,
            bool(step_out),
            log_prior,
            True,
            str(move),
        )
        xs_blocks.append(xs)
        lp_blocks.append(lps)
        evs.append(ev_i)
    packed = _pack_chain(
        init_log_Px,
        tuple(xs_blocks),
        tuple(lp_blocks),
        int(thin),
        int(n_samples),
        log_prior,
    )
    # One eager stack+sum (a single tunnel op), pulled by the caller.
    n_evals = jnp.sum(jnp.stack(evs)) if evs else jnp.zeros((), jnp.int32)
    return state, packed, n_evals


def _run_chains_segmented(
    log_f,
    states,
    LB,
    UB,
    LB_out,
    UB_out,
    base_widths,
    n_samples,
    thin,
    burn,
    adaptive,
    max_shrink,
    f_args,
    step_out,
    log_prior,
    seg,
    move="cw",
):
    """Batched bounded-dispatch twin of :func:`_run_chain_segmented`:
    every dispatch advances ALL B chains ``seg`` sweeps (one batched
    Cholesky per NLML eval across chains), carrying the batched
    SliceState between dispatches.  This is what makes chain-parallel
    MCMC real above SEG_MIN_N — the previous sequential host loop ran
    the chains one after another, scaling wall-clock with B.

    ``states`` is a SliceState with leading chain axis (B, ...); when
    its leaves are mesh-sharded on that axis, every dispatch runs the
    per-device chain slabs in parallel (computation-follows-data).
    Returns (states, packed (B, n_samples + 1, D + 2), n_evals (B,))."""
    B, D = np.asarray(states.x).shape
    states = _chain_init_b(log_f, states, LB, UB, f_args, log_prior)
    init_log_Px = states.log_Px
    z = np.zeros((B, D), dtype=np.float64)
    s_sum, s_sq = z, z
    evs = []
    half = np.int64(_burn_half(move, burn))
    for i in range(0, burn, seg):
        states, s_sum, s_sq, ev_i = _chain_seg_b(
            log_f,
            states,
            s_sum,
            s_sq,
            np.int64(i),
            half,
            np.int64(burn),
            LB,
            UB,
            LB_out,
            UB_out,
            int(seg),
            bool(adaptive),
            int(max_shrink),
            f_args,
            bool(step_out),
            log_prior,
            False,
            str(move),
        )
        evs.append(ev_i)
    if burn > 0 and adaptive:
        n_st = np.float64(burn - _burn_half(move, burn))
        states = _adapt_widths(
            states,
            s_sum,
            s_sq,
            n_st,
            LB_out,
            UB_out,
            base_widths
            if base_widths is not None
            else np.zeros((D,), dtype=np.float64),
            base_widths is not None,
        )
    eff_N = n_samples + (n_samples - 1) * (thin - 1)
    xs_blocks, lp_blocks = [], []
    no_win = np.int64(eff_N + seg + 1)
    for i in range(0, eff_N, seg):
        states, _, _, ev_i, xs, lps = _chain_seg_b(
            log_f,
            states,
            z,
            z,
            np.int64(i),
            no_win,
            np.int64(eff_N),
            LB,
            UB,
            LB_out,
            UB_out,
            int(seg),
            False,
            int(max_shrink),
            f_args,
            bool(step_out),
            log_prior,
            True,
            str(move),
        )
        xs_blocks.append(xs)
        lp_blocks.append(lps)
        evs.append(ev_i)
    packed = _pack_chain_b(
        init_log_Px,
        tuple(xs_blocks),
        tuple(lp_blocks),
        int(thin),
        int(n_samples),
        log_prior,
    )
    n_evals = (
        jnp.sum(jnp.stack(evs), axis=0)
        if evs
        else jnp.zeros((B,), jnp.int32)
    )
    return states, packed, n_evals


def sample(
    log_f,
    x0,
    key,
    widths=None,
    LB=None,
    UB=None,
    n_samples: int = 100,
    thin: int = 1,
    burn: int = None,
    adaptive: bool = True,
    max_shrink: int = 256,
    state: SliceState = None,
    f_args=(),
    step_out: bool = False,
    log_prior=None,
    diagnostics: bool = True,
    display: str = "off",
    seg_sweeps: int = None,
    seg_moves: int = None,
    move: str = "cw",
    width_base: bool = True,
):
    """Draw ``n_samples`` (thinned) samples from ``log_f`` on device.

    Parameters mirror :class:`gpyreg_tpu.slice_sample.SliceSampler` /
    ``sample`` (reference slice_sample.py:119-230, :232).  ``log_f`` must
    be a jittable function (D,) -> scalar log density; ``log_prior`` (if
    given) a jittable additive log-prior whose values are reported
    separately in ``log_priors`` (reference :219-230).  ``step_out``
    enables the stepping-out bracket walk (reference :408-417).  With
    ``diagnostics`` (default True, like the reference sampler), the
    result carries split-R-hat / effective-N and the reference's exit
    flags {1, 0, -1, -2, -3}; ``display`` in {'off', 'summary', 'full'}
    maps to WARNING/INFO/DEBUG on the 'DeviceSliceSampler' logger (the
    per-proposal trace stays on device, so only run summaries are
    logged).

    Returns ``(result_dict, final_state)``; pass ``state=final_state`` to
    continue the chain (same-key chaining gives the determinism property
    of reference testing/test_slice_sample.py:18-36).

    ``seg_sweeps`` bounds the number of sweeps per device dispatch
    (bit-identical chain; see :func:`_run_chain_segmented`) — required
    at large N, where the monolithic chain program exceeds the TPU
    runtime's per-dispatch execution watchdog.

    ``seg_moves`` (cw only, overrides ``seg_sweeps``) bounds the number
    of coordinate MOVES per dispatch (see :func:`_run_chain_moveseg`)
    — required when a single density eval is itself a multi-second
    device program (matrix-free CG+SLQ at N ~ 65k), where even a
    one-sweep dispatch exceeds the watchdog.  Not bit-identical to the
    monolithic chain (distinct PRNG threading), same chain law.

    ``move`` selects the transition operator: 'cw' (default) is the
    reference's coordinate-wise sweep; 'rd' is one random-direction
    slice move per sweep (the MATLAB oracle's 'covsample' sampler —
    gplite_train.m:392-407 / eissample_lite.m:938-980; see
    :func:`_rd_sweep`).  'rd' does not support ``step_out`` (the
    oracle's StepOut branch errors, eissample_lite.m:1126).

    ``width_base`` (default True, the reference's behavior): caller-
    supplied ``widths`` also act as the end-of-burn adaptation FLOOR —
    the adapted widths become ``max(5*std, sqrt(5*std * widths))``
    (reference slice_sample.py:535-543, "bias towards keeping larger
    widths").  ``width_base=False`` keeps the caller widths for the
    burn-in but lets the 5*std rule stand alone afterwards: on tight
    large-N GP hyperposteriors the geometric floor holds post-burn
    widths at ~sqrt(base/5*std) times the posterior scale (measured
    ~50 sigma at the 16k north-star shape, costing ~2.6x the density
    evals per shrinkage move of the 5*std width) — shrinkage-only
    slice moves are valid MCMC at ANY width, so the diagnostics
    (R-hat / eff_N), not the floor, certify mixing.
    """
    if move not in ("cw", "rd"):
        raise ValueError("move must be 'cw' or 'rd'.")
    if move == "rd" and step_out:
        raise ValueError(
            "step_out is not supported by the random-direction move."
        )
    if display == "full":
        _logger.setLevel(logging.DEBUG)
    elif display in ("summary", "on"):
        _logger.setLevel(logging.INFO)
    else:
        _logger.setLevel(logging.WARNING)
    # All setup/validation stays host-side numpy: every eager jnp op or
    # device pull here would cost a remote-tunnel round trip before the
    # chain even dispatches.  jit uploads these with the dispatch.
    x0 = np.asarray(x0, dtype=np.float64).ravel()
    D = x0.shape[0]

    def _expand(v, default):
        if v is None:
            return np.full((D,), default, dtype=np.float64)
        v = np.asarray(v, dtype=np.float64)
        return np.broadcast_to(v.ravel(), (D,)).copy()

    LB = _expand(LB, -np.inf)
    UB = _expand(UB, np.inf)

    if np.any(x0 < LB) or np.any(x0 > UB):
        raise ValueError(
            "The initial starting point X0 is outside the bounds."
        )

    base_widths = None
    if widths is None:
        w = (UB - LB) / 2.0
    else:
        w = np.broadcast_to(
            np.asarray(widths, dtype=np.float64).ravel(), (D,)
        ).copy()
        if width_base:
            base_widths = w
    w = np.where(np.isinf(w), 10.0, w)
    w = np.where(LB == UB, 1.0, w)
    if np.any(w <= 0) or np.any(~np.isfinite(w)):
        raise ValueError(
            "The widths vector needs to be all positive real numbers."
        )

    if burn is None:
        burn = round(n_samples / 3) if state is None else 0
    if thin <= 0:
        raise ValueError(
            "The thinning factor option needs to be a positive integer."
        )
    if burn < 0:
        raise ValueError(
            "The burn-in samples option needs to be a non-negative integer."
        )

    if state is None:
        state = SliceState(
            x=x0,
            log_Px=np.float64(0.0),
            widths=w,
            key=key,
        )

    LB_out = np.nextafter(LB, -np.inf)
    UB_out = np.nextafter(UB, np.inf)
    n_evals = None  # funccount: counted on the segmented paths only
    if seg_moves is not None:
        if move != "cw":
            raise ValueError(
                "seg_moves segmentation supports the 'cw' move only."
            )
        state, packed = _run_chain_moveseg(
            log_f,
            state,
            LB,
            UB,
            LB_out,
            UB_out,
            base_widths,
            int(n_samples),
            int(thin),
            int(burn),
            bool(adaptive),
            int(max_shrink),
            f_args,
            bool(step_out),
            log_prior,
            int(seg_moves),
        )
    elif seg_sweeps is not None:
        state, packed, n_evals = _run_chain_segmented(
            log_f,
            state,
            LB,
            UB,
            LB_out,
            UB_out,
            base_widths,
            int(n_samples),
            int(thin),
            int(burn),
            bool(adaptive),
            int(max_shrink),
            f_args,
            bool(step_out),
            log_prior,
            int(seg_sweeps),
            str(move),
        )
    else:
        state, packed = _run_chain(
            log_f,
            state,
            LB,
            UB,
            LB_out,
            UB_out,
            base_widths,
            int(n_samples),
            int(thin),
            int(burn),
            bool(adaptive),
            int(max_shrink),
            f_args,
            bool(step_out),
            log_prior,
            str(move),
        )
    packed = np.asarray(packed)  # the chain's single device->host pull
    init_log_Px = packed[0, 0]
    f_vals = packed[1:, 0:1]
    log_priors = packed[1:, 1]
    samples = packed[1:, 2:]
    if not np.isfinite(init_log_Px):
        raise ValueError(
            "The initial starting point X0 needs to evaluate to a real "
            "number (not Inf or NaN)."
        )

    if log_prior is not None:
        # The chain carries the full density; split the reported values
        # so f_vals excludes the prior (reference result contract).
        f_vals = f_vals - log_priors[:, None]

    _logger.info("\nSampling terminated:")
    _logger.info(
        " * %d samples obtained after a burn-in period of %d samples",
        samples.shape[0],
        burn,
    )

    exit_flag, R, eff_N = 0, None, None
    if diagnostics:
        exit_flag, R, eff_N = diagnose(samples)
        if exit_flag in (-2, -3):
            _logger.info(
                " * Try sampling for longer, by increasing N or the "
                "thinning factor"
            )
        elif exit_flag == -1:
            _logger.info(
                " * Try increasing thinning factor to obtain more "
                "uncorrelated samples"
            )

    result = {
        "samples": samples,
        "f_vals": f_vals,
        "log_priors": log_priors,
        "exit_flag": exit_flag,
        "R": R,
        "eff_N": eff_N,
        # funccount analog (reference slice_sample.py:157); None on the
        # monolithic / move-segmented paths (uncounted).
        "n_evals": None if n_evals is None else int(np.asarray(n_evals)),
    }
    return result, state


def sample_chains(
    log_f,
    x0s,
    key,
    widths=None,
    LB=None,
    UB=None,
    n_samples: int = 100,
    thin: int = 1,
    burn: int = None,
    adaptive: bool = True,
    max_shrink: int = 256,
    f_args=(),
    mesh=None,
    seg_sweeps: int = None,
    move: str = "cw",
    width_base: bool = True,
):
    """Run B independent chains in parallel (vmapped), one per row of
    ``x0s`` (B, D).  Returns (samples (B, n, D), f_vals (B, n)).

    ``width_base=False`` drops the end-of-burn geometric width floor
    (see :func:`sample`); the 5*std rule alone sets post-burn widths.

    This is the TPU answer to the reference's single sequential chain:
    the NLML evaluations of all chains batch into one XLA Cholesky per
    step (SURVEY.md section 2.3, "MCMC-chain parallelism").

    ``mesh`` (a 1-D jax.sharding.Mesh over axis 'batch') shards the
    chain axis across devices — chains are embarrassingly parallel, so
    each chip runs its slab of chains with data replicated and zero
    per-step collectives; a B not divisible by the mesh size is padded
    up (the extra chains are dropped from the outputs).

    ``seg_sweeps`` (large N, watchdog: see :func:`sample`) advances all
    chains together through watchdog-bounded dispatches
    (:func:`_run_chains_segmented`) — each dispatch still batches the
    chains' evals into one program.
    """
    # Host-side setup (numpy): uploads fold into the vmapped chain
    # dispatch — see sample() above for the per-eager-op latency
    # rationale.
    x0s = np.asarray(x0s, dtype=np.float64)
    B, D = x0s.shape
    B_real = B
    if mesh is not None and B % int(mesh.devices.size):
        # Pad the chain axis to the mesh instead of failing or silently
        # dropping the sharding (VERDICT r3 Weak #4): extra chains run
        # from the last start with their own key substream and are
        # dropped from the outputs.  NOTE: jax.random.split(key, B)
        # depends on B, so a padded run draws different chains than an
        # unpadded one — each is a valid sample of the same law.
        ndev = int(mesh.devices.size)
        pad = -(-B // ndev) * ndev - B
        x0s = np.concatenate([x0s, np.tile(x0s[-1:], (pad, 1))])
        B += pad

    def _expand(v, default):
        if v is None:
            return np.full((D,), default, dtype=np.float64)
        return np.broadcast_to(
            np.asarray(v, dtype=np.float64).ravel(), (D,)
        ).copy()

    LB = _expand(LB, -np.inf)
    UB = _expand(UB, np.inf)

    base_widths = None
    if widths is None:
        w = (UB - LB) / 2.0
    else:
        w = np.broadcast_to(
            np.asarray(widths, dtype=np.float64).ravel(), (D,)
        ).copy()
        if width_base:
            base_widths = w
    w = np.where(np.isinf(w), 10.0, w)
    w = np.where(LB == UB, 1.0, w)

    if burn is None:
        burn = round(n_samples / 3)

    keys = jax.random.split(key, B)
    x_arr = x0s
    logp_arr = np.zeros((B,), dtype=np.float64)
    w_arr = np.broadcast_to(w, (B, D)).copy()
    if mesh is not None:
        # Shard the chain axis; jit follows the input sharding, so each
        # device advances only its own chains (computation-follows-data;
        # the vmapped sweep has no cross-chain dependence).
        from jax.sharding import NamedSharding, PartitionSpec as P

        row = NamedSharding(mesh, P("batch"))
        row2 = NamedSharding(mesh, P("batch", None))
        x_arr = jax.device_put(jnp.asarray(x_arr), row2)
        logp_arr = jax.device_put(jnp.asarray(logp_arr), row)
        w_arr = jax.device_put(jnp.asarray(w_arr), row2)
        keys = jax.device_put(keys, row)
    states = SliceState(
        x=x_arr,
        log_Px=logp_arr,
        widths=w_arr,
        key=keys,
    )

    LB_out = np.nextafter(LB, -np.inf)
    UB_out = np.nextafter(UB, np.inf)

    if seg_sweeps is not None:
        # Batched bounded dispatches: all B chains advance together in
        # each watchdog-safe segment (their evals share one batched
        # Cholesky), mesh sharding of the chain axis included.
        _, packed, n_evals = _run_chains_segmented(
            log_f,
            states,
            LB,
            UB,
            LB_out,
            UB_out,
            base_widths,
            int(n_samples),
            int(thin),
            int(burn),
            bool(adaptive),
            int(max_shrink),
            f_args,
            False,
            None,
            int(seg_sweeps),
            str(move),
        )
        packed = np.asarray(packed)
        # Per-chain funccount, surfaced as a function attribute so the
        # (samples, f_vals) return contract stays unchanged; callers
        # that want it read it immediately after the call.
        sample_chains.last_n_evals = np.asarray(n_evals)[:B_real]
        return packed[:B_real, 1:, 2:], packed[:B_real, 1:, 0]

    def one(state):
        _, packed = _run_chain(
            log_f,
            state,
            LB,
            UB,
            LB_out,
            UB_out,
            base_widths,
            int(n_samples),
            int(thin),
            int(burn),
            bool(adaptive),
            int(max_shrink),
            f_args,
            False,
            None,
            str(move),
        )
        return packed

    # One pull for all chains (packed rows: see _run_chain).
    packed = np.asarray(jax.vmap(one)(states))
    sample_chains.last_n_evals = None  # uncounted on this path
    return packed[:B_real, 1:, 2:], packed[:B_real, 1:, 0]
