"""The design + multistart-MAP phase of ``GP.fit``.

Extracted from gp.py (VERDICT r4 #6 follow-through) with behavior
preserved exactly; reference flow gaussian_process.py:1087-1196.  Three
backends:

- fused device path (default): design evaluation + start selection +
  multistart L-BFGS run as ONE device program with one packed pull
  (map_optimize.design_optimize), segmented into bounded dispatches
  above the watchdog threshold;
- split device path (``opts_N == 0`` or after f_min_fill): batched
  design NLML then a vmapped multistart L-BFGS;
- scipy path (``optimizer_backend='scipy'``): sequential L-BFGS-B
  restarts driving the jitted value-and-grad, matching the reference's
  optimizer exactly (gaussian_process.py:1177-1188).
"""

import math
import time

import numpy as np
import scipy as sp

from ..core.nlml import get_fns
from ..f_min_fill import build_design, f_min_fill
from . import map_optimize as _map_optimize


def _design_chunk(rank_nr, B0):
    """Memory-bounded design-eval vmap chunk: ~2 GB of
    ``(chunk, rank_nr, rank_nr)`` f64 workspace, capped at the design
    size and rounded down to a power of two (``chunk`` is a static
    argument of the fused fit program).  ``rank_nr`` is the row count
    the ranking program actually evaluates — the padded data rows, or
    the ``design_subset`` size when subset ranking is active (sizing
    from the full N would serialize the very evaluations the knob
    exists to batch: chunk=1 at 16k)."""
    raw = max(
        1,
        min(int(B0), 2**31 // max(1, int(rank_nr) ** 2 * 8 * 3)),
    )
    return 1 << (int(raw).bit_length() - 1)


def design_and_map(
    gp,
    hyp0,
    LB,
    UB,
    PLB,
    PUB,
    options,
    opts_N,
    init_N,
    init_method,
    tol,
    cov_N,
    noise_N,
    t_start,
):
    """Run the space-filling design and multistart MAP optimization.

    Sets ``gp.fit_timings['design_s'/'optimize_s']`` and returns
    ``(hyp, nll, opt_results, opts_N, widths_default, X0_dev, y0_dev)``
    — the optimized starts (rows), their objective values, per-restart
    optimizer results, the possibly-reduced restart count, the slice
    widths derived from the design spread (zero-fixed), and the
    device-resident sorted design + values when the fused path ran
    (the candidate pool for the sampler's non-finite-start fallback).
    """
    objective_f_1 = lambda hyp_: gp._objective(hyp_)

    opt_backend = options.get("optimizer_backend", "device")
    # Fused path: design evaluation + start selection + multistart
    # L-BFGS run as ONE device program with one packed pull — the
    # split flow pays a full remote round trip per phase.
    fused_device = opt_backend == "device" and opts_N > 0
    X0_dev = y0_dev = None

    ## Space-filling design (batched evaluation on device).
    if fused_device:
        hyp0_2d = np.atleast_2d(np.asarray(hyp0, dtype=np.float64))
        if init_N > 0:
            design = build_design(
                hyp0_2d,
                LB,
                UB,
                PLB,
                PUB,
                gp.hyper_priors,
                init_N,
                init_method,
            )
        else:
            design = hyp0_2d
        gp.fit_timings["design_s"] = time.perf_counter() - t_start
    elif init_N > 0:
        X0, y0 = f_min_fill(
            objective_f_1,
            hyp0,
            LB,
            UB,
            PLB,
            PUB,
            gp.hyper_priors,
            init_N,
            init_method,
            f_batch=gp._objective_batch,
        )
        hyp = X0[0 : np.maximum(opts_N, 1), :]

        # A good low-noise candidate for the second restart
        # (reference gaussian_process.py:1112-1125).
        if noise_N > 0 and 1 < opts_N < init_N:
            xx = X0[opts_N:, :]
            noise_y = y0[opts_N:]
            noise_params = xx[:, cov_N]
            order = np.argsort(noise_params)
            xx = xx[order, :]
            noise_y = noise_y[order]
            idx_best = np.argmin(
                noise_y[0 : math.ceil(0.2 * np.size(noise_y))]
            )
            hyp[1, :] = xx[idx_best, :]

        if init_N > 1:
            widths_default = np.std(X0, axis=0, ddof=1)
        else:
            widths_default = np.zeros(shape=PLB.shape)
    else:
        nll = gp._objective_batch(hyp0)
        order = np.argsort(nll)
        hyp = hyp0[order, :]
        widths_default = PUB - PLB

    if not fused_device:
        gp.fit_timings["design_s"] = time.perf_counter() - t_start

    ## Multistart MAP optimization.
    if fused_device:
        fns, obj_args = gp._obj_args()
        k = int(min(opts_N, design.shape[0]))
        low_idx = (
            cov_N if (noise_N > 0 and 1 < opts_N < init_N) else None
        )
        # Optional subset RANKING of the design (TPU-first speed
        # knob, off by default): each candidate's NLML costs O(N^3),
        # so at large N the 1024-candidate ranking dominates the
        # design+MAP phase even though it only picks the multistart
        # STARTING points.  options["design_subset"]=n_sub ranks the
        # candidates on an evenly-strided n_sub-row data subset
        # (deterministic — no RNG stream change) at O((n_sub/N)^3)
        # of the cost; the multistart L-BFGS and every reported
        # objective value still use the full data.  The reference
        # ranks on the full data (f_min_fill.py:175) — this is an
        # opt-in deviation in start-selection fidelity only.
        design_f_args = None
        design_nr = None
        n_sub = int(options.get("design_subset", 0) or 0)
        n_true = int(gp.X.shape[0])
        if init_N > 0 and 0 < n_sub < n_true:
            spec_d, _, _, _, pack_d = gp._device()
            idx_sub = np.round(
                np.linspace(0, n_true - 1, n_sub)
            ).astype(int)
            fns_sub = get_fns(
                spec_d, gp.s2 is not None, pack_d is not None,
                padded=False,
            )
            sub = [
                np.asarray(gp.X[idx_sub], dtype=gp.dtype),
                np.asarray(gp.y[idx_sub], dtype=gp.dtype),
            ]
            if gp.s2 is not None:
                sub.append(
                    np.asarray(gp.s2[idx_sub], dtype=gp.dtype)
                )
            if pack_d is not None:
                sub.append(pack_d)
            design_f_args = tuple(sub)
            design_nr = n_sub
            obj_design_fn = fns_sub["obj_design_raw"]
        else:
            obj_design_fn = fns["obj_design_raw"]
        # Memory-bounded design-eval chunk (~2 GB of (chunk, N, N)
        # f64 workspace; mirrors _objective_batch).  Derived from
        # the PADDED row count and rounded down to a power of two:
        # 'chunk' is a static argument of the fused program, and a
        # value that tracked the true N would recompile the largest
        # program in fit() at every refit of a growing dataset.
        # With design_subset the ranking program's workspace is the
        # SUBSET size (fixed by the option, so no recompile churn) —
        # sizing the chunk from the full N would serialize the very
        # evaluations the knob exists to batch (chunk=1 at 16k).
        obj_args_nr = obj_args[0].shape[0]
        rank_nr = design_nr if design_nr is not None else obj_args_nr
        chunk = _design_chunk(rank_nr, design.shape[0])
        # Above SEG_MIN_N padded rows the one-dispatch fused program
        # exceeds the TPU runtime's ~6-minute per-dispatch execution
        # watchdog; switch to bounded dispatches (map_optimize.py).
        segments = _map_optimize.segment_plan(
            obj_args_nr, design.shape[0], k, 500,
            nr_design=design_nr,
        )
        (
            xs,
            fs,
            opt_results,
            w_prog,
            X0_dev,
            y0_dev,
        ) = _map_optimize.design_optimize(
            fns["obj_raw"],
            design,
            LB,
            UB,
            f_args=obj_args,
            tol=tol,
            opts_N=k,
            low_noise_idx=low_idx,
            chunk=chunk,
            obj_design_raw=obj_design_fn,
            mesh=gp.mesh,
            segments=segments,
            design_f_args=design_f_args,
        )
        opts_N = k
        hyp = np.array(xs)
        nll = np.array(fs)
        if init_N > 1:
            widths_default = w_prog.copy()
        elif init_N > 0:
            widths_default = np.zeros(shape=PLB.shape)
        else:
            widths_default = PUB - PLB

    # Fix zero widths.
    idx0 = widths_default == 0
    if np.any(idx0):
        if np.shape(hyp)[0] > 1:
            std_hyp = np.std(hyp, axis=0, ddof=1)
            widths_default[idx0] = std_hyp[idx0]
            idx0 = widths_default == 0
        if np.any(idx0):
            widths_default[idx0] = np.minimum(1, UB[idx0] - LB[idx0])

    if not fused_device:
        # Clamp starts strictly inside finite bounds (the fused path
        # transforms to unbounded z-space in-program instead).
        eps_LB = np.reshape(LB.copy(), (1, -1))
        eps_UB = np.reshape(UB.copy(), (1, -1))
        LB_idx = (eps_LB != eps_UB) & np.isfinite(eps_LB)
        UB_idx = (eps_LB != eps_UB) & np.isfinite(eps_UB)
        eps_LB[LB_idx] = np.nextafter(eps_LB[LB_idx], np.inf)
        eps_UB[UB_idx] = np.nextafter(eps_UB[UB_idx], -np.inf)
        hyp = np.minimum(eps_UB, np.maximum(eps_LB, hyp))

        nll = np.full((np.maximum(opts_N, 1),), np.inf)
        opt_results = []
        opts_N = np.minimum(opts_N, hyp.shape[0])

    if fused_device:
        pass  # optimized above, fused with the design evaluation
    elif opts_N > 0 and opt_backend == "device":
        # All restarts advance together in one jitted vmapped L-BFGS
        # (vs the reference's sequential scipy loop,
        # gaussian_process.py:1177-1188).
        fns, obj_args = gp._obj_args()
        xs, fs, opt_results = _map_optimize.multistart_map(
            fns["obj_raw"],
            hyp[:opts_N],
            LB,
            UB,
            f_args=obj_args,
            tol=tol,
        )
        hyp[:opts_N] = xs
        nll[:opts_N] = fs
    else:
        objective_f_2 = lambda hyp_: gp._objective(hyp_, grad=True)
        for i in range(opts_N):
            res = sp.optimize.minimize(
                fun=objective_f_2,
                x0=hyp[i, :],
                jac=True,
                bounds=list(zip(LB, UB)),
                tol=tol,
            )
            opt_results.append(res)
            hyp[i, :] = res.x
            nll[i] = res.fun

    gp.fit_timings["optimize_s"] = (
        time.perf_counter() - t_start - gp.fit_timings["design_s"]
    )

    return hyp, nll, opt_results, opts_N, widths_default, X0_dev, y0_dev
