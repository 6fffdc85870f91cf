"""Batched multistart MAP optimization on device.

The reference runs ``opts_N`` sequential ``scipy.optimize.minimize``
L-BFGS-B restarts (reference gaussian_process.py:1177-1188), each
iteration a host->device round trip.  Here all restarts advance together:
one vmapped L-BFGS (optax, zoom linesearch) inside a single jitted
``lax.while_loop``, so the whole MAP phase is one XLA program and the
batched NLML+grad evaluations share one batched Cholesky per step.

Box constraints are handled with a smooth bijection onto the unbounded
space (sigmoid for two-sided bounds, exp-shift for one-sided, identity
for free; fixed dimensions LB == UB are pinned), so the optimum matches
L-BFGS-B up to the usual multistart path differences — the reference's
own fit tests compare recovered hyperparameters within loose tolerance,
not optimizer iterates (testing/test_gaussian_process.py:844).
"""

import math
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax import lax

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map
from jax.sharding import PartitionSpec as _P

_BIG = 1e4  # |z| cap keeping sigmoid/exp transforms non-degenerate


def _repl_specs(tree):
    """Replicated PartitionSpecs matching an argument pytree."""
    return jax.tree.map(lambda _: _P(), tree)


def _smap(f, mesh, in_specs, out_specs):
    """shard_map with the varying-manual-axes check disabled: optax's
    value_and_grad_from_state carries a lax.cond whose branches mix
    replicated and device-varying outputs, which the check rejects even
    though the per-device computation is independent and correct."""
    try:
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax kwarg name
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def _make_transform(LB, UB):
    """Pure functions (z -> x, x -> z) for the box [LB, UB].

    Cached by the bounds' FINITENESS PATTERN only — the bound values
    themselves are closed over as device arrays, which jit treats as
    traced constants of stable identity?  No: to keep the jitted
    optimizer program reusable when bound VALUES change (they are
    data-dependent and change on every warm refit), the closures take
    the packed bound parameters as an explicit traced argument ``bp``;
    only the masks (which select the transform branch per dimension)
    are baked in statically."""
    LB = np.asarray(LB, dtype=np.float64)
    UB = np.asarray(UB, dtype=np.float64)
    fin_l = np.isfinite(LB)
    fin_u = np.isfinite(UB)
    fixed = LB == UB
    to_x, to_z = _make_transform_cached(
        tuple(fin_l.tolist()), tuple(fin_u.tolist()), tuple(fixed.tolist())
    )
    two = fin_l & fin_u & ~fixed
    # Host-side packed bound params: uploaded as part of the optimizer
    # dispatch (an eager jnp.stack here would cost a tunnel round trip
    # per fit before the optimization even starts).
    bp = np.stack(
        [
            np.where(fin_l, LB, 0.0),
            np.where(fin_u, UB, 0.0),
            np.where(two, UB - LB, 1.0),
        ]
    )
    return to_x, to_z, bp


@lru_cache(maxsize=128)
def _make_transform_cached(fin_l, fin_u, fixed):
    fin_l = np.asarray(fin_l)
    fin_u = np.asarray(fin_u)
    fixed = np.asarray(fixed)
    two = fin_l & fin_u & ~fixed
    lo_only = fin_l & ~fin_u
    hi_only = fin_u & ~fin_l
    free = ~fin_l & ~fin_u

    two_j = jnp.asarray(two)
    lo_j = jnp.asarray(lo_only)
    hi_j = jnp.asarray(hi_only)
    free_j = jnp.asarray(free)
    fixed_j = jnp.asarray(fixed)

    def to_x(z, bp):
        LBj, UBj, width = bp[0], bp[1], bp[2]
        z = jnp.clip(z, -_BIG, _BIG)
        x_two = LBj + width * jax.nn.sigmoid(z)
        x_lo = LBj + jnp.exp(z)
        x_hi = UBj - jnp.exp(z)
        x = jnp.where(two_j, x_two, 0.0)
        x = x + jnp.where(lo_j, x_lo, 0.0)
        x = x + jnp.where(hi_j, x_hi, 0.0)
        x = x + jnp.where(free_j, z, 0.0)
        x = x + jnp.where(fixed_j, LBj, 0.0)
        return x

    def to_z(x, bp):
        LBj, UBj, width = bp[0], bp[1], bp[2]
        p = jnp.clip((x - LBj) / width, 1e-12, 1.0 - 1e-12)
        z_two = jnp.log(p) - jnp.log1p(-p)
        z_lo = jnp.log(jnp.maximum(x - LBj, 1e-300))
        z_hi = jnp.log(jnp.maximum(UBj - x, 1e-300))
        z = jnp.where(two_j, z_two, 0.0)
        z = z + jnp.where(lo_j, z_lo, 0.0)
        z = z + jnp.where(hi_j, z_hi, 0.0)
        z = z + jnp.where(free_j, x, 0.0)
        return z

    return to_x, to_z


def _lbfgs_machinery(obj_raw, to_x, memory_size, bp, tol, f_args):
    """Shared L-BFGS step for the one-dispatch and segmented paths.

    Returns ``(opt, step)`` where ``step(z, state, it, prev_f)`` advances
    one iteration and reports the convergence flag: gradient-inf-norm
    below ``tol``, step below 1e-12, or relative objective decrease below
    ``tol`` (the same semantics scipy L-BFGS-B's ftol/gtol pair gives
    ``minimize(tol=...)`` — without the f-drop stop, flat valleys in the
    transformed space keep the gradient above tol for hundreds of wasted
    iterations)."""
    opt = optax.lbfgs(memory_size=memory_size)

    def fun(z, *args):
        # Optimize in the z dtype (f64) even when the GP computes in f32
        # (optax caches the value in the state; dtypes must agree).
        return obj_raw(to_x(z, bp), *args).astype(z.dtype)

    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(z, state, it, prev_f):
        value, grad = value_and_grad(z, *f_args, state=state)
        updates, state = opt.update(
            grad,
            state,
            z,
            value=value,
            grad=grad,
            value_fn=lambda zz: fun(zz, *f_args),
        )
        z_new = optax.apply_updates(z, updates)
        gnorm = jnp.max(jnp.abs(grad))
        stepsz = jnp.max(jnp.abs(z_new - z))
        fdrop = (prev_f - value) / jnp.maximum(
            jnp.maximum(jnp.abs(prev_f), jnp.abs(value)), 1.0
        )
        done = jnp.logical_or(gnorm < tol, stepsz < 1e-12)
        done = jnp.logical_or(done, fdrop < tol)
        done = jnp.logical_or(done, ~jnp.isfinite(value))
        return z_new, state, it + 1, value, done

    return opt, step


def _multistart_core(
    obj_raw, to_x, bp, tol, max_iter, memory_size, f_args, z0
):
    opt, step = _lbfgs_machinery(
        obj_raw, to_x, memory_size, bp, tol, f_args
    )

    def one_start(z_init):
        state0 = opt.init(z_init)

        def cond(carry):
            z, state, it, prev_f, done = carry
            return jnp.logical_and(~done, it < max_iter)

        def body(carry):
            z, state, it, prev_f, _ = carry
            return step(z, state, it, prev_f)

        z, state, it, _, _ = lax.while_loop(
            cond,
            body,
            (
                z_init,
                state0,
                0,
                jnp.asarray(jnp.inf, z_init.dtype),
                jnp.asarray(False),
            ),
        )
        x = to_x(z, bp)
        f = obj_raw(x, *f_args)
        return x, f, it

    # lax.map (sequential on device), NOT vmap: the vmapped
    # while_loop+linesearch program miscompiles on the v5e toolchain —
    # batched lanes returned different optima than solo runs and
    # specific start batches faulted the TPU worker outright.  The
    # sequential map compiles the body once and stays a single dispatch.
    return lax.map(one_start, z0)


@partial(
    jax.jit,
    static_argnames=("obj_raw", "to_x", "to_z", "max_iter", "memory_size"),
)
def _run_multistart(
    obj_raw,
    to_x,
    to_z,
    starts,  # (B, n) in x-space; transformed to z inside the program
    bp,  # (3, n) packed bound params (LB, UB, width), traced
    tol,
    max_iter: int,
    memory_size: int,
    f_args,
):
    z0 = jax.vmap(to_z, in_axes=(0, None))(starts, bp)
    xs, fs, its = _multistart_core(
        obj_raw, to_x, bp, tol, max_iter, memory_size, f_args, z0
    )
    # One packed output -> one device->host pull (the remote tunnel
    # charges a fixed latency per transfer).
    return jnp.concatenate(
        [xs, fs[:, None], its[:, None].astype(xs.dtype)], axis=1
    )


@partial(
    jax.jit,
    static_argnames=(
        "obj_raw",
        "obj_design_raw",
        "to_x",
        "to_z",
        "opts_N",
        "low_noise_idx",
        "chunk",
        "max_iter",
        "memory_size",
        "mesh",
    ),
)
def _run_design_optimize(
    obj_raw,
    obj_design_raw,
    to_x,
    to_z,
    design,  # (B0, n) candidate hyp rows (x0 rows first)
    bp,
    tol,
    opts_N: int,
    low_noise_idx,
    chunk: int,
    max_iter: int,
    memory_size: int,
    f_args,
    design_f_args,
    mesh=None,
):
    """Design evaluation + start selection + multistart L-BFGS fused
    into ONE program (one dispatch, one packed pull): the space-filling
    phase and the optimization phase otherwise each pay a full remote
    round trip per fit (reference flow gaussian_process.py:1097-1188).

    With ``mesh`` (a 1-D ``jax.sharding.Mesh`` over axis 'batch'), the
    two hot loops shard over chips: the design's candidate axis — the
    primary data-parallel axis of the workload (SURVEY.md section 2.3) —
    splits across devices with data replicated, and the multistart
    L-BFGS lanes run one-per-device (each device executes its local
    ``lax.map`` chain; no cross-device communication until the final
    gather).  Still one program, one packed pull.

    Returns ``(packed, X_sorted, y_sorted)``; only ``packed`` (rows
    0..k-1 = [x | f | iters], row k = [widths_default | 0 | 0]) is meant
    to be pulled — the sorted candidate pool stays device-resident for
    the rare non-finite-start fallback.
    """
    B0, n = design.shape
    ndev = 1 if mesh is None else int(mesh.devices.size)
    if ndev > 1:
        # Same clamp as _design_optimize_segmented: without it a chunk
        # sized >= B0 makes per_dev = chunk, so devices 1..ndev-1 only
        # evaluate pad copies of row 0 (ndev x wasted design evals and
        # zero sharding speedup).
        chunk = int(max(1, min(chunk, -(-B0 // ndev))))

    def eval_chunked(d_local, f_args_t):
        n_chunks = d_local.shape[0] // chunk
        return lax.map(
            lambda c: jax.vmap(lambda h: obj_design_raw(h, *f_args_t))(c),
            d_local.reshape(n_chunks, chunk, n),
        ).reshape(-1)

    # Pad the candidate count so every device gets a whole number of
    # chunks (padding repeats row 0; extra evaluations are discarded).
    per_dev = -(-B0 // (ndev * chunk)) * chunk
    total = per_dev * ndev
    dpad = (
        jnp.concatenate(
            [design, jnp.broadcast_to(design[:1], (total - B0, n))]
        )
        if total > B0
        else design
    )
    if mesh is None:
        ys = eval_chunked(dpad, design_f_args)[:B0]
    else:
        # f_args replicate across devices (shard_map bodies must not
        # close over traced values, so they ride as explicit args).
        ys = _smap(
            eval_chunked,
            mesh,
            (_P("batch", None), _repl_specs(design_f_args)),
            _P("batch"),
        )(dpad, design_f_args)[:B0]
    # Failed evaluations (NaN kernel factorization) sort last.
    ys = jnp.where(jnp.isfinite(ys), ys, jnp.inf)
    order = jnp.argsort(ys)
    X_sorted = design[order]
    y_sorted = ys[order]
    starts = X_sorted[:opts_N]

    if low_noise_idx is not None and 1 < opts_N < B0:
        # Low-noise second restart (reference :1112-1125): among the
        # 20% lowest-noise leftover candidates, take the best objective.
        rest = X_sorted[opts_N:]
        y_rest = y_sorted[opts_N:]
        noise_order = jnp.argsort(rest[:, low_noise_idx])
        m = max(1, math.ceil(0.2 * rest.shape[0]))
        cand = noise_order[:m]
        starts = starts.at[1].set(rest[cand[jnp.argmin(y_rest[cand])]])

    if B0 > 1:
        widths = jnp.std(design, axis=0, ddof=1)
    else:
        widths = jnp.zeros((n,), design.dtype)

    z0 = jax.vmap(to_z, in_axes=(0, None))(starts, bp)
    if mesh is None:
        xs, fs, its = _multistart_core(
            obj_raw, to_x, bp, tol, max_iter, memory_size, f_args, z0
        )
    else:
        # One restart lane per device (lanes stay independent: each
        # device runs its own sequential lax.map — the v5e-safe shape).
        k = z0.shape[0]
        k_pad = -(-k // ndev) * ndev
        z0p = (
            jnp.concatenate(
                [z0, jnp.broadcast_to(z0[:1], (k_pad - k, n))]
            )
            if k_pad > k
            else z0
        )

        def opt_local(z0_local, bp_t, tol_t, f_args_t):
            return _multistart_core(
                obj_raw, to_x, bp_t, tol_t, max_iter, memory_size,
                f_args_t, z0_local,
            )

        xs, fs, its = _smap(
            opt_local,
            mesh,
            (
                _P("batch", None),
                _P(),
                _P(),
                _repl_specs(f_args),
            ),
            (_P("batch", None), _P("batch"), _P("batch")),
        )(z0p, bp, tol, f_args)
        xs, fs, its = xs[:k], fs[:k], its[:k]
    packed = jnp.concatenate(
        [xs, fs[:, None], its[:, None].astype(xs.dtype)], axis=1
    )
    w_row = jnp.concatenate(
        [widths, jnp.zeros((2,), dtype=xs.dtype)]
    )[None, :]
    return jnp.concatenate([packed, w_row], axis=0), X_sorted, y_sorted


# --- Segmented (bounded-dispatch) path ------------------------------
#
# The axon TPU runtime kills any single dispatch whose device execution
# runs longer than roughly six minutes ("TPU worker process crashed or
# restarted"; measured empirically: a 338 s dispatch survives, a ~450 s
# one dies).  At N=16384 the fused design+multistart program executes
# 10+ minutes, so above SEG_MIN_N padded rows the fit switches to
# bounded dispatches with device-carried state: the design evaluates in
# fixed-size row segments, and the multistart L-BFGS advances all lanes
# a fixed number of iterations per dispatch, carrying (z, optimizer
# state, iteration count, last value, done flag) between dispatches.
# Dispatches are issued asynchronously (no host sync until the final
# pull), so the overhead per segment is the fixed ~30 ms tunnel dispatch
# cost; converged lanes exit their while_loop immediately, making
# leftover iteration segments ~free.

SEG_MIN_N = 8192  # padded rows above which fit programs are segmented

# Measured forward NLML cost at N=16384 on one v5e (K build + jittered
# Cholesky + solves, f32): ~0.45 s; scales as N^3.  Budgets target
# ≤ ~90 s nominal per dispatch — 4x under the watchdog so the known
# transient 2-6x tunnel/device slowdowns cannot push a dispatch over.
_EVAL_S_16K = 0.45
_DISPATCH_BUDGET_S = 90.0


def _per_eval_s(nr):
    return _EVAL_S_16K * (nr / 16384.0) ** 3


def segment_plan(nr, B0, opts_N, max_iter, nr_design=None):
    """Bounded-dispatch budgets for padded row count ``nr``; None if the
    one-dispatch fused program is safe.  ``nr_design`` (default ``nr``)
    is the row count the DESIGN ranking evaluates — smaller when the
    caller ranks candidates on a data subset (gp.fit design_subset)."""
    if nr < SEG_MIN_N:
        return None
    per = _per_eval_s(nr)
    per_design = _per_eval_s(nr if nr_design is None else nr_design)
    design_seg = int(
        np.clip(_DISPATCH_BUDGET_S / per_design, 1, max(1, B0))
    )
    # One L-BFGS iteration steps every lane (sequential lax.map) and the
    # zoom linesearch costs ~4 NLML+grad evaluations per update.
    iter_seg = int(
        np.clip(
            _DISPATCH_BUDGET_S / (per * 4.0 * max(1, opts_N)),
            1,
            max(1, max_iter),
        )
    )
    return design_seg, iter_seg


def sweep_segment_plan(nr, n_dims, chains=1):
    """Sweeps-per-dispatch budget for the device slice/MALA chains at
    padded row count ``nr``; None below SEG_MIN_N (monolithic chain is
    safe).  A slice sweep evaluates the NLML ~8 times per non-fixed
    hyperparameter dimension (bracket + shrinkage, empirical mean).
    ``chains`` scales the budget for batched multi-chain sweeps (each
    eval is a B-batched Cholesky, ~B x the device time of one)."""
    if nr < SEG_MIN_N:
        return None
    per_sweep = _per_eval_s(nr) * 8.0 * max(1, n_dims) * max(1, chains)
    return int(np.clip(_DISPATCH_BUDGET_S / per_sweep, 1, 512))


def chain_segment_plan(nr, evals_per_iter=2.5):
    """Iterations-per-dispatch budget for single-move-per-iteration
    chains (MALA: one value_and_grad ≈ 2.5 forward NLMLs; ensemble
    slice: ~2 forwards per walker move) at padded row count ``nr``;
    None below SEG_MIN_N."""
    if nr < SEG_MIN_N:
        return None
    per_iter = _per_eval_s(nr) * evals_per_iter
    return int(np.clip(_DISPATCH_BUDGET_S / per_iter, 1, 4096))


@partial(jax.jit, static_argnames=("obj_design_raw", "chunk"))
def _eval_design_seg(obj_design_raw, d_seg, f_args, chunk: int):
    n_chunks = d_seg.shape[0] // chunk
    return lax.map(
        lambda c: jax.vmap(lambda h: obj_design_raw(h, *f_args))(c),
        d_seg.reshape(n_chunks, chunk, d_seg.shape[1]),
    ).reshape(-1)


@partial(jax.jit, static_argnames=("obj_design_raw", "chunk", "mesh"))
def _eval_design_seg_mesh(obj_design_raw, d_seg, f_args, chunk: int, mesh):
    """Mesh twin of :func:`_eval_design_seg`: candidate rows sharded
    over the 'batch' axis (the SURVEY §2.3 primary DP axis), data
    replicated, no collectives.  Row count must divide mesh*chunk
    (callers pad)."""
    n = d_seg.shape[1]

    def local(d_local, f_args_t):
        n_chunks = d_local.shape[0] // chunk
        return lax.map(
            lambda c: jax.vmap(lambda h: obj_design_raw(h, *f_args_t))(c),
            d_local.reshape(n_chunks, chunk, n),
        ).reshape(-1)

    return _smap(
        local, mesh, (_P("batch", None), _repl_specs(f_args)), _P("batch")
    )(d_seg, f_args)


@partial(jax.jit, static_argnames=("to_z", "memory_size"))
def _ms_init(to_z, starts, bp, memory_size: int):
    opt = optax.lbfgs(memory_size=memory_size)
    z0 = jax.vmap(to_z, in_axes=(0, None))(starts, bp)

    def one(z):
        return (
            z,
            opt.init(z),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(jnp.inf, z.dtype),
            jnp.asarray(False),
        )

    return lax.map(one, z0)


@partial(
    jax.jit,
    static_argnames=("obj_raw", "to_x", "seg", "max_iter", "memory_size"),
)
def _ms_seg(
    obj_raw,
    to_x,
    carry,
    bp,
    tol,
    seg: int,
    max_iter: int,
    memory_size: int,
    f_args,
):
    return _ms_lane_loop(
        obj_raw, to_x, carry, bp, tol, seg, max_iter, memory_size, f_args
    )


def _ms_lane_loop(
    obj_raw, to_x, carry, bp, tol, seg, max_iter, memory_size, f_args
):
    """Advance every lane up to ``seg`` L-BFGS iterations (shared body
    of the single-device and mesh-sharded segment programs)."""
    opt, step = _lbfgs_machinery(
        obj_raw, to_x, memory_size, bp, tol, f_args
    )

    def one(lane):
        z, state, it, prev_f, done = lane

        def cond(c):
            _, _, it, _, done, k = c
            return jnp.logical_and(
                ~done, jnp.logical_and(k < seg, it < max_iter)
            )

        def body(c):
            z, state, it, prev_f, _, k = c
            z, state, it, prev_f, done = step(z, state, it, prev_f)
            return z, state, it, prev_f, done, k + 1

        z, state, it, prev_f, done, _ = lax.while_loop(
            cond, body, (z, state, it, prev_f, done, 0)
        )
        return z, state, it, prev_f, done

    return lax.map(one, carry)


@partial(
    jax.jit,
    static_argnames=(
        "obj_raw",
        "to_x",
        "seg",
        "max_iter",
        "memory_size",
        "mesh",
    ),
)
def _ms_seg_mesh(
    obj_raw,
    to_x,
    carry,
    bp,
    tol,
    seg: int,
    max_iter: int,
    memory_size: int,
    f_args,
    mesh,
):
    """Mesh twin of :func:`_ms_seg`: restart lanes sharded over the
    'batch' axis (each device advances its own lanes; no collectives —
    lanes are independent).  Lane count must divide the mesh size
    (callers pad)."""
    specs = jax.tree.map(
        lambda leaf: _P(*(("batch",) + (None,) * (leaf.ndim - 1))),
        carry,
    )

    def local(carry_l, bp_t, tol_t, f_args_t):
        return _ms_lane_loop(
            obj_raw, to_x, carry_l, bp_t, tol_t, seg, max_iter,
            memory_size, f_args_t,
        )

    return _smap(
        local, mesh, (specs, _P(), _P(), _repl_specs(f_args)), specs
    )(carry, bp, tol, f_args)


@partial(jax.jit, static_argnames=("obj_raw", "to_x"))
def _ms_finalize(obj_raw, to_x, carry, bp, f_args):
    z, _, it, _, _ = carry

    def one(args):
        z_i, it_i = args
        x = to_x(z_i, bp)
        f = obj_raw(x, *f_args)
        return jnp.concatenate(
            [x, f[None].astype(x.dtype), it_i[None].astype(x.dtype)]
        )

    return lax.map(one, (z, it))


def _design_optimize_segmented(
    obj_raw,
    obj_design_raw,
    design,
    LB,
    UB,
    f_args,
    design_f_args,
    tol,
    opts_N,
    low_noise_idx,
    chunk,
    design_seg,
    iter_seg,
    max_iter,
    memory_size,
    mesh=None,
):
    """Bounded-dispatch twin of :func:`_run_design_optimize`:
    same selection logic, same optimizer, same results — but no single
    dispatch executes more than ~``_DISPATCH_BUDGET_S`` of device time.
    With ``mesh``, each segment shards its candidate rows / restart
    lanes over the 'batch' axis (same layout as the monolithic mesh
    path); per-device dispatch time only shrinks, so the watchdog
    budget stays safe.  Returns ``(xs, fs, its, widths_default,
    X_sorted, y_sorted)`` with the candidate pool host-resident."""
    design = np.atleast_2d(np.asarray(design, dtype=np.float64))
    B0, n = design.shape
    to_x, to_z, bp = _make_transform(LB, UB)
    ndev = 1 if mesh is None else int(mesh.devices.size)

    # Phase 1 — design evaluation in fixed-size row segments.  All
    # segments share ONE static shape (remote-compiling a second
    # program for a ragged tail costs minutes at 16k): the segment size
    # is the equal split of B0 rounded up to a (devices x chunk)
    # multiple, and the tail pads by repeating row 0 (a few wasted
    # evaluations).
    chunk = int(max(1, min(chunk, B0)))
    if ndev > 1:
        # Keep the (devices x chunk) segment unit near B0: an oversized
        # unit pads with wasted candidate evaluations.
        chunk = int(max(1, min(chunk, -(-B0 // ndev))))
    unit = chunk * ndev
    design_seg = int(max(unit, (design_seg // unit) * unit))
    n_segs = -(-B0 // design_seg)
    per_seg = -(-B0 // n_segs)
    design_seg = -(-per_seg // unit) * unit
    ys_parts = []
    for i0 in range(0, B0, design_seg):
        seg_rows = design[i0 : i0 + design_seg]
        pad = design_seg - seg_rows.shape[0]
        if pad > 0:
            seg_rows = np.concatenate(
                [seg_rows, np.broadcast_to(design[:1], (pad, n))]
            )
        if mesh is None:
            ys_parts.append(
                _eval_design_seg(
                    obj_design_raw, seg_rows, tuple(design_f_args), chunk
                )
            )
        else:
            ys_parts.append(
                _eval_design_seg_mesh(
                    obj_design_raw,
                    seg_rows,
                    tuple(design_f_args),
                    chunk,
                    mesh,
                )
            )
    ys = np.concatenate([np.asarray(p) for p in ys_parts])[:B0]
    ys = np.where(np.isfinite(ys), ys, np.inf)
    order = np.argsort(ys, kind="stable")  # match jnp.argsort (stable)
    X_sorted = design[order]
    y_sorted = ys[order]
    k = int(min(opts_N, B0))
    starts = X_sorted[:k].copy()

    if low_noise_idx is not None and 1 < k < B0:
        # Low-noise second restart (reference gaussian_process.py:
        # 1112-1125), mirroring _run_design_optimize host-side.
        rest = X_sorted[k:]
        y_rest = y_sorted[k:]
        noise_order = np.argsort(rest[:, low_noise_idx], kind="stable")
        m = max(1, math.ceil(0.2 * rest.shape[0]))
        cand = noise_order[:m]
        starts[1] = rest[cand[np.argmin(y_rest[cand])]]

    if B0 > 1:
        widths_default = np.std(design, axis=0, ddof=1)
    else:
        widths_default = np.zeros((n,), design.dtype)

    # Phase 2 — multistart L-BFGS in bounded iteration segments.  All
    # segments dispatch asynchronously; lanes that converge early make
    # their remaining segments no-ops (the while_loop condition fails on
    # entry), so no host-side convergence polling is needed.  With a
    # mesh, lanes pad to a whole number per device and shard.
    k_pad = -(-k // ndev) * ndev
    starts_p = (
        np.concatenate(
            [starts, np.broadcast_to(starts[:1], (k_pad - k, n))]
        )
        if k_pad > k
        else starts
    )
    carry = _ms_init(to_z, starts_p, bp, int(memory_size))
    tol64 = np.float64(tol)
    for _ in range(-(-int(max_iter) // int(iter_seg))):
        if mesh is None:
            carry = _ms_seg(
                obj_raw,
                to_x,
                carry,
                bp,
                tol64,
                int(iter_seg),
                int(max_iter),
                int(memory_size),
                tuple(f_args),
            )
        else:
            carry = _ms_seg_mesh(
                obj_raw,
                to_x,
                carry,
                bp,
                tol64,
                int(iter_seg),
                int(max_iter),
                int(memory_size),
                tuple(f_args),
                mesh,
            )
    packed = np.asarray(
        _ms_finalize(obj_raw, to_x, carry, bp, tuple(f_args))
    )[:k]
    xs, fs, its = packed[:, :-2], packed[:, -2], packed[:, -1]
    return xs, fs, its, widths_default, X_sorted, y_sorted


def design_optimize(
    obj_raw,
    design,
    LB,
    UB,
    f_args=(),
    tol=1e-5,
    opts_N=3,
    low_noise_idx=None,
    chunk=None,
    max_iter=500,
    memory_size=10,
    obj_design_raw=None,
    mesh=None,
    segments=None,
    design_f_args=None,
):
    """Fused design-eval + top-k selection + multistart MAP.

    ``design`` is the full host-built candidate matrix (x0 rows first;
    see f_min_fill.build_design).  Returns ``(xs, fs, results,
    widths_default, X_sorted_dev, y_sorted_dev)`` — the last two are
    device-resident (pull only if needed).

    ``segments=(design_seg, iter_seg)`` (see :func:`segment_plan`)
    switches to the bounded-dispatch path — required above
    ``SEG_MIN_N`` padded rows, where the one-dispatch fused program
    exceeds the TPU runtime's per-dispatch execution watchdog.

    ``design_f_args`` (default ``f_args``): the argument tuple the
    design RANKING evaluates ``obj_design_raw`` with — a data subset
    when the caller trades ranking fidelity for O((N_sub/N)^3) design
    cost (gp.fit ``design_subset``).  The optimization phase and the
    returned objective values always use the full ``f_args``.
    """
    design = np.atleast_2d(np.asarray(design, dtype=np.float64))
    B0 = design.shape[0]
    opts_N = int(min(opts_N, B0))
    if chunk is None:
        chunk = B0
    chunk = int(max(1, min(chunk, B0)))
    if design_f_args is None:
        design_f_args = f_args
    if segments is not None:
        # The watchdog bound applies with or without a mesh (sharding
        # shortens a dispatch, never lengthens it — but a monolithic
        # 16k fused program is hours past the ~6-min kill either way),
        # so the segmented path must never be skipped just because a
        # mesh is set.
        xs, fs, its, widths_default, X_sorted, y_sorted = (
            _design_optimize_segmented(
                obj_raw,
                obj_design_raw if obj_design_raw is not None else obj_raw,
                design,
                LB,
                UB,
                f_args,
                design_f_args,
                tol,
                opts_N,
                low_noise_idx,
                chunk,
                segments[0],
                segments[1],
                max_iter,
                memory_size,
                mesh=mesh,
            )
        )
        xs, results = _clamp_and_pack(xs, fs, its, LB, UB)
        return xs, fs, results, widths_default, X_sorted, y_sorted
    to_x, to_z, bp = _make_transform(LB, UB)
    packed_dev, X_sorted, y_sorted = _run_design_optimize(
        obj_raw,
        obj_design_raw if obj_design_raw is not None else obj_raw,
        to_x,
        to_z,
        design,
        bp,
        np.float64(tol),
        opts_N,
        low_noise_idx,
        chunk,
        int(max_iter),
        int(memory_size),
        tuple(f_args),
        tuple(design_f_args),
        mesh,
    )
    packed = np.asarray(packed_dev)  # the phase's single pull
    xs, fs, its = packed[:-1, :-2], packed[:-1, -2], packed[:-1, -1]
    widths_default = packed[-1, :-2]
    xs, results = _clamp_and_pack(xs, fs, its, LB, UB)
    return xs, fs, results, widths_default, X_sorted, y_sorted


def _clamp_and_pack(xs, fs, its, LB, UB):
    """Clamp optimizer outputs strictly inside the numerical bounds
    (transform round-off; fixed dims stay pinned) and wrap each restart
    as a MapResult — shared by the segmented/monolithic design paths
    and the bare multistart driver."""
    LBc = np.nextafter(np.asarray(LB, dtype=np.float64), np.inf)
    UBc = np.nextafter(np.asarray(UB, dtype=np.float64), -np.inf)
    fixed = np.asarray(LB) == np.asarray(UB)
    xs = np.clip(xs, np.where(fixed, LB, LBc), np.where(fixed, UB, UBc))
    results = [
        MapResult(xs[i], float(fs[i]), int(its[i]))
        for i in range(xs.shape[0])
    ]
    return xs, results


class MapResult:
    """Duck-typed stand-in for scipy OptimizeResult (fields the library
    and its consumers read: x, fun, nit, success)."""

    def __init__(self, x, fun, nit):
        self.x = x
        self.fun = fun
        self.nit = nit
        self.success = bool(np.isfinite(fun))

    def __repr__(self):
        return (
            f"MapResult(fun={self.fun}, nit={self.nit}, "
            f"success={self.success})"
        )


def multistart_map(
    obj_raw,
    starts,
    LB,
    UB,
    f_args=(),
    tol=1e-5,
    max_iter=500,
    memory_size=10,
):
    """Minimize ``obj_raw(x, *f_args)`` from each row of ``starts``.

    Returns (xs (B, n), fs (B,), results list of MapResult).  ``obj_raw``
    must be a jittable, identity-stable callable (see
    core/nlml.get_fns) so repeated fits reuse the compiled program.
    """
    starts = np.atleast_2d(np.asarray(starts, dtype=np.float64))
    to_x, to_z, bp = _make_transform(LB, UB)
    packed = np.asarray(
        _run_multistart(
            obj_raw,
            to_x,
            to_z,
            starts,
            bp,
            np.float64(tol),
            int(max_iter),
            int(memory_size),
            tuple(f_args),
        )
    )
    xs, fs, its = packed[:, :-2], packed[:, -2], packed[:, -1]
    xs, results = _clamp_and_pack(xs, fs, its, LB, UB)
    return xs, fs, results
