"""Distributed EXACT GP: row-sharded kernel build, Cholesky, and serving.

Raises the exact-path memory ceiling with chips (SURVEY §2.3 tensor-
parallel row): every other exact-path program in this package replicates
the (N, N) kernel matrix per device, so multi-chip never raised the
exact N ceiling — only the matrix-free CG tier did.  This module shards
the SCALED kernel matrix ``B = I + sW K sW`` (the same well-conditioned
parametrization as the core, reference gaussian_process.py:2394-2399)
by BLOCK ROWS over a 1-D mesh and factors/solves it in place, so the
per-device footprint is N^2/P and a pod slice serves exact GPs that
cannot exist on one chip.

Why 1-D block rows and not a 2-D block-cyclic (ScaLAPACK) layout:

- At pod-slice scale (P <= 16) the panel broadcast volume is N^2 total
  either way to within ~sqrt(P); 1-D keeps the trailing update a LOCAL
  matmul with zero communication, which is what the MXU wants.
- The panel all_gather rides ICI and overlaps XLA's scheduling of the
  previous trailing GEMM; at the sizes where this path matters
  (N >= 32k) each step's GEMM is far larger than its gather.
- 1-D block rows is also exactly the layout of the sharded-CG tier
  (parallel/mesh.py), so X, y, and cross-kernels share one sharding.

Algorithm (right-looking blocked Cholesky over panels of width ``b``):
for each panel j: all_gather the current column block (Np, b); every
device redundantly factors the (b, b) diagonal block and solves the
panel (O(N b^2) — a few percent of total at b << N/P); each device then
updates only its own row slab with one (rows_local, b) x (b, Np) matmul
masked to the trailing columns.  The masked full-width update wastes
~2x the ideal N^3/3 flops but keeps every iteration ONE static shape —
the alternative (per-step trailing widths) is nb distinct remote
compiles (CLAUDE.md: minutes each at 16k+).

Forward/backward substitution run the same panel loop with one (b, k)
psum per step, so solves for alpha (k=1) and for predictive variance
columns (k=M) stay distributed end-to-end: L is NEVER gathered.

Scope: this is the large-N exact SERVING/evaluation tier (build ->
factor -> NLML -> predict).  Hyperparameter FITTING at these N is the
designated matrix-free CG tier (ops/iterative.py) — see the BASELINE.md
round-4 decision note.  Output warping is not supported here (huge-N
serving; use the replicated path).

Reference for semantics: gaussian_process.py:2357-2521 (__core_
computation) and :919-1022 (predict); the distribution strategy has no
reference counterpart.
"""

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.model import ModelSpec, cov_matrix, mean_value, noise_variance

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

_AXIS = "batch"
_LOG_2PI = math.log(2.0 * math.pi)


def _idx(*vs):
    """int32 start-index tuple (mixed python-int/traced-int32 starts
    are rejected by dynamic_slice under x64)."""
    return tuple(jnp.asarray(v, jnp.int32) for v in vs)


def plan(N: int, n_devices: int, b: int):
    """Padded size and per-device rows for a block-row layout.

    ``Np`` is the smallest multiple of ``n_devices * b`` >= N, so the
    panel width divides the per-device slab and every (b, b) diagonal
    block lives entirely on one device.
    """
    chunk = n_devices * b
    Np = -(-N // chunk) * chunk
    return Np, Np // n_devices, Np // b


def _block_owner_slice(arr, row0, rows_local, c0, b, width):
    """Extract global rows [c0, c0+b) of a row-sharded array via a
    clamped local slice + ownership mask + psum (blocks never straddle
    devices, see :func:`plan`)."""
    s_loc = jnp.clip(c0 - row0, 0, rows_local - b)
    owns = (c0 >= row0) & (c0 < row0 + rows_local)
    blk = jnp.where(
        owns, lax.dynamic_slice(arr, _idx(s_loc, 0), (b, width)), 0.0
    )
    return lax.psum(blk, _AXIS), s_loc, owns


def _dist_cholesky_inplace(slab, row0, rows_local, b, nb, Np):
    """Distributed in-place blocked Cholesky of a row-sharded SPD
    matrix.  Returns the slab holding lower-triangular L rows (strict
    upper part zeroed)."""
    row_global = row0 + jnp.arange(rows_local)
    colsN = jnp.arange(Np)[None, :]
    rowN = jnp.arange(Np)[:, None]

    def body(j, slab):
        c0 = j * b
        col_loc = lax.dynamic_slice(slab, _idx(0, c0), (rows_local, b))
        col_full = lax.all_gather(col_loc, _AXIS, axis=0, tiled=True)
        diag = lax.dynamic_slice(col_full, _idx(c0, 0), (b, b))
        Ljj = lax.linalg.cholesky(diag, symmetrize_input=False)
        # Redundant full-column panel solve: O(Np b^2) per step, a few
        # percent of the trailing GEMM at b << Np/P, and it removes a
        # second collective.
        T = solve_triangular(
            Ljj, jnp.swapaxes(col_full, 0, 1), lower=True
        )
        T = jnp.swapaxes(T, 0, 1)
        emb = lax.dynamic_update_slice(
            jnp.zeros((Np, b), dtype=slab.dtype), Ljj, _idx(c0, 0)
        )
        Lcol = jnp.where(
            rowN < c0, 0.0, jnp.where(rowN < c0 + b, emb, T)
        )
        Lcol_loc = lax.dynamic_slice(Lcol, _idx(row0, 0), (rows_local, b))
        upd = jnp.matmul(
            Lcol_loc,
            jnp.swapaxes(Lcol, 0, 1),
            precision=lax.Precision.HIGHEST,
        )
        slab = jnp.where(colsN >= c0 + b, slab - upd, slab)
        return lax.dynamic_update_slice(slab, Lcol_loc, _idx(0, c0))

    slab = lax.fori_loop(0, nb, body, slab)
    # Zero the strict upper triangle (stale partially-updated A values).
    return jnp.where(colsN <= row_global[:, None], slab, 0.0)


def _dist_cholesky_two_level(slab, row0, rows_local, b, Np, ndev):
    """Two-level distributed blocked Cholesky (opt-in, see
    :func:`dist_exact_fit` ``algorithm='two_level'``).

    The single-level loop's full-width masked trailing update costs
    ~Np^3/P flops per device (3x the ideal Np^3/(3P)).  Here the inner
    panel loop confines updates to one device-row WINDOW (width
    W = Np/P, a static shape), and after each window a strip loop
    applies its final L columns to the static trailing block — per
    device ~Np^3*(1/(2P) + 1/P^2) flops (1.87x ideal at P=8) and ~P x
    less where-mask write traffic.  Cost: ~2P compiled loop bodies
    instead of 1 (minutes of extra remote compile at 16k+ on the
    tunnel, seconds on CPU); identical result to rounding.
    """
    W = rows_local
    npan = W // b
    row_global = row0 + jnp.arange(rows_local)
    rowN = jnp.arange(Np)[:, None]

    for k in range(ndev):
        w0 = k * W
        wend = w0 + W
        colsW = w0 + jnp.arange(W)[None, :]

        def panel_body(j, slab, w0=w0, colsW=colsW, wend=wend):
            c0 = w0 + j * b
            col_loc = lax.dynamic_slice(
                slab, _idx(0, c0), (rows_local, b)
            )
            col_full = lax.all_gather(col_loc, _AXIS, axis=0, tiled=True)
            diag = lax.dynamic_slice(col_full, _idx(c0, 0), (b, b))
            Ljj = lax.linalg.cholesky(diag, symmetrize_input=False)
            T = solve_triangular(
                Ljj, jnp.swapaxes(col_full, 0, 1), lower=True
            )
            T = jnp.swapaxes(T, 0, 1)
            emb = lax.dynamic_update_slice(
                jnp.zeros((Np, b), dtype=slab.dtype), Ljj, _idx(c0, 0)
            )
            Lcol = jnp.where(
                rowN < c0, 0.0, jnp.where(rowN < c0 + b, emb, T)
            )
            Lcol_loc = lax.dynamic_slice(
                Lcol, _idx(row0, 0), (rows_local, b)
            )
            Lwin = lax.dynamic_slice(Lcol, _idx(w0, 0), (W, b))
            upd = jnp.matmul(
                Lcol_loc,
                jnp.swapaxes(Lwin, 0, 1),
                precision=lax.Precision.HIGHEST,
            )
            win = slab[:, w0:wend]
            win = jnp.where(colsW >= c0 + b, win - upd, win)
            slab = slab.at[:, w0:wend].set(win)
            return lax.dynamic_update_slice(slab, Lcol_loc, _idx(0, c0))

        slab = lax.fori_loop(0, npan, panel_body, slab)

        t0 = wend
        if t0 < Np:
            Tw = Np - t0

            def strip_body(s, slab, w0=w0, t0=t0, Tw=Tw):
                c0 = w0 + s * b
                cols_strip = c0 + jnp.arange(b)[None, :]
                Lcol_loc = lax.dynamic_slice(
                    slab, _idx(0, c0), (rows_local, b)
                )
                # Rows above the strip's diagonal hold stale
                # partially-updated A values (the strict upper
                # triangle is only zeroed at the very end).
                Lcol_loc = jnp.where(
                    row_global[:, None] >= cols_strip, Lcol_loc, 0.0
                )
                Lcol_full = lax.all_gather(
                    Lcol_loc, _AXIS, axis=0, tiled=True
                )
                Ltail = lax.dynamic_slice(
                    Lcol_full, _idx(t0, 0), (Tw, b)
                )
                upd = jnp.matmul(
                    Lcol_loc,
                    jnp.swapaxes(Ltail, 0, 1),
                    precision=lax.Precision.HIGHEST,
                )
                return slab.at[:, t0:].set(slab[:, t0:] - upd)

            slab = lax.fori_loop(0, npan, strip_body, slab)

    colsN = jnp.arange(Np)[None, :]
    return jnp.where(colsN <= row_global[:, None], slab, 0.0)


def _dist_solve_lower(slab, rhs_loc, row0, rows_local, b, nb):
    """Distributed forward substitution ``L z = rhs`` (all row-sharded).

    One (b, k) + (b, b) psum per panel; the per-device update is a local
    (rows_local, b) x (b, k) matmul.
    """
    row_global = row0 + jnp.arange(rows_local)
    k = rhs_loc.shape[1]

    def body(j, acc):
        c0 = j * b
        blk, s_loc, _ = _block_owner_slice(
            acc, row0, rows_local, c0, b, k
        )
        Ljj = _diag_block(slab, row0, rows_local, c0, b)
        zj = solve_triangular(Ljj, blk, lower=True)
        Lcolb = lax.dynamic_slice(slab, _idx(0, c0), (rows_local, b))
        below = (row_global >= c0 + b)[:, None]
        acc = acc - jnp.where(
            below,
            jnp.matmul(Lcolb, zj, precision=lax.Precision.HIGHEST),
            0.0,
        )
        inblk = ((row_global >= c0) & (row_global < c0 + b))[:, None]
        emb = lax.dynamic_update_slice(acc, zj, _idx(s_loc, 0))
        return jnp.where(inblk, emb, acc)

    return lax.fori_loop(0, nb, body, rhs_loc)


def _dist_solve_upper(slab, rhs_loc, row0, rows_local, b, nb):
    """Distributed backward substitution ``L^T x = rhs`` (row-sharded).

    Bottom-up panel loop; the cross-device reduction of
    ``sum_{i>j} L_ij^T x_i`` is one (b, k) psum per panel.
    """
    row_global = row0 + jnp.arange(rows_local)
    k = rhs_loc.shape[1]
    x0 = jnp.zeros_like(rhs_loc)

    def body(t, x):
        j = nb - 1 - t
        c0 = j * b
        Lcolb = lax.dynamic_slice(slab, _idx(0, c0), (rows_local, b))
        below = (row_global >= c0 + b)[:, None]
        contrib = jnp.matmul(
            jnp.swapaxes(jnp.where(below, Lcolb, 0.0), 0, 1),
            x,
            precision=lax.Precision.HIGHEST,
        )
        s = lax.psum(contrib, _AXIS)
        blk, s_loc, _ = _block_owner_slice(
            rhs_loc, row0, rows_local, c0, b, k
        )
        Ljj = _diag_block(slab, row0, rows_local, c0, b)
        xj = solve_triangular(Ljj, blk - s, lower=True, trans=1)
        inblk = ((row_global >= c0) & (row_global < c0 + b))[:, None]
        emb = lax.dynamic_update_slice(x, xj, _idx(s_loc, 0))
        return jnp.where(inblk, emb, x)

    return lax.fori_loop(0, nb, body, x0)


def _diag_block(slab, row0, rows_local, c0, b):
    s_loc = jnp.clip(c0 - row0, 0, rows_local - b)
    owns = (c0 >= row0) & (c0 < row0 + rows_local)
    blk = jnp.where(
        owns, lax.dynamic_slice(slab, _idx(s_loc, c0), (b, b)), 0.0
    )
    return lax.psum(blk, _AXIS)


def _scaled_model(spec, hyp, X, y, s2, n_real, Np):
    """Replicated (cheap, O(N)) model pieces: sW, scaled residual, mean,
    masks, and the real-row log-noise sum.  Padded rows get sW = 1 and
    zero residual so their B block is exactly the identity (zero logdet
    and quad contributions — same trick as core/nlml.py:87-108)."""
    dtype = X.dtype
    hyp = jnp.asarray(hyp).astype(dtype)
    hyp_cov, hyp_noise, hyp_mean = spec.split_hyp(hyp)
    mask = (jnp.arange(Np) < n_real).astype(dtype)
    sn2 = noise_variance(spec, hyp_noise, y, s2, dtype)
    sn2_vec = jnp.broadcast_to(jnp.reshape(sn2, (-1,)), (Np,))
    sn2_vec = jnp.where(mask > 0, sn2_vec, 1.0)
    sW = 1.0 / jnp.sqrt(sn2_vec)
    m = mean_value(spec, hyp_mean, X)[:, None]
    r = jnp.where(mask[:, None] > 0, y - m, 0.0)
    log_sn2_sum = jnp.sum(jnp.where(mask > 0, jnp.log(sn2_vec), 0.0))
    return hyp_cov, mask, sW, r, log_sn2_sum


@lru_cache(maxsize=None)
def _fit_fn(
    spec: ModelSpec,
    mesh: Mesh,
    Np: int,
    b: int,
    has_s2: bool,
    jitter: float = 0.0,
    algorithm: str = "masked_full",
):
    """Jitted distributed build + factor + alpha + NLML.

    Returns (L slab [sharded], alpha [sharded], sW [replicated],
    nlml [replicated]).  ``jitter`` is an optional constant added to
    the unit diagonal of B (B = I + sW K sW has eigenvalues >= 1 in
    exact arithmetic — K is PSD — so 0.0 is safe except for f32
    rounding at extreme N/conditioning; a failed factorization
    propagates NaN to nlml rather than escalating, matching
    nlz_design's single-attempt contract, core/nlml.py:137-163).
    """
    ndev = int(mesh.devices.size)
    rows_local = Np // ndev
    nb = Np // b

    def local(hyp, X, y, n_real, s2):
        idx = lax.axis_index(_AXIS)
        row0 = idx * rows_local
        hyp_cov, mask, sW, r, log_sn2_sum = _scaled_model(
            spec, hyp, X, y, s2, n_real, Np
        )
        X_loc = lax.dynamic_slice(X, _idx(row0, 0), (rows_local, X.shape[1]))
        mask_loc = lax.dynamic_slice(mask, _idx(row0), (rows_local,))
        sW_loc = lax.dynamic_slice(sW, _idx(row0), (rows_local,))
        K_loc = cov_matrix(spec, hyp_cov, X_loc, Z=X)
        B_loc = (
            sW_loc[:, None]
            * K_loc
            * sW[None, :]
            * (mask_loc[:, None] * mask[None, :])
        )
        row_global = row0 + jnp.arange(rows_local)
        eye_loc = (jnp.arange(Np)[None, :] == row_global[:, None]).astype(
            B_loc.dtype
        )
        # jitter only on REAL rows: the padded identity blocks must
        # stay exactly I (their log-diag contribution must be 0).
        slab = B_loc + (1.0 + jitter * mask_loc[:, None]) * eye_loc

        if algorithm == "two_level":
            slab = _dist_cholesky_two_level(
                slab, row0, rows_local, b, Np, ndev
            )
        else:
            slab = _dist_cholesky_inplace(
                slab, row0, rows_local, b, nb, Np
            )

        r_loc = lax.dynamic_slice(r, _idx(row0, 0), (rows_local, 1))
        rhs_loc = sW_loc[:, None] * r_loc
        z_loc = _dist_solve_lower(slab, rhs_loc, row0, rows_local, b, nb)
        x_loc = _dist_solve_upper(slab, z_loc, row0, rows_local, b, nb)
        alpha_loc = sW_loc[:, None] * x_loc

        quad = lax.psum(jnp.sum(z_loc * z_loc), _AXIS)
        diag_loc = jnp.take_along_axis(
            slab, row_global[:, None], axis=1
        )[:, 0]
        # Padded rows factor to 1 (identity block): log contribution 0.
        logdet_half = lax.psum(jnp.sum(jnp.log(diag_loc)), _AXIS)
        nlml = (
            0.5 * quad
            + logdet_half
            + 0.5 * log_sn2_sum
            + 0.5 * n_real.astype(slab.dtype) * _LOG_2PI
        )
        return slab, alpha_loc, sW, nlml

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, None), P(None, None), P(), P()),
        out_specs=(P(_AXIS, None), P(_AXIS, None), P(), P()),
    )

    def run(hyp, X, y, n_real, s2=None):
        return sharded(hyp, X, y, n_real, s2)

    repl = NamedSharding(mesh, P())
    shard2 = NamedSharding(mesh, P(_AXIS, None))
    if has_s2:
        return jax.jit(
            run,
            in_shardings=(repl, repl, repl, repl, repl),
            out_shardings=(shard2, shard2, repl, repl),
        )
    run1 = lambda hyp, X, y, n_real: run(hyp, X, y, n_real, None)
    return jax.jit(
        run1,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=(shard2, shard2, repl, repl),
    )


@lru_cache(maxsize=None)
def _predict_fn(spec: ModelSpec, mesh: Mesh, Np: int, b: int, M: int):
    """Jitted distributed predictive mean/variance at ``M`` (padded,
    replicated) test points against a row-sharded factor.

    mu = m* + Ks^T alpha (one (M,) psum); s2 = k** - ||L^{-1} sW Ks||^2
    via the distributed forward solve with k = M columns — L stays
    sharded, nothing N-sized is gathered.
    """
    ndev = int(mesh.devices.size)
    rows_local = Np // ndev
    nb = Np // b

    def local(slab, alpha_loc, sW, hyp, X, n_real, xs):
        idx = lax.axis_index(_AXIS)
        row0 = idx * rows_local
        dtype = X.dtype
        hyp = jnp.asarray(hyp).astype(dtype)
        hyp_cov, _, hyp_mean = spec.split_hyp(hyp)
        mask = (jnp.arange(Np) < n_real).astype(dtype)
        X_loc = lax.dynamic_slice(X, _idx(row0, 0), (rows_local, X.shape[1]))
        mask_loc = lax.dynamic_slice(mask, _idx(row0), (rows_local,))
        sW_loc = lax.dynamic_slice(sW, _idx(row0), (rows_local,))
        Ks_loc = (
            cov_matrix(spec, hyp_cov, X_loc, Z=xs) * mask_loc[:, None]
        )
        m_star = mean_value(spec, hyp_mean, xs)
        kss = cov_matrix(spec, hyp_cov, xs, diag=True)
        mu = m_star + lax.psum(
            jnp.matmul(
                jnp.swapaxes(Ks_loc, 0, 1),
                alpha_loc,
                precision=lax.Precision.HIGHEST,
            )[:, 0],
            _AXIS,
        )
        V_loc = _dist_solve_lower(
            slab, sW_loc[:, None] * Ks_loc, row0, rows_local, b, nb
        )
        s2 = kss - lax.psum(jnp.sum(V_loc * V_loc, axis=0), _AXIS)
        return mu, s2

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(_AXIS, None),
            P(_AXIS, None),
            P(),
            P(),
            P(None, None),
            P(),
            P(None, None),
        ),
        out_specs=(P(), P()),
    )
    repl = NamedSharding(mesh, P())
    shard2 = NamedSharding(mesh, P(_AXIS, None))
    return jax.jit(
        sharded,
        in_shardings=(shard2, shard2, repl, repl, repl, repl, repl),
        out_shardings=(repl, repl),
    )


class DistExactPosterior:
    """Device-resident row-sharded exact posterior (L slab + alpha).

    Produced by :func:`dist_exact_fit`; consumed by
    :func:`dist_exact_predict`.  ``nlml`` is the exact negative log
    marginal likelihood (matches core ``nlz`` to factorization rounding).
    """

    def __init__(self, spec, mesh, b, Np, n_real, hyp, X_pad, slab,
                 alpha, sW, nlml):
        self.spec = spec
        self.mesh = mesh
        self.b = b
        self.Np = Np
        self.n_real = n_real
        self.hyp = hyp
        self._X_pad = X_pad  # host copy, padded (Np, D)
        self.slab = slab  # sharded (Np, Np) lower Cholesky of B
        self.alpha = alpha  # sharded (Np, 1)
        self.sW = sW
        self.nlml = nlml


def _pad_rows(A, Np, fill_row=None):
    A = np.asarray(A)
    if A.shape[0] == Np:
        return A
    pad = np.tile(
        A[-1:] if fill_row is None else fill_row, (Np - A.shape[0], 1)
    )
    return np.concatenate([A, pad.astype(A.dtype)])


def dist_exact_fit(spec: ModelSpec, mesh: Mesh, hyp, X, y, s2=None,
                   b: int = 512, jitter: float = 0.0,
                   algorithm: str = "masked_full"):
    """Build + factor the scaled kernel matrix row-sharded over ``mesh``
    and return a :class:`DistExactPosterior` (with exact ``nlml``).

    N is padded to a multiple of ``n_devices * b`` with inert identity
    rows (exact — see ``_scaled_model``).  Per-device HBM: one
    (N/P, N) slab plus one (N, b) gathered panel.  ``jitter`` (optional
    diagonal stabilizer, see :func:`_fit_fn`) defaults to 0 — B's
    eigenvalues are >= 1 by construction.  ``algorithm``:
    'masked_full' (default; one compiled loop body, full-width masked
    trailing updates, ~3x ideal flops) or 'two_level' (window+strip
    loops, ~1.9x ideal flops at P=8, ~2P compiled bodies — see
    :func:`_dist_cholesky_two_level`).
    """
    if spec.outwarp is not None:
        raise ValueError(
            "The distributed exact tier does not support output "
            "warping; use the replicated path (core/nlml) for warped "
            "models."
        )
    X = np.asarray(X)
    y = np.asarray(y)
    N = X.shape[0]
    ndev = int(mesh.devices.size)
    b = min(b, max(32, N // ndev))
    Np, rows_local, _ = plan(N, ndev, b)
    Xp = _pad_rows(X, Np)
    yp = _pad_rows(y, Np, fill_row=np.zeros((1, y.shape[1])))
    if algorithm not in ("masked_full", "two_level"):
        raise ValueError(f"Unknown algorithm {algorithm!r}")
    fn = _fit_fn(
        spec, mesh, Np, b, s2 is not None, float(jitter), algorithm
    )
    args = [np.asarray(hyp), Xp, yp, np.int32(N)]
    if s2 is not None:
        args.append(_pad_rows(s2, Np, fill_row=np.ones((1, 1))))
    slab, alpha, sW, nlml = fn(*args)
    return DistExactPosterior(
        spec, mesh, b, Np, N, np.asarray(hyp), Xp, slab, alpha, sW, nlml
    )


def dist_exact_nlml(spec: ModelSpec, mesh: Mesh, hyp, X, y, s2=None,
                    b: int = 512, jitter: float = 0.0):
    """Exact NLML with the kernel matrix sharded over the mesh."""
    return float(
        dist_exact_fit(spec, mesh, hyp, X, y, s2, b, jitter).nlml
    )


def dist_exact_predict(post: DistExactPosterior, xs, chunk: int = 1024):
    """Latent predictive mean/variance at ``xs`` against a row-sharded
    factor (semantics of gp._compute_mu_s2 with the L_chol
    parametrization, reference gaussian_process.py:971-1011).

    Test points are processed in padded chunks of ``chunk`` (replicated
    — the N-sized axes stay sharded) so one compiled program serves any
    M.
    """
    xs = np.atleast_2d(np.asarray(xs))
    M = xs.shape[0]
    chunk = min(chunk, -(-M // 64) * 64)
    fn = _predict_fn(post.spec, post.mesh, post.Np, post.b, chunk)
    mus, s2s = [], []
    for i in range(0, M, chunk):
        xs_i = xs[i : i + chunk]
        pad = chunk - xs_i.shape[0]
        if pad:
            xs_i = np.concatenate([xs_i, np.tile(xs_i[-1:], (pad, 1))])
        mu, s2 = fn(
            post.slab,
            post.alpha,
            post.sW,
            post.hyp,
            post._X_pad,
            np.int32(post.n_real),
            xs_i,
        )
        mus.append(np.asarray(mu))
        s2s.append(np.asarray(s2))
    mu = np.concatenate(mus)[:M]
    # Clamp like GP.predict (gp.py) / reference gaussian_process.py:1770:
    # at f32 kss - sum(V*V) rounds to tiny negatives near training data.
    s2 = np.maximum(np.concatenate(s2s)[:M], 0.0)
    return mu, s2
