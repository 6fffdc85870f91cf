"""Linear-algebra primitives for the exact-GP core.

The centerpiece is :func:`jittered_cholesky`, a custom-VJP primitive that
reproduces the reference's Cholesky jitter-escalation retry loop
(reference gaussian_process.py:2413-2421, 2430-2438: up to 10 attempts,
noise multiplier x10 per failed attempt) *inside* jit.  XLA's Cholesky
emits NaNs instead of raising on an indefinite matrix, which lets the
retry run as a masked ``lax.while_loop``.  The custom VJP treats the found
multiplier as a constant — exactly the semantics of the reference's
hand-derived gradients, which are evaluated at the successful multiplier —
and costs a single Cholesky per NLML evaluation in the common case.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from .._config import CHOL_MAX_TRIES


def blocked_cholesky(G, block: int = 1024, rhs_chunk: int = 4096):
    """Right-looking blocked Cholesky with matmul trailing updates.

    XLA's native TPU Cholesky runs at only a few TFLOP/s (sequential
    panel algorithm); restructuring so the O(N^3) bulk lands in dense
    ``L_panel @ L_panel^T`` trailing updates moves it onto the MXU.  The
    per-block work is a ``block``-sized native Cholesky plus a
    ``block``-row triangular solve whose right-hand side is chunked to
    ``rhs_chunk`` columns (XLA trsm materializes ~n_row_blocks x rows x
    rhs_width temps — see :func:`neg_inverse_from_chol`).

    An indefinite input surfaces exactly like ``jnp.linalg.cholesky``:
    the failing diagonal block's NaNs propagate through every later
    panel, so ``jnp.any(jnp.isnan(L))`` detection keeps working.
    Supports leading batch dimensions; static shapes (the block loop is
    unrolled at trace time).
    """
    N = G.shape[-1]
    if N <= block:
        return jnp.linalg.cholesky(G)
    hi = lax.Precision.HIGHEST
    cols = []
    A = G
    off = 0
    while off < N:
        b = min(block, N - off)
        Ljj = jnp.linalg.cholesky(A[..., :b, :b])
        rest = A.shape[-1] - b
        if rest == 0:
            cols.append(Ljj)
            break
        ApjT = jnp.swapaxes(A[..., b:, :b], -1, -2)
        if rest > rhs_chunk:
            parts = [
                solve_triangular(
                    Ljj, ApjT[..., :, c : c + rhs_chunk], lower=True
                )
                for c in range(0, rest, rhs_chunk)
            ]
            LpjT = jnp.concatenate(parts, axis=-1)
        else:
            LpjT = solve_triangular(Ljj, ApjT, lower=True)
        Lpj = jnp.swapaxes(LpjT, -1, -2)
        A = A[..., b:, b:] - jnp.matmul(Lpj, LpjT, precision=hi)
        cols.append(jnp.concatenate([Ljj, Lpj], axis=-2))
        off += b
    out, off = [], 0
    for col in cols:
        pad = jnp.zeros(
            G.shape[:-2] + (off, col.shape[-1]), dtype=G.dtype
        )
        out.append(jnp.concatenate([pad, col], axis=-2))
        off += col.shape[-1]
    return jnp.concatenate(out, axis=-1)


def recursive_cholesky(G, base: int = 1024, precision=None):
    """Recursive Cholesky with ALL panel solves as MXU matmuls.

    The right-looking :func:`blocked_cholesky` still pays one wide XLA
    triangular solve per panel — the slowest primitive on this chip.
    Here the 2x2 recursion

        chol([[A, B^T], [B, C]]) = [[L11, 0], [L21, L22]]
        L11 = chol(A);  L21 = B @ tri_inv(L11)^T
        L22 = chol(C - L21 @ L21^T)

    replaces every solve with an explicit half-size triangular inversion
    (:func:`tri_inv`, itself divide-and-conquer matmuls) and two dense
    matmuls, so the only sequential work left is the ``base``-sized
    native Cholesky leaves.  Extra flops vs the textbook algorithm are
    ~N^3/6 for the inversions — cheap at MXU speed vs trsm speed.

    NaN propagation matches ``jnp.linalg.cholesky``: an indefinite leaf
    poisons every later block, so the jitter-escalation NaN detection
    keeps working.  Supports leading batch dims; static shapes.
    """
    N = G.shape[-1]
    if N <= base:
        return lax.linalg.cholesky(G, symmetrize_input=False)
    hi = precision if precision is not None else lax.Precision.HIGHEST
    # Lane-aligned split (multiples of 128 keep every matmul on full
    # MXU tiles; N is a power-of-two bucket in practice).
    h = max(128, ((N // 2) + 127) // 128 * 128)
    L11 = recursive_cholesky(G[..., :h, :h], base, precision)
    W = tri_inv(L11, block=min(base, 256), precision=precision)
    L21 = jnp.matmul(
        G[..., h:, :h], jnp.swapaxes(W, -1, -2), precision=hi
    )
    S = G[..., h:, h:] - jnp.matmul(
        L21, jnp.swapaxes(L21, -1, -2), precision=hi
    )
    L22 = recursive_cholesky(S, base, precision)
    z = jnp.zeros(G.shape[:-2] + (h, N - h), dtype=G.dtype)
    return jnp.concatenate(
        [
            jnp.concatenate([L11, z], axis=-1),
            jnp.concatenate([L21, L22], axis=-1),
        ],
        axis=-2,
    )


def _chol_of(K, sn2_vec, mult):
    """Lower Cholesky factor of G(mult) = K + mult * diag(sn2).

    Measured (v5e, N=4096, B=8 vmap): :func:`blocked_cholesky` here is
    ~40% SLOWER than XLA's native batched Cholesky on the forward-only
    NLML (6.0 vs 4.3 ms/eval) and neutral inside value_and_grad, so the
    native factorization stays; the blocked variant remains available
    for explicit use.
    """
    N = K.shape[-1]
    G = K + mult * sn2_vec * jnp.eye(N, dtype=K.dtype)
    # G is symmetric by construction (cov_matrix emits both triangles);
    # skipping XLA's defensive symmetrization saves an N^2 pass per
    # factorization attempt.
    return lax.linalg.cholesky(G, symmetrize_input=False)


@jax.custom_vjp
def jittered_cholesky(K, sn2_vec):
    """Factorize ``G(m) = K + m*diag(sn2)`` for the smallest working m.

    m runs over {1, 10, ..., 10**9} (CHOL_MAX_TRIES attempts).  Returns
    ``(L, m)`` with ``L`` the *lower* Cholesky factor of G(m).  If every
    attempt fails, L is all-NaN (callers detect and treat as +inf
    objective, or raise on the host — reference raises LinAlgError,
    gaussian_process.py:2450-2453).

    Differentiable in K and sn2_vec (m is treated as a constant).
    Safe under vmap: the escalation loop is masked per-sample.
    """
    # One shared escalation-loop implementation (also the primal of the
    # fused quad_logdet): the two paths' mult/factor semantics MUST
    # agree for the stored posterior factors to match the objective.
    return _jittered_chol_impl(K, sn2_vec)


def tri_inv(L, block: int = 256, precision=None):
    """Inverse of a lower-triangular matrix via divide-and-conquer matmuls.

    TPU rationale: ``triangular_solve`` with an N-wide right-hand side is
    the slowest XLA primitive on this chip (sequential row-block
    substitution, huge HLO temps — see :func:`neg_inverse_from_chol`),
    while dense matmuls run at MXU speed.  The 2x2 block identity

        inv([[A, 0], [B, C]]) = [[inv(A), 0], [-inv(C) B inv(A), inv(C)]]

    turns the O(N^3/3) inversion into log2(N/block) levels of dense
    matmuls plus ``block``-sized base-case solves.  Supports arbitrary
    leading batch dimensions and odd sizes (uneven splits).
    """
    N = L.shape[-1]
    if N <= block:
        eye = jnp.eye(N, dtype=L.dtype)
        if L.ndim > 2:
            eye = jnp.broadcast_to(eye, L.shape)
        return solve_triangular(L, eye, lower=True)
    h = N // 2
    Ai = tri_inv(L[..., :h, :h], block, precision)
    Ci = tri_inv(L[..., h:, h:], block, precision)
    hi = precision if precision is not None else lax.Precision.HIGHEST
    Bi = -jnp.matmul(
        Ci, jnp.matmul(L[..., h:, :h], Ai, precision=hi), precision=hi
    )
    z = jnp.zeros(L.shape[:-2] + (h, N - h), dtype=L.dtype)
    return jnp.concatenate(
        [
            jnp.concatenate([Ai, z], axis=-1),
            jnp.concatenate([Bi, Ci], axis=-1),
        ],
        axis=-2,
    )


def tri_inv_doubling(L, base: int = 256, precision=None):
    """:func:`tri_inv` restructured as recursive DOUBLING: one batched
    op per level instead of an unrolled tree of sibling ops.

    The divide-and-conquer recursion of :func:`tri_inv` lowers to
    2^k separate HLO matmuls/solves at depth k — at N=4096/block=1024
    that is 4 base trsms and 6 off-diagonal matmuls dispatched
    SEQUENTIALLY, each too small to fill the MXU.  Here every level's
    independent sibling blocks run as ONE batched op:

      level 0:  all N/base diagonal base blocks -> one batched trsm
      level k:  all sibling pairs merge via  Bi = -W1 (L21 W0)
                -> two batched (m, m) matmuls over N/(2m) lanes

    so the op count is 1 + 2*log2(N/base) regardless of N, and every
    matmul is a large batch.  Requires N = base * 2^j (the padded
    buckets are powers of two); other shapes fall back to
    :func:`tri_inv`.  Exact same arithmetic as tri_inv up to matmul
    reassociation.
    """
    N = L.shape[-1]
    nb = N // base
    if N <= base or N % base or (nb & (nb - 1)):
        return tri_inv(L, block=base, precision=precision)
    hi = precision if precision is not None else lax.Precision.HIGHEST
    batch = L.shape[:-2]

    def _diag_blocks(m, lower_left=False):
        """All (m, m) diagonal blocks of L as (..., N/m, m, m) — or,
        with ``lower_left``, the (m, m) lower-left quadrant of every
        (2m, 2m) diagonal block (the L21 merge operands)."""
        k = N // m
        L5 = L.reshape(batch + (k, m, k, m))
        if lower_left:
            # Pair rows (2i+1) with columns (2i): sub-diagonal of the
            # (k, k) block grid restricted to odd-row/even-col.
            L5 = L5[..., 1::2, :, ::2, :]
        d = jnp.diagonal(L5, axis1=-4, axis2=-2)
        return jnp.moveaxis(d, -1, -3)

    D = _diag_blocks(base)
    eye = jnp.broadcast_to(jnp.eye(base, dtype=L.dtype), D.shape)
    W = solve_triangular(D, eye, lower=True)
    m = base
    while m < N:
        k2 = N // (2 * m)
        Wp = W.reshape(batch + (k2, 2, m, m))
        W0 = Wp[..., 0, :, :]
        W1 = Wp[..., 1, :, :]
        L21 = _diag_blocks(m, lower_left=True)
        Bi = -jnp.matmul(
            W1, jnp.matmul(L21, W0, precision=hi), precision=hi
        )
        Z = jnp.zeros_like(Bi)
        W = jnp.concatenate(
            [
                jnp.concatenate([W0, Z], axis=-1),
                jnp.concatenate([Bi, W1], axis=-1),
            ],
            axis=-2,
        )
        m *= 2
    return W.reshape(batch + (N, N))


def tri_inv_gram(L, block: int = 1024, precision=None, doubling=True):
    """``G^{-1} = L^{-T} L^{-1}`` directly from the lower factor, with
    the top level of the inversion FUSED into the Gram product.

    The composed pipeline (``sym_tri_product(tri_inv(L))``) materializes
    the full W = L^{-1} (a concatenate write + re-read of the (N, N)
    array) only to square it.  One level of the inverse's 2x2 block
    identity applied to the Gram instead gives

        W = [[Wa, 0], [Bi, Wc]],   Bi = -Wc (L21 Wa)
        W^T W = [[Wa^T Wa + Bi^T Bi,  Bi^T Wc],
                 [   (Bi^T Wc)^T,     Wc^T Wc ]]

    so only the half-size inverses Wa/Wc and Bi are ever materialized,
    the diagonal Gram blocks are half-size triangular-aware products,
    and the full-size W round-trip through HBM disappears.  Used by the
    fused NLML adjoint (:func:`quad_logdet`), where G^{-1} is the
    dominant backward cost (VERDICT r4 #3).  ``doubling`` selects
    :func:`tri_inv_doubling` for the half inverses.
    """
    N = L.shape[-1]
    inv = tri_inv_doubling if doubling else tri_inv
    inv_block = min(block, 256) if doubling else block
    if N <= 2 * block:
        W = inv(L, inv_block, precision)
        return sym_tri_product(W, block, precision)
    hi = precision if precision is not None else lax.Precision.HIGHEST
    h = max(128, ((N // 2) + 127) // 128 * 128)
    Wa = inv(L[..., :h, :h], inv_block, precision)
    Wc = inv(L[..., h:, h:], inv_block, precision)
    Bi = -jnp.matmul(
        Wc,
        jnp.matmul(L[..., h:, :h], Wa, precision=hi),
        precision=hi,
    )
    BiT = jnp.swapaxes(Bi, -1, -2)
    Gtl = sym_tri_product(Wa, block, precision) + jnp.matmul(
        BiT, Bi, precision=hi
    )
    Gtr = jnp.matmul(BiT, Wc, precision=hi)
    Gbr = sym_tri_product(Wc, block, precision)
    return jnp.concatenate(
        [
            jnp.concatenate([Gtl, Gtr], axis=-1),
            jnp.concatenate([jnp.swapaxes(Gtr, -1, -2), Gbr], axis=-1),
        ],
        axis=-2,
    )


def sym_tri_product(W, block: int = 1024, precision=None):
    """``W^T W`` for a LOWER-triangular ``W``, exploiting the zeros.

    A dense product spends 2N^3 flops; because column-block i of W is
    zero above row i*block, block-row strip i of the result is
    ``W[i*b:, i*b:(i+1)*b]^T @ W[i*b:, :(i+1)*b]`` — one matmul per
    block row, ~2N^3/3 flops total.  The strips fill the lower block
    triangle (with full diagonal blocks); the upper triangle is
    recovered by symmetry.  Supports leading batch dims; used by the
    fused NLML VJP where this product is the dominant cost.
    """
    if precision is None:
        precision = lax.Precision.HIGHEST
    N = W.shape[-1]
    if N <= block:
        WT = jnp.swapaxes(W, -1, -2)
        return jnp.matmul(WT, W, precision=precision)
    strips = []
    off = 0
    while off < N:
        b = min(block, N - off)
        colT = jnp.swapaxes(W[..., off:, off : off + b], -1, -2)
        strip = jnp.matmul(
            colT, W[..., off:, : off + b], precision=precision
        )
        pad = jnp.zeros(W.shape[:-2] + (b, N - off - b), dtype=W.dtype)
        strips.append(jnp.concatenate([strip, pad], axis=-1))
        off += b
    C_low = jnp.concatenate(strips, axis=-2)
    # Strips hold the full (symmetric) diagonal blocks, so adding the
    # transpose double-counts exactly the block-diagonal: subtract it.
    idx = jnp.arange(N) // block
    on_blkdiag = idx[:, None] == idx[None, :]
    return (
        C_low
        + jnp.swapaxes(C_low, -1, -2)
        - jnp.where(on_blkdiag, C_low, jnp.zeros((), dtype=W.dtype))
    )


def tri_lower_matmul(Wl, B, block: int = 2048, precision=None):
    """``Wl @ B`` for a LOWER-triangular ``Wl``, exploiting the zeros.

    Row-block strip i of the result only reads the first (i+1) column
    blocks of ``Wl``: one matmul per block row, ~N^2·M flops instead of
    the dense 2·N^2·M.  Unrolled (N/block static matmuls of distinct
    shapes — cheap to compile at the serving sizes this targets).
    Used by the MXU serving path (gp._predict_chunked_fn) where this
    product replaces XLA's trsm.
    """
    if precision is None:
        precision = lax.Precision.HIGH  # bf16x3: near-f32, ~2x HIGHEST
    N = Wl.shape[-1]
    if N <= block:
        return jnp.matmul(Wl, B, precision=precision)
    strips = []
    off = 0
    while off < N:
        b = min(block, N - off)
        strips.append(
            jnp.matmul(
                Wl[..., off : off + b, : off + b],
                B[..., : off + b, :],
                precision=precision,
            )
        )
        off += b
    return jnp.concatenate(strips, axis=-2)


# Past this size the matmul-path VJP is worth its extra f32 rounding on
# TPU; below it (and always in f64, the parity dtype) the two-trsm
# adjoint is used.
_VJP_MATMUL_MIN_N = 1024

# G^{-1} evaluation strategy inside the f32 matmul-path NLML adjoint
# (benchmarks/adjoint_bench.py measures all of them on the chip):
#   auto       — shape-dispatched default (see _ginv_from_chol_f32)
#   compose    — tri_inv then sym_tri_product (the round-3 pipeline)
#   gram       — tri_inv_gram w/ doubling half-inverses
#   gram_nodbl — tri_inv_gram w/ recursive half-inverses
#   dense      — tri_inv_doubling + one dense W^T W matmul
# Read at TRACE time: flip before building a fresh jitted program.
_GINV_MODE = "auto"


def _ginv_from_chol_f32(L):
    """Explicit G^{-1} from the lower factor on the f32 matmul path,
    dispatching on :data:`_GINV_MODE` (see benchmarks/adjoint_bench.py
    for the measured comparison).

    ``auto`` dispatches on the trace-time matrix size, per the v5e
    measurements (2026-08-19): the fused-top-level Gram saves the
    full-size W = L^{-1} HBM round-trip and wins at the headline shape
    (B=8, N=4096: 28.4 vs 30.1 ms, +2.2% end-to-end NLML+grad), while
    the flat composed pipeline wins at N=16384 (109.8 vs 129.3 ms —
    the half-inverse recursion's small deep-level matmuls underuse the
    MXU at large N)."""
    p = lax.Precision.HIGH
    mode = _GINV_MODE
    if mode == "auto":
        mode = "gram_nodbl" if L.shape[-1] <= 4096 else "compose"
    if mode == "gram":
        return tri_inv_gram(L, block=1024, precision=p)
    if mode == "gram_nodbl":
        return tri_inv_gram(L, block=1024, precision=p, doubling=False)
    if mode == "dense":
        W = tri_inv_doubling(L, base=256, precision=p)
        return jnp.matmul(jnp.swapaxes(W, -1, -2), W, precision=p)
    W = tri_inv(L, block=1024, precision=p)
    return sym_tri_product(W, block=1024, precision=p)


def _cholesky_vjp_core(L, L_bar):
    """Reverse-mode adjoint of A -> L = cholesky(A) (lower).

    A_bar = L^{-T} Phi(L^T L_bar) L^{-1}, symmetrized, where Phi takes the
    lower triangle with the diagonal halved.

    Two equivalent evaluation strategies:
    - f64 / small N: two N-wide triangular solves (best accuracy; f64 is
      the reference-parity dtype and runs on CPU anyway).
    - f32 at N >= 1024 (the TPU fit hot path): explicit L^{-1} via
      :func:`tri_inv` and two dense matmuls — ~4x faster end-to-end on
      v5e, where a wide trsm runs an order of magnitude below the MXU.
    """
    hi = lax.Precision.HIGHEST
    P = jnp.tril(jnp.matmul(L.T, L_bar, precision=hi))
    P = P - 0.5 * jnp.diag(jnp.diag(P))
    if L.dtype == jnp.float32 and L.shape[-1] >= _VJP_MATMUL_MIN_N:
        W = tri_inv(L)
        A_bar = jnp.matmul(
            W.T, jnp.matmul(P, W, precision=hi), precision=hi
        )
    else:
        # X = L^{-T} P
        X = solve_triangular(L, P, lower=True, trans=1)
        # A_bar_raw = X L^{-1} = (L^{-T} X^T)^T
        A_bar = solve_triangular(L, X.T, lower=True, trans=1).T
    return 0.5 * (A_bar + A_bar.T)


def _jittered_cholesky_fwd(K, sn2_vec):
    L, mult = jittered_cholesky(K, sn2_vec)
    return (L, mult), (L, mult)


def _jittered_cholesky_bwd(res, cotangents):
    L, mult = res
    L_bar, _mult_bar = cotangents  # mult is piecewise constant: no gradient
    # Replace NaN cotangent/factor combinations gracefully: if the factor
    # itself is NaN (total failure) the gradient is NaN anyway.
    A_bar = _cholesky_vjp_core(L, L_bar)
    K_bar = A_bar
    sn2_bar = mult * jnp.diag(A_bar)
    return K_bar, sn2_bar


jittered_cholesky.defvjp(_jittered_cholesky_fwd, _jittered_cholesky_bwd)


def chol_solve(L, b):
    """Solve (L L^T) x = b given a lower Cholesky factor."""
    return solve_triangular(
        L, solve_triangular(L, b, lower=True, trans=0), lower=True, trans=1
    )


def _jittered_chol_impl(K, sn2_vec):
    """The raw escalation logic of :func:`jittered_cholesky` (no VJP).

    Attempt 0 (mult=1) runs OUTSIDE the retry loop: with well-conditioned
    inputs (the common case — and guaranteed above the f32 noise floor)
    the factorization succeeds first try, and the while_loop scaffolding
    alone measured +9.5% per chain eval at N=16384 (the NaN-init of a
    1 GB carry plus the first iteration's carry round-trip,
    benchmarks/chain_eval_profile.py).  The escalation loop — identical
    attempt count and multipliers {10, ..., 10^(CHOL_MAX_TRIES-1)} — is
    entered through ``lax.cond`` only when attempt 0 produced NaNs; under
    vmap the cond lowers to a select whose retry branch runs zero loop
    iterations when every lane is finite.
    """
    L0 = _chol_of(K, sn2_vec, jnp.asarray(1.0, dtype=K.dtype))
    ok = jnp.logical_not(jnp.any(jnp.isnan(L0)))

    def _first(L_first):
        return L_first, jnp.asarray(1.0, dtype=K.dtype)

    def _retry(L_first):
        def cond(carry):
            mult, L, i = carry
            return jnp.logical_and(
                jnp.any(jnp.isnan(L)), i < CHOL_MAX_TRIES
            )

        def body(carry):
            mult, L, i = carry
            mult_new = mult * 10.0
            L_new = _chol_of(K, sn2_vec, mult_new)
            return mult_new, L_new, i + 1

        mult, L, _ = lax.while_loop(
            cond,
            body,
            (
                jnp.asarray(1.0, dtype=K.dtype),
                L_first,
                jnp.asarray(1, dtype=jnp.int32),
            ),
        )
        return L, mult

    return lax.cond(ok, _first, _retry, L0)


@jax.custom_vjp
def quad_logdet(K, sn2_vec, r):
    """Fused hot path of the NLML: factor G = K + mult*diag(sn2) with
    jitter escalation, and return

        (quad, halflogdet, mult) = (r^T G^{-1} r, sum(log diag L), mult).

    The custom VJP uses the analytic cotangent

        G_bar = 0.5 * h_bar * G^{-1} - q_bar * alpha alpha^T

    (alpha = G^{-1} r), which needs ONE explicit G^{-1} instead of the
    generic Cholesky-adjoint chain (a dense L^T L_bar product plus two
    N-wide triangular solves).  On TPU f32 at N >= 1024, G^{-1} = W^T W
    with W = tri_inv(L) runs entirely on the MXU; this is what makes
    ``value_and_grad`` of the NLML matmul-bound instead of trsm-bound.
    The reference's hand-derived gradients use the same explicit
    Q = G^{-1} - alpha alpha^T (gaussian_process.py:2477-2484), so the
    f64 parity path (chunked trsm inverse) matches it bit-for-bit in
    structure.  ``mult`` is piecewise constant: no gradient.
    """
    L, mult = _jittered_chol_impl(K, sn2_vec)
    alpha = chol_solve(L, r)
    quad = jnp.sum(r * alpha)
    halflogdet = jnp.sum(jnp.log(jnp.diag(L)))
    return quad, halflogdet, mult


def _quad_logdet_fwd(K, sn2_vec, r):
    L, mult = _jittered_chol_impl(K, sn2_vec)
    alpha = chol_solve(L, r)
    quad = jnp.sum(r * alpha)
    halflogdet = jnp.sum(jnp.log(jnp.diag(L)))
    return (quad, halflogdet, mult), (L, mult, alpha)


def _quad_logdet_bwd(res, cotangents):
    L, mult, alpha = res
    q_bar, h_bar, _ = cotangents
    N = L.shape[-1]
    if L.dtype == jnp.float32 and N >= _VJP_MATMUL_MIN_N:
        # Measured on v5e at N=4096 (B=8 batch): base block 1024 with
        # bf16x3 (HIGH) accumulation throughout is the throughput sweet
        # spot (92 vs 55 evals/s for 256/HIGHEST end-to-end) and the
        # gradient error it adds (~1e-6 relative) is far below f32 fit
        # tolerance.  Strategy selected by _GINV_MODE (adjoint_bench.py).
        G_inv = _ginv_from_chol_f32(L)
    else:
        # Chunked inverse (max_rhs-bounded): a single N-wide solve at
        # large N materializes huge XLA trsm temps — see
        # neg_inverse_from_chol, which implements exactly this inverse.
        G_inv = -neg_inverse_from_chol(L)
    G_bar = (0.5 * h_bar) * G_inv - q_bar * (alpha * alpha.T)
    # G = K + mult * diag(sn2): dG/dK = I, dG/dsn2_i = mult e_i e_i^T.
    K_bar = G_bar
    sn2_bar = mult * jnp.diag(G_bar)
    r_bar = (2.0 * q_bar) * alpha
    return K_bar, sn2_bar, r_bar


quad_logdet.defvjp(_quad_logdet_fwd, _quad_logdet_bwd)


@partial(jax.jit, static_argnames=("max_rhs",))
def neg_inverse_from_chol(L, max_rhs: int = 512):
    """-(L L^T)^{-1} from a lower Cholesky factor.

    Used for the reference's low-noise explicit-inverse parametrization
    (gaussian_process.py:2440-2448) and the fast_predict path.

    The solve runs over COLUMN CHUNKS of the identity, written in place
    into one output buffer inside a fori_loop: XLA's blocked triangular
    solve materializes one live update slice per ROW block of the solve
    (~n_row_blocks * N * rhs_width elements), so a single (N, N) solve at
    N=16k wants ~59 GB of HLO temps and even a 2048-wide chunk ~7 GB;
    512-wide chunks keep the live set under ~2 GB on top of L + out.
    """
    N = L.shape[-1]
    if L.dtype == jnp.float32 and N >= _VJP_MATMUL_MIN_N:
        # Matmul path: -(L L^T)^{-1} = -W^T W with W = L^{-1}.  The result
        # is an explicit inverse either way (conditioning class unchanged),
        # and tri_inv + the triangular-aware product run at MXU speed
        # instead of trsm speed.
        W = tri_inv(L, block=1024)
        return -sym_tri_product(W, block=1024)
    if N <= max_rhs:
        eye = jnp.eye(N, dtype=L.dtype)
        return -chol_solve(L, eye)
    n_chunks = -(-N // max_rhs)
    rows = jnp.arange(N, dtype=jnp.int32)[:, None]

    def body(i, out):
        start = i * max_rhs
        cols = start + jnp.arange(max_rhs, dtype=jnp.int32)[None, :]
        eye_block = (rows == cols).astype(L.dtype)
        blk = -chol_solve(L, eye_block)
        return lax.dynamic_update_slice(out, blk, (0, start))

    out = jnp.zeros((N, n_chunks * max_rhs), dtype=L.dtype)
    out = lax.fori_loop(0, n_chunks, body, out)
    return out[:, :N]


@partial(jax.jit, static_argnames=("lower",))
def robust_cholesky(sigma, lower=False):
    """Cholesky-like factor T with T^T T = sigma, eigh fallback.

    Mirrors reference __robust_cholesky (gaussian_process.py:2331-2355):
    on an indefinite matrix, eigendecompose, drop tiny eigenvalues, and if
    negative eigenvalues remain return zeros.  Returns an upper-triangular
    factor on success (scipy convention of the reference); the fallback
    returns a non-triangular square root with the same contract.
    """
    Lc = jnp.linalg.cholesky(sigma)  # lower
    ok = jnp.logical_not(jnp.any(jnp.isnan(Lc)))

    def _fallback(_):
        S = 0.5 * (sigma + sigma.T)
        w, U = jnp.linalg.eigh(S)
        # Sign-fix columns by their largest-|.| entry (reference parity).
        maxidx = jnp.argmax(jnp.abs(U), axis=0)
        signs = jnp.sign(U[maxidx, jnp.arange(U.shape[1])])
        signs = jnp.where(signs == 0, 1.0, signs)
        U = U * signs[None, :]
        tol = jnp.abs(jnp.finfo(sigma.dtype).eps * jnp.max(w)) * sigma.shape[0]
        keep = jnp.abs(w) > tol
        any_negative = jnp.any(jnp.logical_and(keep, w < 0))
        w_safe = jnp.where(keep, jnp.maximum(w, 0.0), 0.0)
        T = jnp.sqrt(w_safe)[:, None] * U.T
        return jnp.where(any_negative, jnp.zeros_like(T), T)

    T = lax.cond(ok, lambda _: Lc.T, _fallback, operand=None)
    return T.T if lower else T
