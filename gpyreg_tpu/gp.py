"""The GP model object: a stateful, API-compatible shell over the
functional JAX core.

Public surface mirrors the reference ``GP`` class
(gaussian_process.py:24-2565): same constructor, method names, option
dicts, hyperparameter naming ABI and Posterior field semantics, so PyVBMC
can swap backends.  The numerics differ in implementation only:

- NLML / gradients / posterior factors: jitted batched JAX
  (gpyreg_tpu/core/nlml.py) instead of per-sample NumPy loops.
- The space-filling design evaluation (the reference's top hot loop,
  f_min_fill.py:175) runs as chunked vmapped NLML on the accelerator.
- Predictions batch across hyperparameter samples via vmap.
- Hyperparameter optimization uses scipy L-BFGS-B driving the jitted
  device value-and-grad (parity first; a fully-batched device multistart
  is the planned fast path).
"""

import time
import warnings
import weakref
from textwrap import indent
from typing import Union

import numpy as np
import scipy as sp

import jax
import jax.numpy as jnp

from . import _compile_log
from . import covariance_functions as _cov_mod
from . import mean_functions as _mean_mod
from .core.model import ModelSpec
from .core.nlml import get_fns
from .core.priors import build_prior_pack
from .f_min_fill import smoothbox_cdf, smoothbox_student_t_cdf
from .formatting import full_repr
from .inference import cg_fit as _cg_fit
from .inference import device_slice as _device_slice
from .inference import fit_phases as _fit_phases
from .inference import map_optimize as _map_optimize
from .inference import sampling as _sampling
from .inference.fit_phases import _design_chunk  # noqa: F401 (back-compat)
from .serving import (  # noqa: F401 (re-exported for tests/back-compat)
    _MXU_PREDICT_MIN_M,
    _MXU_PREDICT_MIN_N,
    _neg_inverse_batch,
    _post_small,
    _predict_chunked_fn,
    _predict_fns,
    _predict_sharded_fn,
    _quad_fns,
    _quad_sharded_fn,
    _random_fns,
    _scaled_upper_batch,
    _sw_batch,
)

from functools import lru_cache



class Posterior:
    """Per-hyperparameter-sample posterior factors.

    Field semantics identical to reference gaussian_process.py:2568-2587:
    alpha = (K + sn2_mult*Sigma)^-1 (y - m); sW = 1/sqrt(min(sn2)*sn2_mult);
    L is the upper Cholesky factor of the scaled matrix when L_chol, else
    the explicit negative inverse.

    TPU-first storage: the factors live as DEVICE arrays, padded to the
    GP's shape bucket (``n_real`` real rows out of the padded leading
    dimension) so that the PyVBMC growing-data loop reuses one compiled
    program per bucket instead of recompiling at every N.  The padded
    blocks are exact: alpha's padding is zero and L's padding block is
    (block-)diagonal, so the real block equals the unpadded factors to
    the bit.  The public ``alpha``/``sW``/``L`` attributes present the
    reference's true-size views (sliced lazily, cached); internal device
    consumers read the raw padded storage (``_alpha`` etc.) together
    with ``n_real``.  Assigning through the public attributes (the
    reference-style mutation ABI) stores the value verbatim and marks
    that field as externally owned.
    """

    __slots__ = (
        "hyp",
        "sn2_mult",
        "L_chol",
        "n_real",
        "matrix_free",
        "_alpha",
        "_sW",
        "_L",
        "_direct",
        "_views",
    )

    def __init__(
        self,
        hyp,
        alpha,
        sW,
        L,
        sn2_mult,
        Lchol,
        n_real=None,
        matrix_free=False,
    ):
        self.hyp = hyp
        self.sn2_mult = sn2_mult
        self.L_chol = Lchol
        self.n_real = n_real
        # matrix_free: no stored O(N^2) factor — predictions run through
        # the CG/BBMM stack (ops/iterative.py); ``_alpha`` caches the
        # padded CG weight vector after the first predict.
        self.matrix_free = matrix_free
        self._alpha = alpha
        self._sW = sW
        self._L = L
        self._direct = set()
        self._views = {}

    def _view(self, name):
        v = getattr(self, "_" + name)
        if v is None or self.n_real is None or name in self._direct:
            return v
        n = int(self.n_real)
        if v.shape[0] <= n:
            return v
        if name not in self._views:
            if v.ndim == 2 and v.shape[0] == v.shape[1]:
                self._views[name] = v[:n, :n]
            else:
                self._views[name] = v[:n]
        return self._views[name]

    def _set(self, name, v):
        setattr(self, "_" + name, v)
        self._direct.add(name)
        self._views.pop(name, None)

    @property
    def alpha(self):
        return self._view("alpha")

    @alpha.setter
    def alpha(self, v):
        self._set("alpha", v)

    @property
    def sW(self):
        return self._view("sW")

    @sW.setter
    def sW(self, v):
        self._set("sW", v)

    @property
    def L(self):
        return self._view("L")

    @L.setter
    def L(self, v):
        self._set("L", v)



def _chain_batch_hbm_estimate(n_chains, n_padded, itemsize, n_dev=1):
    """Worst-case device memory of the chain-parallel batched MCMC
    eval through the memory-lean ``core.nlml.nlz_chain`` schedule:
    3.31 live copies of the per-device (B, N, N) kernel array per AOT
    ``memory_analysis`` (kernel/factor pair at attempt 0 plus the
    jitter-retry loop's rebuild+carry — benchmarks/chain_mem_analysis.py;
    the retired general path held 4.56, and the round-4 OOM log
    measured 41.03 GB at B=8, N=16384, f32 ~ 5 copies incl.
    fragmentation).  The fit gate adds a flat fragmentation reserve on
    top (``_CHAIN_HBM_RESERVE``) rather than a fractional headroom —
    at 16 GB HBM a 15% fraction was refusing B=4 at N=16384 (14.2 GB
    predicted, 15.75 available), the configuration the lean schedule
    exists to enable.  On-TPU check (2026-08-20): the real compiler's
    ``memory_analysis`` reports 4.02 copies for the lean schedule yet
    ACCEPTS the B=4 N=16384 program against its 15.75 G budget (the
    analysis temp sum over-counts vs the allocator's effective peak),
    and rejects the general path at 5.26 copies — so the 3.31
    multiplier matches the compiler's effective accounting and stays
    the gate."""
    return int(
        3.31 * -(-n_chains // n_dev) * n_padded**2 * itemsize
    )


# Flat HBM set-aside for allocator fragmentation + non-(N,N) buffers
# when sizing chain groups (see _chain_batch_hbm_estimate).
_CHAIN_HBM_RESERVE = 1.2e9

# All live GP instances (weak): a large-N fit pre-flight sums the
# device posterior factors OTHER instances pin, because two live 16k+
# models do not fit one 16 GB chip — measured: a second full fit at
# N=17203 beside a live 8-sample posterior (9.5 GB of factors) dies
# in the posterior build with RESOURCE_EXHAUSTED (2026-08-20,
# benchmarks/slicelite_shifted.py --full, first version).
_LIVE_GPS = weakref.WeakSet()
_OTHER_GP_FACTOR_WARN_BYTES = 2e9
_OTHER_GP_FACTOR_WARN_MIN_N = 8192


# Matrix-free (CG) hyperposterior chains segment far earlier than the
# Cholesky paths' SEG_MIN_N: every chain evaluation is a full CG+SLQ
# program (up to max_iter panel matvecs), so a monolithic burn+sample
# chain dispatch crosses the TPU runtime's ~6-minute execution watchdog
# at a fraction of the Cholesky N (estimated ~400 s monolithic at
# N=4096 with the default max_iter=500).  Above this true-N threshold
# the chain runs one sweep per dispatch.
_CG_SAMPLE_SEG_MIN_N = 2048

# Above this true N the fixed-probe chain is driven from the HOST at
# one EVALUATION per dispatch (the reference-parity SliceSampler over
# the jitted CG+SLQ log-posterior).  Move-granularity segments bound
# the EVAL COUNT of a dispatch (<= 1 + max_shrink) but not its device
# time: at N=65536 one eval is a seconds-to-tens-of-seconds program
# (every CG matvec pass rebuilds the 65k^2 kernel panels), so a single
# wide-interval burn-in move exceeded the ~6-min device watchdog (r4,
# third crash).  A single evaluation is the only robustly bounded
# dispatch unit; the ~0.1 s per-dispatch tunnel overhead is noise
# against seconds-scale evals, and the unbounded reference shrink loop
# becomes safe again (no max_shrink cap exits distorting the chain).
_CG_SAMPLE_HOST_MIN_N = 32768


@lru_cache(maxsize=None)
def _jit_by_identity(fn):
    """One jit wrapper per raw callable identity: keeps the host-driven
    chain's compiled eval program shared across warm refits (the same
    invariant the device samplers get by taking the raw callable as a
    static jit arg — see core/nlml.get_fns)."""
    return jax.jit(fn)



class GP:
    """A single exact Gaussian Process (see module docstring).

    Parameters
    ----------
    D : int
        Input dimension.
    covariance, mean, noise : objects from
        :mod:`gpyreg_tpu.covariance_functions`,
        :mod:`gpyreg_tpu.mean_functions`,
        :mod:`gpyreg_tpu.noise_functions`.
    """

    def __init__(
        self,
        D: int,
        covariance: object,
        mean: object,
        noise: object,
        dtype=None,
        outwarp: object = None,
        fast_predict: bool = False,
        pad_bucket: int = 64,
        pallas_predict: bool = False,
        mxu_predict: bool = None,
        mesh=None,
    ):
        self.D = D
        self.covariance = covariance
        self.mean = mean
        self.noise = noise
        # Optional output-warping function (MATLAB-oracle capability,
        # gpyreg_tpu.outwarp_functions); hyperparameters append after
        # the mean's in the flat vector.
        self.outwarp = outwarp
        # fast_predict stores every posterior in the explicit-inverse
        # parametrization (the reference's low-noise branch,
        # gaussian_process.py:2440-2448) regardless of noise level:
        # predictions become pure MXU matmuls instead of triangular
        # solves.  Wins at small N (one stable prediction program per
        # fit) and for f64 at large N (emulated f64 trsm is very slow).
        # CAUTION at large N in f32: the explicit inverse amplifies
        # rounding by the kernel condition number (measured 1e-2
        # absolute variance error at N=16k vs 3e-6 for the Cholesky
        # path), and XLA's f32 trsm is fast enough that the Cholesky
        # path also WINS on speed there (5785 vs 3330 pts/s).
        self.fast_predict = bool(fast_predict)
        # pad_bucket (default 64) rounds the training-set size up to a
        # multiple of this bucket with masked padding rows
        # (core/nlml.py), so that incrementally growing datasets (the
        # PyVBMC warm-refit loop) reuse compiled programs instead of
        # recompiling at every N, and rank-1 updates write the new
        # row/column into the padding in place on device
        # (core/rank1.py).  Pass None to disable (single-point updates
        # then fall back to a full batched posterior rebuild).
        self.pad_bucket = int(pad_bucket) if pad_bucket else None
        # pallas_predict fuses the cross-covariance build of the
        # large-N serving path into one VMEM-resident Pallas kernel
        # (ops/pallas_kernels.py); float32 only, XLA fallback otherwise.
        self.pallas_predict = bool(pallas_predict)
        # mxu_predict serves large-M/large-N f32 Cholesky-path
        # predictions by inverting the triangular factor once per
        # dispatch (ops.linalg.tri_inv, MXU matmuls) instead of a trsm
        # per chunk — XLA's trsm is the serving roofline (~4.7 TFLOP/s
        # effective).  None (default) auto-enables at f32 with
        # N_padded >= _MXU_PREDICT_MIN_N and M >= _MXU_PREDICT_MIN_M;
        # True/False force it on/off.  Accuracy trade: ~cond(L)*eps32
        # on the variance (measured 2.5e-5 abs at N=16k vs the trsm
        # path's ~3e-6; benchmarks/mxu_serving.py); f64 and small fits
        # keep the trsm path either way under the auto rule.
        self.mxu_predict = mxu_predict
        # mesh: a 1-D jax.sharding.Mesh over axis 'batch' (or an int
        # device count; see parallel.mesh.make_mesh) scales the GP over
        # multiple chips: the fit's 1024-wide design evaluation and the
        # multistart L-BFGS lanes shard across devices (the workload's
        # primary data-parallel axis, SURVEY.md section 2.3), MCMC runs
        # chain-parallel via fit(options={"n_chains": ...}), and
        # prediction shards the test-point axis.  None = single device.
        if isinstance(mesh, int):
            from .parallel.mesh import make_mesh

            mesh = make_mesh(mesh)
        self.mesh = mesh
        # Device computation dtype.  float64 (default) gives reference
        # parity at 1e-8 rtol; float32 is the TPU fast path (f64 matmul /
        # Cholesky are emulated on TPU).  Host-side state stays float64.
        self.dtype = np.dtype(dtype if dtype is not None else np.float64)
        self.s2 = None
        self.X = None
        self.y = None
        self.posteriors = None
        self.no_prior = None
        self.normalization_constants = None
        self._ctx = None
        # Inference backend: "exact" (Cholesky factors) or "cg" (the
        # matrix-free BBMM stack, set by fit(options={"method": "cg"})).
        self._infer_method = "exact"
        self._cg_options = {}
        self.set_bounds()
        self.set_priors()

        # Scratch dict used by PyVBMC (reference gaussian_process.py:61-62).
        self.temporary_data = {}
        _LIVE_GPS.add(self)

    # ------------------------------------------------------------------
    # Device plumbing
    # ------------------------------------------------------------------

    def _device_factor_bytes(self):
        """Device bytes pinned by this model's posterior factors and
        stacked-factor cache (0 for host/NumPy state).  Used by the
        large-N fit pre-flight: OTHER live models' factors compete with
        the fit's working set for HBM."""
        total = 0
        seen = set()

        def add(v):
            nonlocal total
            if (
                v is not None
                and not isinstance(v, np.ndarray)
                and hasattr(v, "nbytes")
                and id(v) not in seen
            ):
                seen.add(id(v))
                total += int(v.nbytes)

        if self.posteriors is not None:
            for p in np.atleast_1d(self.posteriors):
                for name in ("_alpha", "_sW", "_L"):
                    add(getattr(p, name, None))
        for v in getattr(self, "_stack_cache", {}).values():
            jax.tree_util.tree_map(add, v)
        return total

    def _spec(self) -> ModelSpec:
        p = self.noise.parameters
        return ModelSpec(
            D=self.D,
            cov=self.covariance._kind,
            mean=self.mean._kind,
            noise_constant=bool(p[0] == 1),
            noise_user=int(p[1]),
            noise_rectified=bool(p[2] == 1),
            outwarp=None if self.outwarp is None else self.outwarp._kind,
        )

    def _invalidate(self):
        self._ctx = None

    def _device(self):
        """(spec, fns, obj_args, Xj_true, pack) built lazily from host
        state.  ``obj_args`` are the positional arguments after ``hyp``
        for every function in ``fns`` (padded data when pad_bucket is
        set); ``Xj_true`` is the unpadded device X for prediction."""
        if self._ctx is None:
            spec = self._spec()
            has_s2 = self.s2 is not None
            has_prior = not self.no_prior
            padded = bool(self.pad_bucket) and self.X is not None
            fns = get_fns(spec, has_s2, has_prior, padded)

            pack = None
            if has_prior:
                log_norm = float(
                    np.sum(np.log(self.normalization_constants))
                )
                pack = build_prior_pack(
                    self.hyper_priors,
                    self.lower_bounds,
                    self.upper_bounds,
                    log_norm=log_norm,
                )

            args = None
            if self.X is not None and self.y is not None:
                X_host, y_host, s2_host = self.X, self.y, self.s2
                n_real = None
                if padded:
                    N = X_host.shape[0]
                    Np = -(-N // self.pad_bucket) * self.pad_bucket
                    if Np > N:
                        X_host = np.concatenate(
                            [X_host, np.tile(X_host[:1], (Np - N, 1))]
                        )
                        y_host = np.concatenate(
                            [y_host, np.zeros((Np - N, 1))]
                        )
                        if has_s2:
                            s2_host = np.concatenate(
                                [s2_host, np.ones((Np - N, 1))]
                            )
                    n_real = np.int32(N)
                # Host-side args: jit folds the (small, (N,D)-sized)
                # uploads into each dispatch; eager jnp.asarray would
                # cost a tunnel round trip per array per context rebuild
                # (every warm refit rebuilds this context).
                args = [
                    np.asarray(X_host, dtype=self.dtype),
                    np.asarray(y_host, dtype=self.dtype),
                ]
                if has_s2:
                    args.append(np.asarray(s2_host, dtype=self.dtype))
                if padded:
                    args.append(n_real)
                if pack is not None:
                    args.append(pack)
                args = tuple(args)

            Xj = (
                args[0]
                if (args is not None and not padded)
                else (
                    None
                    if self.X is None
                    else np.asarray(self.X, dtype=self.dtype)
                )
            )
            self._ctx = (spec, fns, args, Xj, pack)
        return self._ctx

    def _obj_args(self):
        spec, fns, args, Xj, pack = self._device()
        return fns, args

    def _objective(self, hyp, grad=False, swap_sign=False):
        """Scalar objective nlZ - log_prior (prior included unless
        no_prior), mirroring __gp_obj_fun (gaussian_process.py:1540)."""
        fns, args = self._obj_args()
        # Host-side hyp: jit folds the upload into the dispatch (an
        # eager jnp.asarray costs a tunnel round trip per call).
        h = np.asarray(hyp, dtype=np.float64)
        if grad:
            v, g = fns["obj_grad"](h, *args)
            v, g = float(v), np.asarray(g)
            return (-v, -g) if swap_sign else (v, g)
        v = float(fns["obj"](h, *args))
        return -v if swap_sign else v

    def _objective_batch(self, hyps):
        """Batched objective over (B, hyp_N) candidates: chunked vmapped
        NLML on the accelerator (kills the reference's hot loop at
        f_min_fill.py:175-176)."""
        fns, args = self._obj_args()
        hyps = np.asarray(hyps, dtype=np.float64)
        B = hyps.shape[0]
        # Bound live memory at ~2 GB of (chunk, N, N) float64 workspace
        # (x3 for kernel + factor + autodiff slack).  N is the PADDED
        # row count and the chunk rounds down to a power of two so the
        # compiled program stays stable while the dataset grows within
        # a pad bucket (same policy as the fused fit path).
        N = args[0].shape[0]
        raw = int(max(1, min(B, 2**31 // max(1, N * N * 8 * 3))))
        chunk = 1 << (raw.bit_length() - 1)
        if chunk == 1 and B > 1:
            # Huge-N regime: the vmapped program compiles pathologically
            # and buys nothing (one Cholesky saturates the chip).
            return np.array(
                [float(fns["obj"](h, *args)) for h in hyps]
            )
        if B <= chunk:
            return np.asarray(fns["obj_batch"](hyps, *args))
        n_chunks = (B + chunk - 1) // chunk
        padded = np.concatenate(
            [hyps, np.tile(hyps[:1], (n_chunks * chunk - B, 1))]
        )
        out = [
            np.asarray(
                fns["obj_batch"](
                    padded[i * chunk : (i + 1) * chunk], *args
                )
            )
            for i in range(n_chunks)
        ]
        return np.concatenate(out)[:B]

    def _stack_budget_ok(self, s_N, n_rows):
        """One policy for 'are stacked (s_N, n, n) factors worth holding
        in HBM': used by the stacked-predict decision and the
        finalize-time cache seeding (they must agree)."""
        return (
            s_N * n_rows * n_rows * self.dtype.itemsize
            <= getattr(self, "_posterior_mem_budget", 8 * 2**30) // 4
        )

    def _mxu_predict_on(self, M, n_padded):
        """Gate for the MXU serving path (see ``mxu_predict`` in
        ``__init__`` and :func:`_predict_chunked_fn`): f32 only;
        ``None`` auto-enables above the size thresholds where the
        one-time triangular inversion amortizes, True/False force."""
        if self.mxu_predict is False or self.dtype != np.float32:
            return False
        if self.mxu_predict:
            return True
        return (
            n_padded >= _MXU_PREDICT_MIN_N and M >= _MXU_PREDICT_MIN_M
        )

    def _maybe_release_posteriors(self):
        """Drop old posterior factors ahead of a full rebuild when they
        hold a large slice of device memory."""
        if self.posteriors is None or self.X is None:
            return
        N = self.X.shape[0]
        s_N = np.size(self.posteriors)
        if N * N * self.dtype.itemsize * s_N > 2 * 2**30:
            self.posteriors = None
            # The stack cache holds full copies of the same factors.
            self._stack_cache = {}

    def _finalize_posteriors(
        self, hyp_arr, alphas, Ls, mults, sn2mins, seed_cache=True
    ):
        """Turn raw batched device factors (alpha, chol(G), mult,
        sn2_min; shapes (S, Np, ...)) into Posterior objects.

        Exactly ONE blocking host transfer for the whole batch (the
        per-sample scalars); the factor transforms stay batched at the
        PADDED shape — slicing to the true N before transforming would
        recompile the transform at every refit of a growing dataset.
        The parametrization split (reference gaussian_process.py:2404)
        is decided on the host from the pulled sn2_min values.
        """
        small = np.asarray(_post_small(alphas, mults, sn2mins))
        mults_h, sn2mins_h, bad = small[0], small[1], small[2]
        if np.any(bad > 0):
            raise sp.linalg.LinAlgError(
                "Singular matrix for L Cholesky decomposition"
            )
        N_true = self.X.shape[0]
        n_real = N_true if alphas.shape[1] != N_true else None

        flags = (sn2mins_h >= 1e-6) & (not self.fast_predict)
        sWs = _sw_batch(Ls, sn2mins_h, mults_h)

        S = hyp_arr.shape[0]
        L_stored = [None] * S
        full_L_stack = None
        for flag in (True, False):
            idx = np.nonzero(flags == flag)[0]
            if idx.size == 0:
                continue
            sub = Ls if idx.size == S else Ls[jnp.asarray(idx)]
            if flag:
                out = _scaled_upper_batch(sub, sn2mins_h[idx] * mults_h[idx])
            else:
                out = _neg_inverse_batch(sub)
            if idx.size == S:
                full_L_stack = out
            for j, s in enumerate(idx):
                L_stored[s] = out[j]

        alpha_rows = [alphas[s] for s in range(S)]
        sw_rows = [sWs[s] for s in range(S)]
        posts = [
            Posterior(
                np.asarray(hyp_arr[s], dtype=np.float64).copy(),
                alpha_rows[s],
                sw_rows[s],
                L_stored[s],
                float(mults_h[s]),
                bool(flags[s]),
                n_real,
            )
            for s in range(S)
        ]
        # Posteriors were rebuilt: drop every stale stack-cache entry
        # (they pin the PREVIOUS factor set's device memory — at
        # N=16k/S=8 that is 8 GB of HBM the release path exists to
        # free).  Then seed with the batched factors that already exist
        # here, so even the FIRST predict after a refit skips the eager
        # re-stacking device round trips (_posterior_arrays memoization;
        # keys match by row-view identity) — but only when the stacked
        # copies fit the same memory criterion the predict path uses to
        # decide stacking (large-N serving runs per-sample and would
        # never read them).
        self._stack_cache = cache = {}
        Np = 0 if full_L_stack is None else full_L_stack.shape[-1]
        small_enough = self._stack_budget_ok(S, Np)
        if seed_cache and S > 0 and full_L_stack is not None and small_enough:
            idx_t = tuple(range(S))
            for name, rows, stacked in (
                ("alpha", alpha_rows, alphas),
                ("sW", sw_rows, sWs),
                ("L", L_stored, full_L_stack),
            ):
                cache[(name, idx_t, True)] = (
                    tuple(map(id, rows)),
                    stacked,
                    rows,
                )
        return posts

    def _compute_posteriors(self, hyp_arr):
        """Batched posterior-factor computation for all samples.

        The sample batch is chunked so the live Cholesky working set
        (~3 copies of (chunk, N, N)) stays under the HBM budget — a
        16-sample batch at N=16k would otherwise need 48 GB.
        """
        spec, fns, obj_args, Xj, pack = self._device()
        args = obj_args[:-1] if pack is not None else obj_args
        hyp_arr = np.asarray(hyp_arr, dtype=np.float64)
        s_N = hyp_arr.shape[0]
        N = self.X.shape[0]
        budget = getattr(self, "_posterior_mem_budget", 8 * 2**30)
        total = 3 * N * N * self.dtype.itemsize * s_N

        if total > budget:
            # Large-N regime: one Cholesky already saturates the chip and
            # the vmapped program would exceed HBM (and compiles far more
            # slowly); run the single-sample program per sample.
            out = []
            for s in range(s_N):
                alpha, L, mult, sn2min = fns["post"](hyp_arr[s], *args)
                out.extend(
                    self._finalize_posteriors(
                        hyp_arr[s : s + 1],
                        alpha[None],
                        L[None],
                        mult[None],
                        sn2min[None],
                        # Per-sample large-N path: the predict side runs
                        # no_stack, so a seeded 1-sample stack would only
                        # pin HBM.
                        seed_cache=False,
                    )
                )
            return out

        alphas, Ls, mults, sn2mins = fns["post_batch"](hyp_arr, *args)
        return self._finalize_posteriors(
            hyp_arr, alphas, Ls, mults, sn2mins
        )

    # ------------------------------------------------------------------
    # Representation
    # ------------------------------------------------------------------

    def __repr__(self):
        return full_repr(
            self,
            "GP",
            order=[
                "D",
                "covariance",
                "mean",
                "noise",
                "X",
                "y",
                "s2",
                "lower_bounds",
                "upper_bounds",
                "posteriors",
            ],
            exclude=["_ctx"],
        )

    def __str__(self):
        def n_params(k):
            return f"{k} parameter" + ("" if k == 1 else "s")

        cov_name = type(self.covariance).__name__
        if cov_name == "Matern":
            cov_name += f"(degree={self.covariance.degree})\n"
        p0, p1, p2 = self.noise.parameters[:3]
        noise_flags = [
            flag
            for cond, flag in [
                (p0 == 1, "constant_add=True"),
                (p1 == 1, "user_provided_add=True"),
                (p1 == 2, "scale_user_provided=True"),
                (p2 == 1, "rectified_linear_output_dependent_add=True"),
            ]
            if cond
        ]
        noise_name = type(self.noise).__name__
        if noise_flags:
            noise_name += "(" + ", ".join(noise_flags) + ")"
        cov_N, noise_N, mean_N = self._hyp_counts()
        s_N = 0 if self.posteriors is None else np.size(self.posteriors)
        lines = [
            f"Dimension: {self.D}",
            f"Covariance function: {cov_name}, {n_params(cov_N)}",
            f"Mean function: {type(self.mean).__name__}, {n_params(mean_N)}",
            f"Noise function: {noise_name}, {n_params(noise_N)}",
            "Hyperparameter priors: " + ("none" if self.no_prior else "present"),
            f"Hyperparameter samples: {s_N}",
        ]
        return "GP:\n" + indent("\n".join(lines), "    ")

    # ------------------------------------------------------------------
    # Bounds and priors
    # ------------------------------------------------------------------

    def _hyper_info(self):
        info = (
            self.covariance.hyperparameter_info(self.D)
            + self.noise.hyperparameter_info()
            + self.mean.hyperparameter_info(self.D)
        )
        if self.outwarp is not None:
            info = info + self.outwarp.hyperparameter_info()
        return info

    def _hyp_counts(self):
        cov_N = self.covariance.hyperparameter_count(self.D)
        mean_N = self.mean.hyperparameter_count(self.D)
        noise_N = self.noise.hyperparameter_count()
        return cov_N, noise_N, mean_N

    def _outwarp_N(self):
        return (
            0 if self.outwarp is None else self.outwarp.hyperparameter_count()
        )

    def set_bounds(self, bounds: dict = None):
        """Set hyperparameter lower/upper bounds from a dict of
        ``name -> (lb, ub)`` (``None`` entry or argument = unset/NaN,
        filled with recommended values at fit time)."""
        cov_N, noise_N, mean_N = self._hyp_counts()
        hyper_info = self._hyper_info()

        hyp_N = cov_N + mean_N + noise_N + self._outwarp_N()
        lower_bounds = np.full((hyp_N,), np.nan)
        upper_bounds = np.full((hyp_N,), np.nan)

        lower = 0
        for info in hyper_info:
            if bounds is None:
                vals = None
            else:
                try:
                    vals = bounds[info[0]]
                except KeyError:
                    raise ValueError(
                        "Missing hyperparameter " + info[0]
                    ) from None
            if vals is not None:
                lb, ub = vals
                idx = range(lower, lower + info[1])
                lower_bounds[idx] = lb
                upper_bounds[idx] = ub
            lower += info[1]

        self.lower_bounds = lower_bounds
        self.upper_bounds = upper_bounds
        self._invalidate()

        if self.no_prior is not None:
            self.__recompute_normalization_constants()

    def get_bounds(self):
        """Current bounds as a dict of ``name -> (lb, ub)``."""
        return self.bounds_to_dict(self.lower_bounds, self.upper_bounds)

    def bounds_to_dict(self, lower_bounds, upper_bounds):
        """Convert bound arrays to the named-dict form."""
        bounds_dict = {}
        lower = 0
        for info in self._hyper_info():
            idx = range(lower, lower + info[1])
            bounds_dict[info[0]] = (lower_bounds[idx], upper_bounds[idx])
            lower += info[1]
        return bounds_dict

    def get_recommended_bounds(self, lower_bounds=None, upper_bounds=None):
        """Recommended bounds dict; NaN entries in provided arrays are
        filled with data-driven recommendations (reference
        gaussian_process.py:260-359)."""
        if self.X is None or self.y is None:
            raise ValueError("GP does not have X or y set!")

        def resolve(arg, current):
            if isinstance(arg, (list, tuple, np.ndarray)):
                return np.array(arg, dtype=np.float64)
            if arg == "current":
                return current.copy()
            if arg is None or arg == "recommended":
                return np.full_like(current, np.nan)
            raise ValueError(
                "`lower_bounds` should be 'recommended'/`None`, "
                "'current', or an array."
            )

        lb = resolve(lower_bounds, self.lower_bounds)
        ub = resolve(upper_bounds, self.upper_bounds)

        # One recommended-bounds table for the whole flat hyp vector, in
        # canonical cov | noise | mean | outwarp order; NaN user entries
        # pick up the recommendation elementwise.
        modules = [self.covariance, self.noise, self.mean]
        if self.outwarp is not None:
            modules.append(self.outwarp)
        infos = [m.get_bounds_info(self.X, self.y) for m in modules]
        rec_lb = np.concatenate([info["LB"] for info in infos])
        rec_ub = np.concatenate([info["UB"] for info in infos])

        lb = np.where(np.isnan(lb), rec_lb, lb)
        ub = np.where(np.isnan(ub), rec_ub, ub)
        return self.bounds_to_dict(lb, np.maximum(lb, ub))

    def get_priors(self):
        """Current hyperpriors as a dict of
        ``name -> (type, params) | None``."""
        def decode(mu, sigma, df, a, b):
            """Classify one hyperparameter group's SoA row back into the
            named family; None when the row encodes no (usable) prior."""
            light_tails = np.all(df == 0) or np.all(df == np.inf)
            heavy_tails = np.all(df > 0)
            if all(np.isfinite(v).all() for v in (a, b, sigma)):
                if light_tails:
                    return ("smoothbox", (a, b, sigma))
                if heavy_tails:
                    return ("smoothbox_student_t", (a, b, sigma, df))
            elif np.isfinite(mu).all() and np.isfinite(sigma).all():
                if light_tails:
                    return ("gaussian", (mu, sigma))
                if heavy_tails:
                    return ("student_t", (mu, sigma, df))
            return None

        table = self.hyper_priors
        out = {}
        pos = 0
        for name, count, *_ in self._hyper_info():
            rows = [
                table[k][pos : pos + count].copy()
                for k in ("mu", "sigma", "df", "a", "b")
            ]
            out[name] = decode(*rows)
            pos += count
        return out

    def set_priors(self, priors: dict = None):
        """Set hyperpriors from a dict of ``name -> (type, params)``;
        supported types: gaussian, student_t, smoothbox,
        smoothbox_student_t (reference gaussian_process.py:418-514)."""
        self.no_prior = priors is None

        cov_N, noise_N, mean_N = self._hyp_counts()
        hyp_N = cov_N + mean_N + noise_N + self._outwarp_N()
        hyper_priors = {
            "mu": np.full((hyp_N,), np.nan),
            "sigma": np.full((hyp_N,), np.nan),
            "df": np.full((hyp_N,), np.nan),
            "a": np.full((hyp_N,), np.nan),
            "b": np.full((hyp_N,), np.nan),
        }

        non_trivial_flag = False
        lower = 0
        for info in self._hyper_info():
            if self.no_prior:
                vals = None
            else:
                try:
                    vals = priors[info[0]]
                except KeyError:
                    raise ValueError(
                        "Missing hyperparameter " + info[0]
                    ) from None

            if vals is not None:
                non_trivial_flag = True
                prior_type, prior_params = vals
                i = range(lower, lower + info[1])
                if prior_type == "gaussian":
                    mu, sigma = prior_params
                    hyper_priors["mu"][i] = mu
                    hyper_priors["sigma"][i] = sigma
                    hyper_priors["df"][i] = 0
                elif prior_type == "student_t":
                    mu, sigma, df = prior_params
                    hyper_priors["mu"][i] = mu
                    hyper_priors["sigma"][i] = sigma
                    hyper_priors["df"][i] = df
                elif prior_type == "smoothbox":
                    a, b, sigma = prior_params
                    hyper_priors["a"][i] = a
                    hyper_priors["b"][i] = b
                    hyper_priors["sigma"][i] = sigma
                    hyper_priors["df"][i] = 0
                elif prior_type == "smoothbox_student_t":
                    a, b, sigma, df = prior_params
                    hyper_priors["a"][i] = a
                    hyper_priors["b"][i] = b
                    hyper_priors["sigma"][i] = sigma
                    hyper_priors["df"][i] = df
                else:
                    raise ValueError("Unknown hyperprior type " + prior_type)
            lower += info[1]

        self.hyper_priors = hyper_priors
        self.no_prior = non_trivial_flag is not True
        self._invalidate()
        self.__recompute_normalization_constants()

    def __recompute_normalization_constants(self):
        """Truncation normalization of bounded priors via CDFs at the
        bounds (reference gaussian_process.py:1234-1273)."""
        lb, ub = self.lower_bounds, self.upper_bounds
        table = self.hyper_priors
        mu, df = table["mu"], table["df"]
        sigma = np.abs(table["sigma"])
        a, b = table["a"], table["b"]

        # Truncation mass is only needed where (i) the dimension is not
        # pinned (lb==ub), (ii) at least one bound is finite, and (iii) a
        # proper (non-uniform) prior is attached.
        needs_mass = (
            (lb != ub)
            & (np.isfinite(lb) | np.isfinite(ub))
            & (np.isfinite(mu) | np.isfinite(sigma))
        )
        boxed = np.isfinite(a) & np.isfinite(b)
        heavy = np.isfinite(df) & (df != 0)

        z = np.ones(lb.shape)
        for i in np.flatnonzero(needs_mass):
            if boxed[i] and heavy[i]:
                edges = [
                    smoothbox_student_t_cdf(v, df[i], sigma[i], a[i], b[i])
                    for v in (ub[i], lb[i])
                ]
            elif boxed[i]:
                edges = [
                    smoothbox_cdf(v, sigma[i], a[i], b[i])
                    for v in (ub[i], lb[i])
                ]
            elif heavy[i]:
                rv = sp.stats.t(df[i], loc=mu[i], scale=sigma[i])
                edges = [rv.cdf(ub[i]), rv.cdf(lb[i])]
            else:
                rv = sp.stats.norm(loc=mu[i], scale=sigma[i])
                edges = [rv.cdf(ub[i]), rv.cdf(lb[i])]
            z[i] = edges[0] - edges[1]

        self.normalization_constants = z
        self._invalidate()

    # ------------------------------------------------------------------
    # Hyperparameter access
    # ------------------------------------------------------------------

    def _hyp_N(self):
        cov_N, noise_N, mean_N = self._hyp_counts()
        return cov_N + noise_N + mean_N + self._outwarp_N()

    def get_hyperparameters(self, as_array: bool = False):
        """Hyperparameters as (hyp_samples, hyp_N) array or list of
        name->value dicts; NaN-filled if none set yet."""
        if self.posteriors is None:
            hyp = np.full((1, self._hyp_N()), np.nan)
        else:
            hyp = np.stack([p.hyp.copy() for p in self.posteriors])
        return hyp if as_array else self.hyperparameters_to_dict(hyp)

    def set_hyperparameters(self, hyp_new, compute_posterior: bool = True):
        """Replace hyperparameters (array or dict form)."""
        if isinstance(hyp_new, np.ndarray):
            hyp_new = np.atleast_2d(hyp_new)
            if hyp_new.shape[1] != self._hyp_N():
                raise ValueError(
                    "Input hyperparameter array is the wrong shape!"
                )
        else:
            hyp_new = self.hyperparameters_from_dict(hyp_new)
        self.update(hyp=hyp_new, compute_posterior=compute_posterior)

    def hyperparameters_to_dict(self, hyp_arr):
        """(hyp_samples, hyp_N) array -> list of name->values dicts."""
        hyp = []
        cov_N, noise_N, mean_N = self._hyp_counts()
        hyper_info = self._hyper_info()

        if hyp_arr.ndim == 1:
            hyp_arr = np.reshape(hyp_arr, (1, -1))
        if hyp_arr.shape[1] != cov_N + mean_N + noise_N + self._outwarp_N():
            raise ValueError("Input hyperparameter array is the wrong shape!")

        for s in range(hyp_arr.shape[0]):
            hyp_tmp = hyp_arr[s, :].copy()
            hyp_dict = {}
            i = 0
            for info in hyper_info:
                hyp_dict[info[0]] = hyp_tmp[i : i + info[1]]
                i += info[1]
            hyp.append(hyp_dict)
        return hyp

    def hyperparameters_from_dict(self, hyp_dict_list):
        """List of name->values dicts -> (hyp_samples, hyp_N) array."""
        if isinstance(hyp_dict_list, dict):
            hyp_dict_list = [hyp_dict_list]

        cov_N, noise_N, mean_N = self._hyp_counts()
        hyp_N = cov_N + mean_N + noise_N + self._outwarp_N()
        hyp_new_arr = np.zeros((len(hyp_dict_list), hyp_N))

        for i, hyp_tmp in enumerate(hyp_dict_list):
            j = 0
            for info in self._hyper_info():
                hyp_new_arr[i, j : j + info[1]] = hyp_tmp[info[0]]
                j += info[1]
        return hyp_new_arr

    # ------------------------------------------------------------------
    # Data updates
    # ------------------------------------------------------------------

    def update(
        self,
        X_new: np.ndarray = None,
        y_new: np.ndarray = None,
        s2_new: np.ndarray = None,
        hyp: np.ndarray = None,
        compute_posterior: bool = True,
    ):
        """Add data and/or replace hyperparameters; a single new point
        with existing posteriors triggers an O(N^2) rank-1 Cholesky
        update per sample with an instability fallback to full recompute
        (reference gaussian_process.py:691-884)."""
        X_new, y_new, s2_new = self._convert_shapes(X_new, y_new, s2_new)
        if X_new is not None:
            X_new = X_new.copy()
        if y_new is not None:
            y_new = y_new.copy()
        if s2_new is not None:
            s2_new = s2_new.copy()
        if hyp is not None:
            hyp = hyp.copy()

        # Rank-1 eligibility (reference gaussian_process.py:737-747) plus
        # the device-update preconditions: factors device-built (not
        # externally replaced) and bucket padding with at least one free
        # row.  A bucket-full update falls through to the batched full
        # rebuild — one extra O(N^3) program per pad_bucket updates.
        N_old = None if self.X is None else self.X.shape[0]
        rank_one_update = (
            X_new is not None
            and y_new is not None
            and compute_posterior
            and self.X is not None
            and self.y is not None
            and X_new.shape[0] == 1
            and y_new.shape[0] == 1
            and s2_new is None
            and self.outwarp is None
            and self.posteriors is not None
            and all(
                p._L is not None
                and not p._direct
                and p.n_real == N_old
                and p._L.shape[0] > N_old
                for p in self.posteriors
            )
            and len({p._L.shape[0] for p in self.posteriors}) == 1
        )
        full_updates = []

        if rank_one_update:
            get_stacked, _, X_pad, n_real = self._posterior_arrays()
            if X_pad.shape[0] != self.posteriors[0]._L.shape[0]:
                rank_one_update = False  # context/factor bucket mismatch

        if rank_one_update:
            cov_N, noise_N, _ = self._hyp_counts()

            s_N = np.size(self.posteriors)
            sn2_effs = np.array(
                [
                    float(
                        np.ravel(
                            self.noise.compute(
                                p.hyp[cov_N : cov_N + noise_N],
                                X_new,
                                y_new,
                                0,
                            )
                        )[0]
                    )
                    * p.sn2_mult
                    for p in self.posteriors
                ]
            )

            from .core.rank1 import get_rank1_fns

            r1fns = get_rank1_fns(self._spec())
            groups = {True: [], False: []}
            for i, p in enumerate(self.posteriors):
                groups[bool(p.L_chol)].append(i)
            if groups[True] and groups[False]:
                # Mixed parametrizations: one program (core/rank1.py
                # mixed_one) instead of a round trip per group.
                groups = {None: list(range(s_N))}

            # Host-side scalars/points: uploads fold into the dispatch
            # (the per-sample predictive at x_new is computed INSIDE the
            # rank-1 program — one dispatch + one ok-pull per group).
            x_new_h = np.asarray(X_new, dtype=self.dtype)
            y_new_h = self.dtype.type(y_new[0, 0])
            for flag, idxs in groups.items():
                if not idxs:
                    continue
                hyps = np.stack(
                    [self.posteriors[i].hyp for i in idxs]
                ).astype(self.dtype)
                call_args = (
                    hyps,
                    get_stacked("alpha", idxs),
                    get_stacked("L", idxs),
                    get_stacked("sW", idxs),
                    X_pad,
                    n_real,
                    x_new_h,
                    y_new_h,
                    np.asarray(sn2_effs[idxs], dtype=self.dtype),
                )
                if flag is None:
                    flags_arr = np.array(
                        [bool(self.posteriors[i].L_chol) for i in idxs]
                    )
                    L_out, a_out, sw_out, ok = r1fns["mixed"](
                        flags_arr, *call_args
                    )
                else:
                    L_out, a_out, sw_out, ok = r1fns[
                        "chol" if flag else "inv"
                    ](*call_args)
                ok = np.asarray(ok)
                rows = {
                    "alpha": [a_out[j] for j in range(len(idxs))],
                    "sW": [sw_out[j] for j in range(len(idxs))],
                    "L": [L_out[j] for j in range(len(idxs))],
                }
                for j, i in enumerate(idxs):
                    if not ok[j]:
                        full_updates.append(i)
                        warnings.warn(
                            "Rank-one posterior update unstable for "
                            + f"posterior {i}. Reverting to full update.",
                            stacklevel=2,
                        )
                        continue
                    p = self.posteriors[i]
                    p._alpha = rows["alpha"][j]
                    p._sW = rows["sW"][j]
                    p._L = rows["L"][j]
                    p._views = {}
                    p.n_real = n_real + 1
                if np.all(ok):
                    # Re-seed the predict/quad stack cache with the
                    # program's stacked outputs, so the next update /
                    # predict skips re-stacking (keys match by row-view
                    # identity — see _posterior_arrays).  Replace the
                    # dict outright: stale entries pin the pre-update
                    # factor set's device memory.
                    cache = self._stack_cache = {}
                    idx_t = tuple(idxs)
                    for name, stacked in (
                        ("alpha", a_out),
                        ("sW", sw_out),
                        ("L", L_out),
                    ):
                        cache[(name, idx_t, True)] = (
                            tuple(map(id, rows[name])),
                            stacked,
                            rows[name],
                        )

        if X_new is not None:
            self.X = X_new if self.X is None else np.concatenate(
                (self.X, X_new)
            )
        if y_new is not None:
            self.y = y_new if self.y is None else np.concatenate(
                (self.y, y_new)
            )
        if s2_new is not None:
            self.s2 = s2_new if self.s2 is None else np.concatenate(
                (self.s2, s2_new)
            )
        self._invalidate()

        if rank_one_update:
            if full_updates:
                hyp_failed = np.stack(
                    [self.posteriors[s].hyp for s in full_updates]
                )
                fixed = self._compute_posteriors(hyp_failed)
                for p, s in zip(fixed, full_updates):
                    self.posteriors[s] = p
        else:
            if hyp is None:
                hyp = self.get_hyperparameters(as_array=True)
            s_N, _ = hyp.shape
            if (
                self._infer_method == "cg"
                and compute_posterior
                and self.X is not None
                and self.y is not None
            ):
                # Matrix-free posteriors: no O(N^2) factors to build —
                # the CG weight vector is solved lazily at the first
                # predict (and re-solved here after data growth simply
                # by dropping the cache).
                self._maybe_release_posteriors()
                self.posteriors = np.array(
                    [
                        Posterior(
                            hyp[i, :].copy(),
                            None,
                            None,
                            None,
                            1,
                            None,
                            matrix_free=True,
                        )
                        for i in range(s_N)
                    ],
                    dtype=object,
                )
            elif compute_posterior and self.X is not None and self.y is not None:
                # Release the old device-resident factors before building
                # replacements: holding both sets at large N doubles HBM
                # use (8 samples x 16k^2 f32 = 8 GB per set).
                self._maybe_release_posteriors()
                self.posteriors = np.array(
                    self._compute_posteriors(hyp), dtype=object
                )
            else:
                self.posteriors = np.array(
                    [
                        Posterior(hyp[i, :], None, None, None, None, None)
                        for i in range(s_N)
                    ],
                    dtype=object,
                )

    def clean(self):
        """Drop reconstructible posterior factors and temporary data to
        save memory; rebuild with ``update(compute_posterior=True)``."""
        self.temporary_data = {}
        self._stack_cache = {}  # stop pinning the stacked device factors
        if self.posteriors is not None:
            for posterior in self.posteriors:
                posterior.alpha = None
                posterior.sW = None
                posterior.L = None
                posterior.sn2_mult = None
                posterior.L_chol = None

    # ------------------------------------------------------------------
    # Fitting
    # ------------------------------------------------------------------

    def _require_factors(self, what: str):
        """Raise for operations that need explicit O(N^2) posterior
        factors when the stored posteriors are matrix-free (CG)."""
        if self.posteriors is not None and any(
            getattr(p, "matrix_free", False) for p in self.posteriors
        ):
            raise ValueError(
                f"{what} requires explicit posterior factors; the "
                'stored posteriors are matrix-free (fit method="cg"). '
                'Refit with the default method="exact" to use it.'
            )

    def _cg_serve(self, x_star):
        """Matrix-free predictive mean/variance per posterior sample
        (the CG serving path for ``matrix_free`` posteriors).  The
        padded CG weight vector is solved once per posterior and cached
        device-side on it."""
        from .ops import iterative as _iterative

        spec = self._spec()
        M = x_star.shape[0]
        s_N = self.posteriors.size
        mu = np.zeros((M, s_N))
        s2 = np.zeros((M, s_N))
        X = np.asarray(self.X, dtype=self.dtype)
        y = np.asarray(self.y, dtype=self.dtype)
        s2_obs = None if self.s2 is None else np.asarray(
            self.s2, dtype=self.dtype
        )
        for idx, p in enumerate(self.posteriors):
            mu_s, var_s, info = _iterative.cg_predict(
                spec,
                np.asarray(p.hyp, dtype=self.dtype),
                X,
                y,
                s2_obs,
                np.asarray(x_star, dtype=self.dtype),
                compute_var=True,
                alpha0=(p._alpha if p._alpha is not None else None),
                **self._cg_options,
            )
            if p._alpha is None:
                p._alpha = info["alpha"]
                p.n_real = X.shape[0]
            mu[:, idx] = mu_s.ravel()
            s2[:, idx] = var_s.ravel()
        return mu, s2

    # f32 fits only: below sn2 ~ C*N*eps32*var(y) the kernel's condition
    # number exceeds 1/eps32, the f32 Cholesky cannot factorize K and the
    # in-jit jitter escalation silently acts as an unreported extra noise
    # term — the fitted noise hyperparameter then no longer means what it
    # says (its f64 NLML can be off by O(1) nats/point; measured at the
    # north-star N=16384 workload, see BASELINE.md round 3).  The floor
    # makes the fitted hyperparameters dtype-honest.  The reference has
    # no analog (f64-only, LB=log(1e-6): noise_functions.py:107).
    _F32_NOISE_FLOOR_C = 4.0
    _F32_NOISE_FLOOR_MIN_N = 4096

    def _f32_noise_floor(self, LB, UB, cov_N, options):
        """Return ``LB`` with the constant-noise lower bound raised to the
        f32 conditioning floor (no-op for f64, small N, noise functions
        without a constant term, or ``options={'f32_noise_floor': False}``).
        Only the fit-local bounds change; ``self.lower_bounds`` and the
        reference bounds ABI are untouched."""
        mode = options.get("f32_noise_floor", "auto")
        if mode is False or mode is None:
            return LB
        if self.dtype != np.float32 or self.noise.parameters[0] != 1:
            return LB
        N = 0 if self.X is None else self.X.shape[0]
        if mode == "auto" and N < self._F32_NOISE_FLOOR_MIN_N:
            return LB
        var_y = float(np.var(self.y)) if self.y is not None else 0.0
        if not np.isfinite(var_y) or var_y <= 0 or N == 0:
            return LB
        if isinstance(mode, (int, float)) and not isinstance(mode, bool):
            floor = float(mode)  # explicit log-sigma floor
        else:
            floor = 0.5 * np.log(
                self._F32_NOISE_FLOOR_C
                * N
                * float(np.finfo(np.float32).eps)
                * var_y
            )
        i_sn = cov_N
        if floor <= LB[i_sn]:
            return LB
        LB = np.array(LB, copy=True)
        LB[i_sn] = min(floor, UB[i_sn])
        return LB

    def _finish_compile_log(self):
        """Record this fit's XLA compile count/time into fit_timings
        (delta vs the snapshot taken at fit entry).  MUST run after
        the phase timings — several phases compute themselves as
        wall - sum(fit_timings.values())."""
        n, s = _compile_log.snapshot()
        n0, s0 = getattr(self, "_compile_base", (n, s))
        self.fit_timings["n_compiles"] = n - n0
        self.fit_timings["compile_s"] = round(s - s0, 3)

    def fit(
        self,
        X: np.ndarray = None,
        y: np.ndarray = None,
        s2: np.ndarray = None,
        hyp0=None,
        options: dict = None,
    ):
        """Train hyperparameters: space-filling design (batched device
        NLML) -> multistart MAP -> slice-sampled hyperposterior ->
        refreshed posteriors.  Options and defaults mirror reference
        gaussian_process.py:910-1232, plus two backend switches:

        - ``optimizer_backend``: 'device' (default; all restarts advance
          together in one jitted vmapped L-BFGS) or 'scipy' (sequential
          L-BFGS-B restarts driving the jitted value-and-grad, matching
          the reference's optimizer exactly).
        - ``sampler_backend``: 'device' (default; the whole MCMC chain is
          one XLA program) or 'host' (the parity SliceSampler driven by
          the global NumPy RNG, bit-matching the reference's algorithm).
        - ``sampler``: 'slicesample' (default, coordinate-wise slice),
          'slicelite' (same chain, plus the warm-refit ESS shortcut:
          when the previous samples' importance-weight ESS fraction
          under the new data exceeds ``ess_thresh`` (0.5), design+MAP
          are skipped and each previous sample is refreshed with a few
          no-adapt sweeps — gplite_train.m:178-197,359-390; previous
          log posteriors via ``hyp0_logp`` or auto-carried between
          fits of this object), 'covsample' (random-direction slice,
          gplite_train.m:392-407), 'eissample' (ensemble slice),
          'mala', 'hmc', or 'laplace' (MAP only) — the MATLAB
          oracle's sampler menu (gplite_train.m:41,318-447).
        - ``n_chains``: run the hyperposterior MCMC as this many
          independent chains batched into one device program (sharded
          across the mesh when one is set; sequential memory-sized
          groups when the batch exceeds device HBM — see
          ``_chain_batch_hbm_estimate``).  Cross-chain Gelman-Rubin
          R-hat replaces the single-chain split diagnostic.
          ``chain_start_jitter`` (default 0.1) overdisperses the
          non-first chains' starts by that fraction of the slice
          widths, clipped to bounds (0 = all chains start at the MAP
          point).  ``chain_thin`` (default 1) collects every k-th
          sweep inside each chain: the kept-draw count (and hence the
          diagnostic sample size) is unchanged, but each kept draw is
          k sweeps apart, cutting its autocorrelation time ~k× — the
          lever for clearing the reference's eff_N >= kept/10 bar
          (slice_sample.py:632-639) when the R-hat already passes.
          ``chain_group`` caps the batched-chain group size below the
          memory-derived maximum: at compute-saturating N the batched
          eval wall is linear in the group size while lockstep
          batching pays the WORST lane's shrinkage count per move, so
          ``chain_group=1`` (fully sequential chains) is the fastest
          single-chip plan at large N (measured: see
          ``inference.sampling.chain_group_plan``).
        - ``sample_width_base`` (default True, the reference's
          behavior): the MAP-phase widths act as a geometric FLOOR on
          the end-of-burn 5*std width adaptation (reference
          slice_sample.py:535-543).  ``False`` lets the 5*std rule
          stand alone — on tight large-N hyperposteriors the floor
          holds widths at ~50 sigma (measured at the 16k north star),
          costing ~2.6x the density evals per shrinkage move;
          shrinkage-only slice moves are valid MCMC at any width, and
          the R-hat / eff_N diagnostics certify mixing either way.
        - ``outwarp_fun``: attach an output-warping function at fit
          time (the MATLAB oracle's OutwarpFun train option,
          gplite_train.m:39; the Python reference accepts but ignores
          it).  Resets bounds/priors to defaults for the new
          hyperparameter layout.
        - ``log_P`` (alias ``hyp0_logp``): log posteriors of the hyp0
          rows from the previous fit, enabling the slicelite warm-refit
          ESS shortcut (gplite_train.m LogP option).
        - ``f32_noise_floor``: 'auto' (default) raises the fit-local
          lower bound of the constant-noise hyperparameter to the f32
          conditioning floor ``0.5*log(C*N*eps32*var(y))`` for float32
          fits at N >= 4096 — below it the f32 Cholesky cannot resolve
          the kernel and jitter escalation silently acts as unreported
          noise.  ``True`` forces it at any N, ``False`` disables, a
          number pins an explicit log-sigma floor.

        Returns (hyp array, optimize_result, sampling_result).
        """
        if options is None:
            options = {}
        opts_N = options.get("opts_N", 3)
        init_N = options.get("init_N", 2**10)
        init_method = options.get("init_method", "sobol")
        thin = options.get("thin", 5)
        df_base = options.get("df_base", 7)
        widths = options.get("widths", None)
        tol_opt = options.get("tol_opt", 1e-5)
        tol_opt_mcmc = options.get("tol_opt_mcmc", 1e-3)
        sampler_name = options.get("sampler", "slicesample")
        s_N = options.get("n_samples", 10)
        burn_in = options.get("burn", thin * s_N)
        lower_bounds = options.get("lower_bounds", "current")
        upper_bounds = options.get("upper_bounds", "current")

        # Real phase timing (the reference's timers are vestigial,
        # gaussian_process.py:1094-1228) + optional jax.profiler trace.
        self.fit_timings = {}
        # Compile accounting (VERDICT r4 #7): remote compiles are
        # minutes-scale at 16k shapes; every exit path records the
        # fit's compile bill in fit_timings (see _compile_log).
        self._compile_base = _compile_log.snapshot()
        _trace_dir = options.get("trace_dir", None)
        if _trace_dir:
            import jax.profiler as _jprof

            _jprof.start_trace(str(_trace_dir))
        _t_start = time.perf_counter()

        X, y, s2 = self._convert_shapes(X, y, s2)
        if X is not None:
            self.X = X
        if y is not None:
            self.y = y
        if s2 is not None:
            self.s2 = s2
        self._invalidate()

        # Large-N pre-flight: other live GP instances' device posterior
        # factors compete with this fit's working set for HBM (measured:
        # a second 17k fit beside a live 8-sample 17k posterior dies
        # RESOURCE_EXHAUSTED in the posterior build).  Warn so the user
        # can .clean() models they are done with.
        if (
            self.X is not None
            and self.X.shape[0] >= _OTHER_GP_FACTOR_WARN_MIN_N
        ):
            other = sum(
                g._device_factor_bytes()
                for g in _LIVE_GPS
                if g is not self
            )
            if other > _OTHER_GP_FACTOR_WARN_BYTES:
                warnings.warn(
                    f"Other live GP models pin {other / 1e9:.1f} GB of "
                    "device posterior factors; a large-N fit may run "
                    "out of device memory. Call .clean() on models you "
                    "are done with to release them.",
                    stacklevel=2,
                )

        # MATLAB oracle's OutwarpFun train option (gplite_train.m:39;
        # the Python reference accepts "outwarp_fun" but ignores it,
        # gaussian_process.py:998): attach an output-warping function at
        # fit time.  The hyperparameter layout changes, so bounds /
        # priors reset to defaults for the new vector and any stale
        # posteriors are dropped.
        outwarp_fun = options.get("outwarp_fun", None)
        if outwarp_fun is not None and outwarp_fun is not self.outwarp:
            self.outwarp = outwarp_fun
            self.posteriors = None
            # Gate set_bounds' normalization recompute until the prior
            # table is re-sized to the new layout (constructor order).
            self.no_prior = None
            self.set_bounds()
            self.set_priors()

        cov_N, noise_N, _ = self._hyp_counts()

        cov_info = self.covariance.get_bounds_info(self.X, self.y)
        mean_info = self.mean.get_bounds_info(self.X, self.y)
        noise_info = self.noise.get_bounds_info(self.X, self.y)

        self.hyper_priors["df"][np.isnan(self.hyper_priors["df"])] = df_base

        use_current_bounds = (
            isinstance(lower_bounds, str)
            and lower_bounds == "current"
            and isinstance(upper_bounds, str)
            and upper_bounds == "current"
        )
        if use_current_bounds and (
            np.any(np.isnan(self.lower_bounds))
            or np.any(np.isnan(self.upper_bounds))
        ):
            self.set_bounds(
                self.get_recommended_bounds(
                    self.lower_bounds, self.upper_bounds
                )
            )
        else:
            self.set_bounds(
                self.get_recommended_bounds(lower_bounds, upper_bounds)
            )
        self._invalidate()

        LB = self.lower_bounds
        UB = self.upper_bounds
        LB = self._f32_noise_floor(LB, UB, cov_N, options)

        plb_parts = [cov_info["PLB"], noise_info["PLB"], mean_info["PLB"]]
        pub_parts = [cov_info["PUB"], noise_info["PUB"], mean_info["PUB"]]
        if self.outwarp is not None:
            ow_info = self.outwarp.get_bounds_info(self.X, self.y)
            plb_parts.append(ow_info["PLB"])
            pub_parts.append(ow_info["PUB"])
        PLB = np.concatenate(plb_parts)
        PUB = np.concatenate(pub_parts)
        PLB = np.minimum(np.maximum(PLB, LB), UB)
        PUB = np.maximum(np.minimum(PUB, UB), LB)

        if hyp0 is None:
            if self.posteriors is not None:
                hyp0 = self.get_hyperparameters(as_array=True)
            else:
                hyp0 = np.reshape(
                    np.minimum(np.maximum((PLB + PUB) / 2, LB), UB), (1, -1)
                )
        elif isinstance(hyp0, dict):
            hyp0 = self.hyperparameters_from_dict(hyp0)

        # Inference backend selection (VERDICT r2 item 3): "exact" is the
        # reference's Cholesky path; "cg" routes fitting and the stored
        # posterior through the matrix-free BBMM stack (ops/iterative.py)
        # for N past the Cholesky limit; "auto" picks by size.
        method = options.get("method", "exact")
        if method == "auto":
            N_data = 0 if self.X is None else self.X.shape[0]
            method = "cg" if N_data > options.get(
                "cg_threshold_n", 32768
            ) else "exact"
        if method == "cg":
            return _cg_fit.fit_cg_path(
                self, hyp0, LB, UB, PLB, PUB, options, tol_opt, s_N,
                _t_start, _trace_dir,
            )
        if method != "exact":
            raise ValueError(f"Unknown fit method {method!r}")
        self._infer_method = "exact"

        # --- slicelite warm-refit shortcut (gplite_train.m:178-197) ---
        # When the previous hyperposterior samples still cover the new
        # posterior well (importance-weight effective sample size above
        # ess_thresh), skip the design + MAP phases entirely and just
        # refresh each previous sample with a few no-adapt slice sweeps
        # (gplite_train.m:359-390, Nopts==0 branch: Adaptive=false,
        # starts = previous samples, Burnin = Thin_eff*Ns).  Previous
        # log-posterior values come from options['hyp0_logp'] or, when
        # hyp0 is this object's previous fit output, from the state the
        # last fit stored.
        if sampler_name == "slicelite" and s_N > 0:
            warm = _sampling.slicelite_ess(self, hyp0, options, thin)
            if warm is not None:
                return _sampling.slicelite_warm_refit(
                    self, warm, s_N, LB, UB, PLB, PUB, widths, options,
                    _t_start, _trace_dir,
                )

        if s_N > 0 and sampler_name != "laplace":
            tol = tol_opt_mcmc
        else:
            tol = tol_opt

        ## Space-filling design + multistart MAP (inference/fit_phases;
        ## fused one-program device path, split device path, or the
        ## reference-exact scipy loop per options["optimizer_backend"]).
        (
            hyp,
            nll,
            opt_results,
            opts_N,
            widths_default,
            X0_dev,
            y0_dev,
        ) = _fit_phases.design_and_map(
            self,
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
            _t_start,
        )

        if opts_N > 0:
            optimize_result = opt_results[np.argmin(nll)]
            hyp_start = hyp[np.argmin(nll), :].copy()
            f_start = float(np.min(nll))
        else:
            optimize_result = None
            hyp_start = hyp[0, :].copy()
            f_start = None

        if s_N == 0:
            hyp_start = np.reshape(hyp_start, (1, -1))
            self.update(hyp=hyp_start)
            self.fit_timings["posterior_s"] = (
                time.perf_counter() - _t_start
                - sum(self.fit_timings.values())
            )
            self._finish_compile_log()
            if _trace_dir:
                _jprof.stop_trace()
            return hyp_start, optimize_result, None

        ## Slice sampling of the hyperposterior
        ## (inference/sampling.py; the validation precedes the factor
        ## release inside run_sampling — a bad 'sampler' must not leave
        ## a previously usable GP without factors).
        if sampler_name not in (
            "slicesample",
            "slicelite",
            "covsample",
            "eissample",
            "mala",
            "hmc",
        ):
            raise ValueError("Unknown sampler!")
        if widths is None:
            widths = widths_default
        else:
            widths = np.minimum(widths, widths_default)
        sampling_result, thin = _sampling.run_sampling(
            self,
            sampler_name=sampler_name,
            options=options,
            s_N=s_N,
            thin=thin,
            burn_in=burn_in,
            widths=widths,
            hyp_start=hyp_start,
            f_start=f_start,
            # Candidate pool for the non-finite-start fallback: the
            # fused program keeps its sorted design device-resident
            # with objective values already evaluated.
            cand=X0_dev if X0_dev is not None else hyp,
            cand_vals=y0_dev if X0_dev is not None else None,
            LB=LB,
            UB=UB,
        )

        hyp_pre_thin = sampling_result["samples"]
        hyp = hyp_pre_thin[thin - 1 :: thin, :]
        self.fit_timings["sample_s"] = (
            time.perf_counter() - _t_start
            - sum(self.fit_timings.values())
        )
        _sampling.store_warm_state(self, hyp, sampling_result, thin, widths)

        self.update(hyp=hyp)
        self.fit_timings["posterior_s"] = (
            time.perf_counter() - _t_start
            - sum(self.fit_timings.values())
        )
        self._finish_compile_log()
        if _trace_dir:
            _jprof.stop_trace()
        return hyp, optimize_result, sampling_result

    # ------------------------------------------------------------------
    # Likelihood / posterior evaluations
    # ------------------------------------------------------------------

    def log_likelihood(self, hyp, compute_grad: bool = False):
        """(Positive) log marginal likelihood at ``hyp`` (array or dict),
        optionally with gradient."""
        if isinstance(hyp, dict):
            hyp = self.hyperparameters_from_dict(hyp)
        hyp = np.asarray(hyp, dtype=np.float64).reshape(-1)
        fns, args = self._obj_args()
        h = hyp  # host-side; jit folds the upload into the dispatch
        if compute_grad:
            v, g = fns["nlz_grad"](h, *args)
            return -float(v), -np.asarray(g)
        return -float(fns["nlz"](h, *args))

    def log_posterior(self, hyp, compute_grad: bool = False):
        """(Positive) unnormalized log posterior (lml + log prior)."""
        if isinstance(hyp, dict):
            hyp = self.hyperparameters_from_dict(hyp)
        hyp = np.asarray(hyp, dtype=np.float64).reshape(-1)
        if self.no_prior:
            return self.log_likelihood(hyp, compute_grad)
        if compute_grad:
            v, g = self._objective(hyp, grad=True)
            return -v, -g
        return -self._objective(hyp)

    # ------------------------------------------------------------------
    # Reference-private-API shims.  The reference's own test suite
    # reaches its name-mangled internals directly (testing/
    # test_gaussian_process.py:338-385) — partly because the public
    # ``log_likelihood(compute_grad=True)`` is broken upstream (negates
    # a tuple).  Exposing the same mangled names with the same sign
    # conventions lets that suite run against this package unchanged.
    # ------------------------------------------------------------------

    def __compute_nlZ(self, hyp, compute_grad, compute_prior):
        """Negative log marginal likelihood (minus log prior when
        ``compute_prior``); reference gaussian_process.py:1520-1538."""
        out = (
            self.log_posterior(hyp, compute_grad)
            if compute_prior
            else self.log_likelihood(hyp, compute_grad)
        )
        if compute_grad:
            return -out[0], -np.asarray(out[1])
        return -out

    def __compute_log_priors(self, hyp, compute_grad):
        """Log hyperprior (and gradient); reference
        gaussian_process.py:1275-1466."""
        from .core.priors import log_prior as _log_prior

        hyp = np.asarray(hyp, dtype=np.float64).reshape(-1)
        _, _, _, _, pack = self._device()
        if pack is None:
            if compute_grad:
                return 0.0, np.zeros(hyp.shape)
            return 0.0
        if compute_grad:
            v, g = jax.value_and_grad(lambda h: _log_prior(pack, h))(
                jnp.asarray(hyp)
            )
            return float(v), np.asarray(g)
        return float(_log_prior(pack, jnp.asarray(hyp)))

    # ------------------------------------------------------------------
    # Prediction
    # ------------------------------------------------------------------

    def _posterior_arrays(self):
        """Internal device-side factor access for the predictive core:
        returns ``(get(name, idx) -> stacked array, X_use, n_real)``.

        Posteriors built by this GP store padded device factors; the
        matching padded X comes from the device context.  If any
        posterior was mutated through the public true-size ABI (or the
        factor shapes no longer match the context), fall back to the
        true-size views with an unpadded X."""
        spec, fns, args, Xj, pack = self._device()
        ps = list(self.posteriors)
        uniform = (
            all(not p._direct and p._L is not None for p in ps)
            and len({p._L.shape[0] for p in ps}) == 1
        )
        padded = (
            uniform
            and args is not None
            and args[0].shape[0] == ps[0]._L.shape[0]
        )
        X_use = args[0] if padded else Xj
        n_real = self.X.shape[0]

        def one(name, i):
            v = getattr(ps[i], "_" + name) if padded else getattr(ps[i], name)
            return jnp.asarray(v, dtype=self.dtype)

        cache = getattr(self, "_stack_cache", None)
        if cache is None:
            cache = self._stack_cache = {}

        def get(name, idx):
            # Memoize the stacked factors: an eager jnp.stack is a device
            # round trip per call on the remote tunnel, and the factors
            # only change when posteriors are rebuilt or mutated — which
            # replaces the underlying arrays, detected here by identity.
            idx_t = tuple(idx)
            srcs = [
                getattr(ps[i], "_" + name)
                if padded
                else getattr(ps[i], name)
                for i in idx_t
            ]
            key = tuple(map(id, srcs))
            hit = cache.get((name, idx_t, padded))
            if hit is not None and hit[0] == key:
                return hit[1]
            stacked = jnp.stack(
                [jnp.asarray(v, dtype=self.dtype) for v in srcs]
            )
            # Keep refs to the sources so their id()s stay unambiguous.
            cache[(name, idx_t, padded)] = (key, stacked, srcs)
            return stacked

        return get, one, X_use, n_real

    def _group_predict(self, x_star, full=False):
        """Run the vmapped predictive core, grouping posterior samples by
        parametrization flag.  Returns (mu (M,s), s2 (M,s)) or with
        ``full`` (mu (M,s), cov (s,M,M))."""
        if self.posteriors is not None and any(
            getattr(p, "matrix_free", False) for p in self.posteriors
        ):
            if full:
                raise ValueError(
                    "Full-covariance prediction is unsupported with "
                    "matrix-free (method='cg') posteriors."
                )
            return self._cg_serve(x_star)

        spec = self._spec()
        pfns = _predict_fns(spec)
        s_N = self.posteriors.size
        M = x_star.shape[0]
        # Test points stay host-side; jit uploads them as part of each
        # dispatch.  A separate jnp.asarray upload costs a full tunnel
        # round trip (~40 ms) before the dispatch even starts.
        xsh = np.asarray(x_star, dtype=self.dtype)

        mu = np.zeros((M, s_N))
        if full:
            cov = np.zeros((s_N, M, M))
        else:
            s2 = np.zeros((M, s_N))

        if self.y is None:
            hyps = np.stack([p.hyp for p in self.posteriors]).astype(
                self.dtype
            )
            if full:
                mu_b, v_b = pfns["prior_full"](hyps, xsh)
                mu[:] = np.asarray(mu_b).T
                cov[:] = np.asarray(v_b)
                return mu, cov
            packed = np.asarray(pfns["prior_packed"](hyps, xsh))
            mu[:] = packed[0].T
            s2[:] = packed[1].T
            return mu, s2

        get_stacked, get_one, Xj, n_real = self._posterior_arrays()

        groups = {True: [], False: []}
        for idx, p in enumerate(self.posteriors):
            groups[bool(p.L_chol)].append(idx)

        N = self.X.shape[0]
        # Chunk the test points so the live (s_N, N, chunk) cross-covariance
        # working set stays bounded (~2 GB f64); the reference materializes
        # the full N x M matrix per sample instead
        # (gaussian_process.py:1746).  Full-covariance requests need the
        # whole M x M block, so they are never chunked.
        if full:
            chunk = M
        else:
            # The Cholesky-path triangular solve materializes XLA temps
            # of ~n_row_blocks * N * chunk elements, so it needs smaller
            # chunks than the matmul-only inverse path.  Measured on
            # v5e at N=16k/s=8: chol chunk 1024 -> 5685 pts/s (best),
            # 512 -> 4823; inv chunk 2048 -> 3097.
            all_inv = all(not p.L_chol for p in self.posteriors)
            mxu_serve = self._mxu_predict_on(M, Xj.shape[0])
            # MXU path: chunk 4096 measured best at N=16k/S=8 (2048:
            # 9.4k pts/s, 4096: 14.1k, 8192: 9.5k — mxu_serving.py
            # sweep); the trsm temps that forced small chunks are gone.
            if mxu_serve:
                default_budget = 2**29
            else:
                default_budget = 2**28 if all_inv else 2**27
            budget_elems = getattr(
                self, "_predict_chunk_budget", default_budget
            )
            chunk = int(max(1, min(M, budget_elems // max(1, s_N * N))))
            # Align to the TPU lane width when chunking actually happens.
            if chunk < M and chunk > 128:
                chunk = (chunk // 128) * 128

        # Stacking copies every factor: at large N run per-sample
        # (the jitted branch takes each device-resident L by reference).
        no_stack = not self._stack_budget_ok(s_N, N)

        # The fused Pallas cross-covariance applies to the single-sample
        # serving path (f32, gradient-free); everything else stays XLA.
        # On non-TPU backends it engages only in interpreter mode (the
        # wiring test), never compiled.
        pallas = self.pallas_predict and self.dtype == np.float32
        if pallas and jax.default_backend() != "tpu":
            from .ops import pallas_kernels as _pk

            pallas = _pk.INTERPRET

        if self.mesh is not None and not full:
            # Multi-chip serving: shard the test points over the mesh
            # (factors replicated — they are the smaller operand at
            # large M).  One dispatch + one packed pull per sample.
            ndev = int(self.mesh.devices.size)
            Mp = -(-M // ndev) * ndev
            xs_p = (
                np.concatenate(
                    [xsh, np.repeat(xsh[-1:], Mp - M, axis=0)]
                )
                if Mp > M
                else xsh
            )
            mxu_mesh = self._mxu_predict_on(M, Xj.shape[0])
            for idx, p in enumerate(self.posteriors):
                fn = _predict_sharded_fn(
                    spec, bool(p.L_chol), self.mesh, pallas, mxu_mesh
                )
                packed = np.asarray(
                    fn(
                        np.asarray(p.hyp, dtype=self.dtype),
                        get_one("alpha", idx),
                        get_one("L", idx),
                        get_one("sW", idx),
                        Xj,
                        n_real,
                        xs_p,
                    )
                )
                mu[:, idx] = packed[0][:M]
                s2[:, idx] = packed[1][:M]
            return mu, s2

        if no_stack:
            if full:
                # Full covariance never chunks; single dispatch/sample.
                pfns_one = _predict_fns(spec, pallas)
                for idx, p in enumerate(self.posteriors):
                    key = ("chol" if p.L_chol else "inv") + "_full_one"
                    mu_b, v_b = pfns_one[key](
                        np.asarray(p.hyp, dtype=self.dtype),
                        get_one("alpha", idx),
                        get_one("L", idx),
                        get_one("sW", idx),
                        Xj,
                        n_real,
                        xsh,
                    )
                    mu[:, idx] = np.asarray(mu_b)
                    cov[idx] = np.asarray(v_b)
                return mu, cov

            # Pad M once; the chunk loop runs on device (lax.map): one
            # dispatch per sample, not per (sample, chunk).
            n_chunks = -(-M // chunk)
            pad = n_chunks * chunk - M
            xs_p = (
                np.concatenate([xsh, np.repeat(xsh[-1:], pad, axis=0)])
                if pad
                else xsh
            )
            for idx, p in enumerate(self.posteriors):
                fn = _predict_chunked_fn(
                    spec, bool(p.L_chol), chunk, pallas, mxu_serve
                )
                packed = np.asarray(
                    fn(
                        np.asarray(p.hyp, dtype=self.dtype),
                        get_one("alpha", idx),
                        get_one("L", idx),
                        get_one("sW", idx),
                        Xj,
                        n_real,
                        xs_p,
                    )
                )
                mu[:, idx] = packed[0][:M]
                s2[:, idx] = packed[1][:M]
            return mu, s2

        mixed = bool(groups[True]) and bool(groups[False]) and not full
        if mixed:
            # One program for both parametrization groups (see
            # _predict_fns.mixed_branch): a second group call would pay
            # another full dispatch+pull round trip.
            groups = {None: list(range(s_N))}
        for flag, idxs in groups.items():
            if not idxs:
                continue
            hyps = np.stack(
                [self.posteriors[i].hyp for i in idxs]
            ).astype(self.dtype)
            # Factors stay on device (jnp.asarray is a no-op for device
            # arrays of the right dtype; np fallbacks still upload).
            alphas = get_stacked("alpha", idxs)
            Ls = get_stacked("L", idxs)
            sWs = get_stacked("sW", idxs)
            if mixed:
                key = "mixed_packed"
                flags_arr = np.array(
                    [bool(self.posteriors[i].L_chol) for i in idxs]
                )
            else:
                key = "chol" if flag else "inv"
                key += "_full" if full else "_packed"

            for start in range(0, M, chunk):
                stop = min(start + chunk, M)
                xs_c = xsh[start:stop]
                if stop - start < chunk:
                    # Pad the tail chunk to the compiled shape.
                    pad = chunk - (stop - start)
                    xs_c = np.concatenate(
                        [xs_c, np.repeat(xs_c[-1:], pad, axis=0)]
                    )
                if full:
                    mu_b, v_b = pfns[key](
                        hyps, alphas, Ls, sWs, Xj, n_real, xs_c
                    )
                    mu_b = np.asarray(mu_b)[:, : stop - start]
                    v_b = np.asarray(v_b)
                else:
                    call_args = (hyps, alphas, Ls, sWs, Xj, n_real, xs_c)
                    if mixed:
                        call_args = (flags_arr,) + call_args
                    packed = np.asarray(pfns[key](*call_args))
                    mu_b = packed[0][:, : stop - start]
                    v_b = packed[1]
                for j, idx in enumerate(idxs):
                    mu[start:stop, idx] = mu_b[j]
                    if full:
                        cov[idx] = v_b[j]
                    else:
                        s2[start:stop, idx] = v_b[j][: stop - start]

        if full:
            return mu, cov
        return mu, s2

    def predict_full(
        self,
        x_star: np.ndarray,
        y_star: np.ndarray = None,
        s2_star: np.ndarray = None,
        add_noise: bool = False,
    ):
        """Posterior mean and full covariance per hyperparameter sample:
        mu (M, s_N), cov (M, M, s_N)."""
        if self.outwarp is not None:
            raise ValueError(
                "Full-covariance prediction is unsupported with output "
                "warping."
            )
        x_star, y_star, s2_star = self._convert_shapes(
            x_star, y_star, s2_star
        )
        cov_N, noise_N, _ = self._hyp_counts()
        s_N = self.posteriors.size
        N_star = x_star.shape[0]

        mu, cov = self._group_predict(x_star, full=True)

        if add_noise:
            for s in range(s_N):
                hyp = self.posteriors[s].hyp
                sn2_mult = self.posteriors[s].sn2_mult
                if sn2_mult is None:
                    sn2_mult = 1
                sn2_star = self.noise.compute(
                    hyp[cov_N : cov_N + noise_N], x_star, y_star, s2_star
                )
                # Observation noise is DIAGONAL.  The reference's
                # `np.dot(np.eye(N), sn2_star)` (gaussian_process.py:
                # 1659) silently broadcasts an (N,1) heteroskedastic
                # sn2 across every column of the covariance; correct
                # the inherited bug here (scalar sn2 is unaffected).
                sn2_diag = np.broadcast_to(
                    np.ravel(sn2_star), (N_star,)
                )
                cov[s, :, :] += np.diag(sn2_diag * sn2_mult)

        return mu, cov.transpose(1, 2, 0)

    def predict(
        self,
        x_star: np.ndarray,
        y_star: np.ndarray = None,
        s2_star: np.ndarray = None,
        add_noise: bool = False,
        separate_samples: bool = False,
        return_lpd: bool = False,
    ):
        """Posterior mean and variance at ``x_star``; samples are either
        returned separately (M, s_N) or reduced as a Gaussian mixture
        (reference gaussian_process.py:1793-1811)."""
        x_star, y_star, s2_star = self._convert_shapes(
            x_star, y_star, s2_star
        )
        s_N = self.posteriors.size
        cov_N, noise_N, _ = self._hyp_counts()

        if return_lpd and y_star is None:
            raise ValueError(
                "Cannot calculate log predictive density without y_star."
            )

        mu, s2 = self._group_predict(x_star, full=False)
        s2 = np.maximum(s2, 0)  # clamp numerical negatives

        if return_lpd or add_noise:
            y_s2 = np.zeros_like(s2)
            for s in range(s_N):
                hyp = self.posteriors[s].hyp
                sn2_mult = self.posteriors[s].sn2_mult
                if sn2_mult is None:
                    sn2_mult = 1
                sn2_star = self.noise.compute(
                    hyp[cov_N : cov_N + noise_N], x_star, y_star, s2_star
                )
                y_s2[:, s : s + 1] = s2[:, s : s + 1] + np.reshape(
                    sn2_star * sn2_mult * np.ones((x_star.shape[0], 1)),
                    (-1, 1),
                )

        if return_lpd and self.outwarp is not None:
            # BEYOND the oracle (gplite_pred.m:107 errors here): under
            # output warping the per-sample predictive is Gaussian in
            # WARPED space, so the density of the original observation
            # follows by change of variables,
            #   lpd_s(y*) = log N(g_s(y*); mu_s, y_s2_s) + log g_s'(y*),
            # with each sample's own warp hyperparameters.  The mixture
            # reduction is the exact log-mean-density (a moment-matched
            # single Gaussian is incoherent across samples here — each
            # sample warps y* differently).
            ow_N = self._outwarp_N()
            lpd_s = np.zeros((x_star.shape[0], s_N))
            for s in range(s_N):
                hyp_ow = self.posteriors[s].hyp[-ow_N:]
                yw, dw = self.outwarp.compute(
                    hyp_ow, y_star, compute_grad=True
                )
                v = y_s2[:, s : s + 1]
                lpd_s[:, s : s + 1] = (
                    -0.5 * (yw - mu[:, s : s + 1]) ** 2 / v
                    - 0.5 * np.log(2 * np.pi * v)
                    + np.log(np.abs(dw))
                )
            if separate_samples:
                lpd = lpd_s
            else:
                lpd = np.reshape(
                    sp.special.logsumexp(lpd_s, axis=1) - np.log(s_N),
                    (-1, 1),
                )
        elif return_lpd and separate_samples:
            lpd = -0.5 * (y_star - mu) ** 2 / y_s2 - 0.5 * np.log(
                2 * np.pi * y_s2
            )

        if self.outwarp is not None:
            # Back-transform per sample (gplite_pred.m:113-130): the
            # latent mean is inverse-warped; variances divide by the
            # squared warp slope at the back-transformed mean.  With
            # add_noise the observed mean stays in warped space
            # (gplite_pred.m:118, oracle behavior preserved).
            ow_N = self._outwarp_N()
            for s in range(s_N):
                hyp_ow = self.posteriors[s].hyp[-ow_N:]
                fmu = self.outwarp.compute(
                    hyp_ow, mu[:, s : s + 1], inverse=True
                )
                _, dwarp = self.outwarp.compute(
                    hyp_ow, fmu, compute_grad=True
                )
                s2[:, s : s + 1] = s2[:, s : s + 1] / dwarp**2
                if add_noise:
                    y_s2[:, s : s + 1] = y_s2[:, s : s + 1] / dwarp**2
                else:
                    mu[:, s : s + 1] = fmu

        if add_noise:
            s2 = y_s2

        if not separate_samples:
            if s_N > 1:
                mu_bar = np.reshape(np.sum(mu, 1), (-1, 1)) / s_N
                v = np.sum((mu - mu_bar) ** 2, 1) / (s_N - 1)
                s2 = np.reshape(np.sum(s2, 1) / s_N + v, (-1, 1))
                mu = mu_bar
            else:
                v = 0
                mu = np.reshape(mu, (-1, 1))
                s2 = np.reshape(s2, (-1, 1))

            if return_lpd and self.outwarp is not None:
                pass  # already the exact mixture density (above)
            elif return_lpd and add_noise:
                lpd = -0.5 * (y_star - mu) ** 2 / s2 - 0.5 * np.log(
                    2 * np.pi * s2
                )
            elif return_lpd:
                y_s2 = np.reshape(np.sum(y_s2, 1) / s_N + v, (-1, 1))
                lpd = -0.5 * (y_star - mu) ** 2 / y_s2 - 0.5 * np.log(
                    2 * np.pi * y_s2
                )

        if return_lpd:
            return mu, s2, lpd
        return mu, s2

    # ------------------------------------------------------------------
    # Bayesian quadrature
    # ------------------------------------------------------------------

    def quad(
        self,
        mu,
        sigma,
        compute_var: bool = False,
        separate_samples: bool = False,
    ):
        """Closed-form integral of the GP against Gaussian measures
        N(mu, sigma^2) — squared exponential kernel only (reference
        gaussian_process.py:1818-1981)."""
        if not isinstance(self.covariance, _cov_mod.SquaredExponential):
            raise ValueError(
                "Bayesian quadrature only supports the squared exponential "
                "kernel."
            )
        if self.outwarp is not None:
            raise ValueError(
                "Bayesian quadrature is unsupported with output warping."
            )
        self._require_factors("Bayesian quadrature")
        if not isinstance(
            self.mean,
            (
                _mean_mod.ZeroMean,
                _mean_mod.ConstantMean,
                _mean_mod.NegativeQuadratic,
            ),
        ):
            # Same supported set as the reference's closed forms
            # (gaussian_process.py:1898-1946).
            raise ValueError(
                "Bayesian quadrature supports zero, constant, and "
                "negative-quadratic mean functions only."
            )

        D = self.D
        N_s = np.size(self.posteriors)

        if np.size(mu) == 1:
            mu = np.tile(mu, (1, D))
        mu = np.atleast_2d(np.asarray(mu, dtype=np.float64))
        N_star = mu.shape[0]
        if np.size(sigma) == 1:
            sigma = np.tile(sigma, (1, D))
        sigma = np.atleast_2d(np.asarray(sigma, dtype=np.float64))

        # Whole sample batch in one device dispatch per parametrization
        # group (the reference loops samples on the host with SciPy
        # solves; this is PyVBMC's ELBO hot path).
        spec = self._spec()
        qfns = _quad_fns(spec)
        get_stacked, _, X_use, n_real = self._posterior_arrays()
        # Integration points and hyps stay host-side (uploads fold into
        # the dispatch; eager jnp.asarray costs a tunnel round trip).
        muh = np.asarray(mu, dtype=self.dtype)
        sigmah = np.asarray(sigma, dtype=self.dtype)
        hyps_all = np.stack([p.hyp for p in self.posteriors]).astype(
            self.dtype
        )

        # Multi-chip: shard the integration points over the mesh, padded
        # to the device count (factors replicated — the predict design).
        mesh = self.mesh
        if mesh is not None:
            ndev = int(mesh.devices.size)
            if sigmah.shape[0] == 1 and N_star > 1:
                sigmah = np.ascontiguousarray(
                    np.broadcast_to(sigmah, (N_star, sigmah.shape[1]))
                )
            Mp = -(-N_star // ndev) * ndev
            if Mp > N_star:
                muh = np.concatenate(
                    [muh, np.repeat(muh[-1:], Mp - N_star, axis=0)]
                )
                sigmah = np.concatenate(
                    [sigmah, np.repeat(sigmah[-1:], Mp - N_star, axis=0)]
                )

        def _quad_call(key, *args):
            if mesh is None:
                return qfns[key](*args)
            out = _quad_sharded_fn(spec, key, mesh)(*args)
            return out[..., :N_star]  # drop mesh padding

        F = np.zeros((N_star, N_s))
        if compute_var:
            F_var = np.zeros((N_star, N_s))
            groups = {True: [], False: []}
            for i, p in enumerate(self.posteriors):
                groups[bool(p.L_chol)].append(i)
            if groups[True] and groups[False]:
                # Mixed parametrizations: one program, where-selected
                # per sample (a second group call costs a full round
                # trip).
                groups = {None: list(range(N_s))}
            for flag, idxs in groups.items():
                if not idxs:
                    continue
                mults = np.array(
                    [self.posteriors[i].sn2_mult for i in idxs],
                    dtype=np.float64,
                )
                call_args = (
                    hyps_all[idxs],
                    get_stacked("alpha", idxs),
                    get_stacked("L", idxs),
                    mults,
                    X_use,
                    n_real,
                    muh,
                    sigmah,
                )
                if flag is None:
                    key = "mixed_var_packed"
                    flags_arr = np.array(
                        [bool(self.posteriors[i].L_chol) for i in idxs]
                    )
                    call_args = (flags_arr,) + call_args
                else:
                    key = "chol_var_packed" if flag else "inv_var_packed"
                packed = np.asarray(
                    _quad_call(key, *call_args), dtype=np.float64
                )
                for j, i in enumerate(idxs):
                    F[:, i] = packed[0, j]
                    F_var[:, i] = packed[1, j]
        else:
            idxs = list(range(N_s))
            F_b = _quad_call(
                "mean",
                hyps_all,
                get_stacked("alpha", idxs),
                X_use,
                n_real,
                muh,
                sigmah,
            )
            F[:] = np.asarray(F_b, dtype=np.float64).T

        if N_s > 1 and not separate_samples:
            F_bar = np.reshape(np.sum(F, 1), (-1, 1)) / N_s
            if compute_var:
                Fss_var = np.sum((F - F_bar) ** 2, 1) / (N_s - 1)
                F_var = np.reshape(
                    np.sum(F_var, 1) / N_s + Fss_var, (-1, 1)
                )
            F = F_bar

        if compute_var:
            return F, F_var
        return F

    # ------------------------------------------------------------------
    # Random function draws
    # ------------------------------------------------------------------

    def random_function(self, X_star: np.ndarray, add_noise: bool = False):
        """Draw one random function from the GP at ``X_star`` (one
        posterior sample chosen uniformly; robust Cholesky of the
        predictive covariance).  The covariance build, factorization and
        affine transform run as one device program (_random_fns); the
        host only draws the randomness (reference
        gaussian_process.py:2241-2329)."""
        N_star = X_star.shape[0]
        N_s = np.size(self.posteriors)
        cov_N, noise_N, _ = self._hyp_counts()
        if self.y is not None:
            self._require_factors("random_function")

        s = np.random.randint(0, N_s)

        hyp = self.posteriors[s].hyp
        rfns = _random_fns(self._spec())
        # Host-side args: jit folds the uploads into the dispatch
        # (eager jnp.asarray costs a tunnel round trip per array).
        hyp_j = np.asarray(hyp, dtype=self.dtype)
        xsj = np.asarray(X_star, dtype=self.dtype)
        zr = np.random.standard_normal((N_star, 1)).astype(self.dtype)

        if self.y is None:
            f_star = np.asarray(rfns["prior"](hyp_j, xsj, zr))
        else:
            _, get_one, X_use, n_real = self._posterior_arrays()
            fn = rfns["chol" if self.posteriors[s].L_chol else "inv"]
            f_star = np.asarray(
                fn(
                    hyp_j,
                    get_one("alpha", s),
                    get_one("L", s),
                    get_one("sW", s),
                    X_use,
                    n_real,
                    xsj,
                    zr,
                )
            )

        if add_noise:
            sn2 = self.noise.compute(
                hyp[cov_N : cov_N + noise_N], X_star, None, None
            )
            sn2_mult = self.posteriors[s].sn2_mult
            if sn2_mult is None:
                sn2_mult = 1
            y_star = f_star + np.sqrt(
                sn2 * sn2_mult
            ) * np.random.standard_normal(size=f_star.shape)
            return y_star
        return f_star

    # ------------------------------------------------------------------
    # Checkpointing (the reference has no serialization; SURVEY.md
    # section 5: the hyperparameter samples ARE the checkpointable
    # state — factors rebuild exactly via update(compute_posterior=True),
    # the same contract as clean()).
    # ------------------------------------------------------------------

    def save(self, path):
        """Serialize the GP to an ``.npz`` file.

        Stores data, bounds, priors and hyperparameter samples; the
        O(N^2) posterior factors are NOT stored (they are reconstructed
        exactly on load, mirroring the clean()/update round trip verified
        against reference testing/test_gaussian_process.py:254-299).
        """
        p = self.noise.parameters
        if self.mean._kind.startswith("custom:"):
            raise ValueError(
                "GPs with a CustomMean cannot be serialized: the user "
                "callable is not representable in the .npz metadata. "
                "Reconstruct the GP (re-registering the mean) and "
                "restore hyperparameters via update(hyp=...)."
            )
        meta = {
            "D": self.D,
            "cov_kind": self.covariance._kind,
            "mean_kind": self.mean._kind,
            "noise_parameters": np.asarray(p),
            "dtype": str(self.dtype),
            "no_prior": (
                -1 if self.no_prior is None else int(self.no_prior)
            ),
            "outwarp_kind": (
                "" if self.outwarp is None else self.outwarp._kind
            ),
            "fast_predict": int(self.fast_predict),
            "infer_method": int(self._infer_method == "cg"),
        }
        arrays = {f"meta_{k}": v for k, v in meta.items()}
        for name in ("X", "y", "s2"):
            v = getattr(self, name)
            if v is not None:
                arrays[name] = v
        arrays["lower_bounds"] = self.lower_bounds
        arrays["upper_bounds"] = self.upper_bounds
        for k, v in self.hyper_priors.items():
            arrays[f"prior_{k}"] = v
        if self.posteriors is not None:
            arrays["hyp"] = self.get_hyperparameters(as_array=True)
            arrays["has_factors"] = np.asarray(
                self.posteriors[0].alpha is not None
            )
        np.savez_compressed(path, **arrays)

    @classmethod
    def load(cls, path):
        """Reconstruct a GP saved with :meth:`save` (posterior factors
        are recomputed on device)."""
        from . import (
            covariance_functions as cf,
            isotropic_covariance_functions as icf,
            mean_functions as mf,
            noise_functions as nf,
        )

        z = np.load(path, allow_pickle=False)
        kind = str(z["meta_cov_kind"])
        iso = kind.endswith("_iso")
        base = kind[:-4] if iso else kind
        if base == "se":
            cov = icf.SquaredExponentialIsotropic() if iso else cf.SquaredExponential()
        elif base in ("m1", "m3", "m5"):
            deg = int(base[1])
            cov = icf.MaternIsotropic(deg) if iso else cf.Matern(deg)
        elif base == "rq":
            cov = cf.RationalQuadraticARD()
        else:  # pragma: no cover - future kinds
            raise ValueError(f"Unknown covariance kind {kind}")
        mean = {
            "zero": mf.ZeroMean,
            "const": mf.ConstantMean,
            "negquad": mf.NegativeQuadratic,
            "linear": mf.LinearMean,
            "quad": mf.QuadraticMean,
            "posquad": mf.PositiveQuadratic,
            "se_mean": mf.SquaredExponentialMean,
            "negse_mean": mf.NegativeSquaredExponentialMean,
        }[str(z["meta_mean_kind"])]()
        pnoise = z["meta_noise_parameters"]
        noise = nf.GaussianNoise(
            constant_add=bool(pnoise[0] == 1),
            user_provided_add=bool(pnoise[1] == 1),
            scale_user_provided=bool(pnoise[1] == 2),
            rectified_linear_output_dependent_add=bool(pnoise[2] == 1),
        )
        outwarp = None
        if "meta_outwarp_kind" in z and str(z["meta_outwarp_kind"]):
            from . import outwarp_functions as owf

            outwarp = {
                "negpow": owf.NegativePower,
                "negpowc1": owf.NegativePowerC1,
                "negscaledpow": owf.NegativeScaledPower,
            }[str(z["meta_outwarp_kind"])]()
        gp = cls(
            D=int(z["meta_D"]),
            covariance=cov,
            mean=mean,
            noise=noise,
            dtype=np.dtype(str(z["meta_dtype"])),
            outwarp=outwarp,
            fast_predict=bool(
                int(z["meta_fast_predict"])
                if "meta_fast_predict" in z
                else 0
            ),
        )
        for name in ("X", "y", "s2"):
            if name in z:
                setattr(gp, name, z[name])
        gp.lower_bounds = z["lower_bounds"]
        gp.upper_bounds = z["upper_bounds"]
        gp.hyper_priors = {
            k[len("prior_"):]: z[k] for k in z.files if k.startswith("prior_")
        }
        no_prior = int(z["meta_no_prior"])
        gp.no_prior = None if no_prior == -1 else bool(no_prior)
        if gp.no_prior is not None:
            gp._GP__recompute_normalization_constants()
        if "meta_infer_method" in z and int(z["meta_infer_method"]):
            # Matrix-free (CG) posteriors rebuild lazily at predict —
            # never run the O(N^3) factorization on a large-N CG fit.
            gp._infer_method = "cg"
        if "hyp" in z:
            # Matrix-free (CG) fits must rebuild matrix-free posteriors
            # regardless of has_factors: their alpha cache is lazy, so
            # a GP saved before its first predict reports "no factors"
            # — but update(compute_posterior=True) on the cg method
            # only builds O(N)-cheap matrix-free tags, never the O(N^3)
            # factorization.
            gp.update(
                hyp=z["hyp"],
                compute_posterior=(
                    bool(z["has_factors"]) or gp._infer_method == "cg"
                )
                and gp.X is not None
                and gp.y is not None,
            )
        return gp

    # ------------------------------------------------------------------
    # Extras from the MATLAB gplite oracle (absent from the Python
    # reference port; SURVEY.md section 5 "MATLAB-only features")
    # ------------------------------------------------------------------

    def predict_quantile(
        self,
        q,
        x_star: np.ndarray,
        y_star: np.ndarray = None,
        s2_star: np.ndarray = None,
        observed: bool = True,
        nx: int = 10,
    ):
        """Quantile prediction of the mixture predictive distribution.

        Port of matlab/gplite/gplite_qpred.m:1-49: each hyperparameter
        sample's Gaussian predictive is discretized on an ``nx``-point
        norminv grid; quantiles ``q`` are taken across the pooled grid.

        Parameters
        ----------
        q : float or array
            Quantile level(s) in (0, 1).
        observed : bool
            True: quantiles of predicted observations y (with noise);
            False: of the latent function f (gplite_qpred.m type 'y'/'f').

        Returns
        -------
        (M, len(q)) array of quantiles (squeezed to (M,) for scalar q).
        """
        x_star, y_star, s2_star = self._convert_shapes(
            x_star, y_star, s2_star
        )
        xx = sp.stats.norm.ppf(
            np.linspace(0.5 / nx, 1 - 0.5 / nx, nx)
        )
        if self.outwarp is None:
            mu, s2 = self.predict(
                x_star,
                y_star,
                s2_star,
                add_noise=observed,
                separate_samples=True,
            )
        else:
            # Warped GP: the per-sample predictive is Gaussian in the
            # WARPED space; build the grid there and inverse-warp it
            # once per sample (gplite_qpred.m:40-46).  _group_predict
            # returns latent moments before the back-transform.
            mu, s2 = self._group_predict(x_star, full=False)
            s2 = np.maximum(s2, 0)
            if observed:
                cov_N, noise_N, _ = self._hyp_counts()
                for s in range(np.size(self.posteriors)):
                    p = self.posteriors[s]
                    sn2_star = self.noise.compute(
                        p.hyp[cov_N : cov_N + noise_N],
                        x_star,
                        y_star,
                        s2_star,
                    )
                    mult = 1 if p.sn2_mult is None else p.sn2_mult
                    s2[:, s : s + 1] = s2[:, s : s + 1] + np.reshape(
                        sn2_star * mult * np.ones((x_star.shape[0], 1)),
                        (-1, 1),
                    )
        # (M, s_N, nx) grid of representative points, pooled over samples.
        grid = mu[:, :, None] + np.sqrt(np.maximum(s2, 0))[:, :, None] * xx
        if self.outwarp is not None:
            ow_N = self._outwarp_N()
            for s in range(grid.shape[1]):
                hyp_ow = self.posteriors[s].hyp[-ow_N:]
                grid[:, s, :] = self.outwarp.compute(
                    hyp_ow, grid[:, s, :], inverse=True
                )
        grid = grid.reshape(x_star.shape[0], -1)
        out = np.quantile(grid, np.atleast_1d(q), axis=1).T
        return out[:, 0] if np.isscalar(q) else out

    def _mixture_mean_variance_fn(self):
        """Jittable (x (D,) -> (mu, s2)) mixture predictive, built from
        the current stacked posterior factors (device arrays)."""
        # Matrix-free (CG) posteriors have no stacked factors; fail
        # with the same clear message quad/random_function raise
        # instead of a jnp.asarray(None) TypeError deep in stacking.
        self._require_factors("fmin/sample surrogate optimization")
        spec = self._spec()
        pfns = _predict_fns(spec)
        get_stacked, _, Xj, n_real = self._posterior_arrays()
        groups = {True: [], False: []}
        for idx, p in enumerate(self.posteriors):
            groups[bool(p.L_chol)].append(idx)
        packed = []
        for flag, idxs in groups.items():
            if not idxs:
                continue
            packed.append(
                (
                    pfns["chol"] if flag else pfns["inv"],
                    jnp.asarray(
                        np.stack([self.posteriors[i].hyp for i in idxs]),
                        dtype=self.dtype,
                    ),
                    get_stacked("alpha", idxs),
                    get_stacked("L", idxs),
                    get_stacked("sW", idxs),
                )
            )
        s_N = np.size(self.posteriors)

        def mu_s2(x):
            xs = jnp.reshape(x, (1, -1)).astype(Xj.dtype)
            mus, s2s = [], []
            for fn, hyps, alphas, Ls, sWs in packed:
                m, v = fn(hyps, alphas, Ls, sWs, Xj, n_real, xs)
                mus.append(m[:, 0])
                s2s.append(v[:, 0])
            mu_all = jnp.concatenate(mus)
            s2_all = jnp.maximum(jnp.concatenate(s2s), 0.0)
            mu_bar = jnp.mean(mu_all)
            if s_N > 1:
                v = jnp.sum((mu_all - mu_bar) ** 2) / (s_N - 1)
            else:
                v = 0.0
            return mu_bar, jnp.mean(s2_all) + v

        return mu_s2

    def fmin(self, x0=None, max_flag: bool = False, n_starts: int = 3):
        """Find the global minimum (or maximum) of the GP posterior mean.

        Port of matlab/gplite/gplite_fmin.m:1-75: multistart bounded
        optimization of the mixture predictive mean inside
        [min(X) - 10*diam, max(X) + 10*diam], starting from the best
        training point plus random high-posterior-density points; runs
        as one batched device optimization.

        Returns (x (D,), fval).
        """
        X, y = self.X, self.y
        D = X.shape[1]
        diam = np.max(X, axis=0) - np.min(X, axis=0)
        LB = np.min(X, axis=0) - 10 * diam
        UB = np.max(X, axis=0) + 10 * diam

        order = np.argsort(y.ravel())
        if max_flag:
            order = order[::-1]
        starts = [] if x0 is None else [np.atleast_2d(x0)]
        starts.append(X[order[:1], :])
        rest = X[order[1:], :]
        n_hpd = int(np.ceil(rest.shape[0] * 0.5))
        need = max(n_starts, len(starts)) - len(starts)
        if need > 0 and n_hpd > 0:
            idx = np.random.permutation(n_hpd)[: min(need, n_hpd)]
            starts.append(rest[idx, :])
        starts = np.concatenate(starts, axis=0)

        mu_s2 = self._mixture_mean_variance_fn()
        sign = -1.0 if max_flag else 1.0

        def obj(x):
            return sign * mu_s2(x)[0]

        xs, fs, _ = _map_optimize.multistart_map(
            obj, starts, LB, UB, tol=1e-8
        )
        best = int(np.argmin(fs))
        fval = fs[best] * sign
        return xs[best], float(fval)

    def sample(
        self,
        n_samples: int,
        x0=None,
        log_prior=None,
        beta: float = 0.0,
        var_thresh: float = np.inf,
        bounds=None,
        key=None,
    ):
        """Draw samples from the density exp(GP posterior mean) via
        slice sampling on the surrogate surface.

        Port of matlab/gplite/gplite_sample.m:1-119 (slicesample branch):
        the target is the mixture predictive mean, optionally penalized
        by predictive uncertainty (``beta`` * sqrt(s2) lower-confidence
        and the VarThresh clamp of log_gpfun, gplite_sample.m:108-118).
        The chain runs fully on device; ``log_prior`` (a jittable
        function) is added to the target.

        Returns (n_samples, D) array.
        """
        X, y = self.X, self.y
        D = X.shape[1]
        widths = np.std(X, axis=0, ddof=0)
        if bounds is None:
            diam = np.max(X, axis=0) - np.min(X, axis=0)
            LB = np.min(X, axis=0) - 10 * diam
            UB = np.max(X, axis=0) + 10 * diam
        else:
            LB, UB = np.asarray(bounds[0]), np.asarray(bounds[1])

        if x0 is None:
            x0 = X[int(np.argmax(y.ravel())), :]
        x0 = np.minimum(np.maximum(np.ravel(x0), LB), UB)

        mu_s2 = self._mixture_mean_variance_fn()
        use_s2 = np.isfinite(var_thresh) or beta != 0

        def log_f(x):
            mu, s2 = mu_s2(x)
            if use_s2:
                mu = jnp.where(
                    s2 >= var_thresh, mu - (s2 - var_thresh), mu
                )
                mu = mu - beta * jnp.sqrt(s2)
            if log_prior is not None:
                mu = mu + log_prior(x)
            return mu

        if key is None:
            key = jax.random.key(int(np.random.randint(0, 2**31 - 1)))
        res, _ = _device_slice.sample(
            log_f,
            x0,
            key,
            widths=widths,
            LB=LB,
            UB=UB,
            n_samples=n_samples,
            burn=int(np.ceil(n_samples / 10)),
        )
        return res["samples"]

    # ------------------------------------------------------------------
    # Plotting
    # ------------------------------------------------------------------

    def _plot_line_inputs(self, dim, lo, hi, n, anchor):
        """Grid along one input dimension with the others held at the
        anchor point; returns (ticks (n,), points (n, D))."""
        ticks = np.linspace(lo, hi, n)
        if self.D == 1:
            return ticks, ticks[:, None]
        base = anchor if anchor is not None else np.zeros(self.D)
        pts = np.broadcast_to(base, (n, self.D)).copy()
        pts[:, dim] = ticks
        return ticks, pts

    def plot(
        self,
        x0: np.ndarray = None,
        lb: np.ndarray = None,
        ub: np.ndarray = None,
        delta_y: float = None,
        max_min_flag: bool = True,
    ):
        """D x D panel plot of the GP posterior (visual contract of
        reference gaussian_process.py:1985-2215, original layout code):
        the diagonal shows 1-D predictive profiles (mean +/- 1.96 SD)
        along each dimension through ``x0``; above the diagonal,
        predictive-mean contours for each input pair; below, predictive
        SD contours.  ``delta_y`` zooms each axis to the region where
        the mean stays within ``delta_y`` of its value at ``x0``."""
        import matplotlib.pyplot as plt

        D = self.D
        if lb is not None or ub is not None:
            delta_y = None

        # Default plot ranges: data box widened by the RMS-averaged
        # posterior lengthscale per dimension.
        ell2 = np.stack(
            [np.exp(2.0 * p.hyp[:D]) for p in self.posteriors], axis=0
        )
        reach = np.sqrt(np.mean(ell2, axis=0))
        if self.X is not None:
            lo = np.min(self.X, axis=0) - reach
            hi = np.max(self.X, axis=0) + reach
        else:
            lo, hi = -reach, reach
        if lb is not None:
            lo = np.asarray(lb, dtype=np.float64).copy()
        if ub is not None:
            hi = np.asarray(ub, dtype=np.float64).copy()

        if x0 is None and self.X is not None and self.y is not None:
            pick = np.argmax if max_min_flag else np.argmin
            x0 = self.X[pick(self.y.ravel())]

        fig, axes = plt.subplots(
            D,
            D,
            squeeze=False,
            gridspec_kw={"wspace": 0.28, "hspace": 0.28},
        )
        n_line = 1000
        n_grid = 100

        # Diagonal: 1-D profiles (with optional delta_y auto-zoom).
        for i in range(D):
            ax = axes[i][i]
            ticks, pts = self._plot_line_inputs(i, lo[i], hi[i], n_line, x0)
            fmu, fs2 = self.predict(pts, add_noise=False)
            if delta_y is not None and x0 is not None:
                mu0, _ = self.predict(np.atleast_2d(x0), add_noise=False)
                near = np.abs(fmu.ravel() - mu0.ravel()[0]) < delta_y
                step = ticks[1] - ticks[0]
                if near.any():
                    sel = np.nonzero(near)[0]
                    lo[i] = ticks[sel[0]] - 0.5 * step
                    hi[i] = ticks[sel[-1]] + 0.5 * step
                else:
                    lo[i] = x0[i] - 0.5 * step
                    hi[i] = x0[i] + 0.5 * step
                ticks, pts = self._plot_line_inputs(
                    i, lo[i], hi[i], n_line, x0
                )
                fmu, fs2 = self.predict(pts, add_noise=False)
            band = 1.96 * np.sqrt(fs2.ravel())
            ax.plot(ticks, fmu.ravel(), color="k", linewidth=1)
            for sign in (-1.0, 1.0):
                ax.plot(
                    ticks,
                    fmu.ravel() + sign * band,
                    color=(0.8, 0.8, 0.8),
                    linewidth=1,
                )
            ax.set_xlim(lo[i], hi[i])
            ax.spines["top"].set_visible(False)
            ax.spines["right"].set_visible(False)
            if x0 is not None:
                ax.axvline(x0[i], color="k", linewidth=1)
            if D == 1:
                ax.set_xlabel("x")
                ax.set_ylabel("y")
                if self.X is not None and self.y is not None:
                    ax.scatter(self.X, self.y, color="blue")

        # Off-diagonal pairs: mean contours above, SD contours below.
        for i in range(D):
            for j in range(i):
                gx = np.linspace(lo[j], hi[j], n_grid)
                gy = np.linspace(lo[i], hi[i], n_grid)
                GX, GY = np.meshgrid(gx, gy)
                base = x0 if x0 is not None else np.zeros(D)
                pts = np.broadcast_to(base, (n_grid * n_grid, D)).copy()
                pts[:, j] = GX.ravel()
                pts[:, i] = GY.ravel()
                fmu, fs2 = self.predict(pts, add_noise=False)

                panels = (
                    (axes[i][j], np.sqrt(fs2)),  # lower: SD
                    (axes[j][i], fmu),  # upper: mean
                )
                for k, (ax, field) in enumerate(panels):
                    Z = field.reshape(n_grid, n_grid)
                    if k == 0:
                        ax.contour(GX, GY, Z)
                        xlim, ylim = (lo[j], hi[j]), (lo[i], hi[i])
                        sx, sy, cx, cy = j, i, None, None
                        if x0 is not None:
                            cx, cy = x0[j], x0[i]
                    else:
                        ax.contour(GY.T, GX.T, Z.T)
                        xlim, ylim = (lo[i], hi[i]), (lo[j], hi[j])
                        sx, sy = i, j
                        cx = cy = None
                        if x0 is not None:
                            cx, cy = x0[i], x0[j]
                    ax.set_xlim(*xlim)
                    ax.set_ylim(*ylim)
                    ax.spines["top"].set_visible(False)
                    ax.spines["right"].set_visible(False)
                    if self.X is not None:
                        ax.scatter(
                            self.X[:, sx], self.X[:, sy], color="blue", s=10
                        )
                    if cx is not None:
                        ax.axvline(cx, color="k", linewidth=1)
                        ax.axhline(cy, color="k", linewidth=1)

        # Edge labels.
        if D > 1:
            for i in range(D):
                axes[i][0].set_ylabel(rf"$x_{i + 1}$")
                axes[D - 1][i].set_xlabel(rf"$x_{i + 1}$")

        plt.show()
        return fig

    # ------------------------------------------------------------------
    # Shapes
    # ------------------------------------------------------------------

    def _convert_shapes(
        self,
        X: Union[np.ndarray, None],
        y: Union[np.ndarray, None],
        s2: Union[np.ndarray, float, int, None],
    ):
        """Normalize user inputs to the canonical (N, D) / (N, 1)
        layouts (reference gaussian_process.py:2523-2565 semantics: a
        1-D X is a single point, y/s2 columns follow X's row count, a
        scalar s2 broadcasts)."""
        if X is None and y is None and s2 is None:
            return None, None, None

        if X is None:
            # Row count comes from the stored data.
            if not hasattr(self.X, "shape"):
                raise AttributeError(
                    f"self.X is not a numpy array, self.X = {self.X}"
                )
            N = self.X.shape[0]
        else:
            X = np.atleast_2d(np.asarray(X))
            if X.ndim > 2:
                raise AssertionError("X need to be an array of shape (N, D)")
            N = X.shape[0]
            if X.shape[1] != self.D:
                raise AssertionError(
                    f"The dimension of input data {X.shape[1]}"
                    f"doesn't match GP's input dimension {self.D}."
                )

        if y is not None:
            y = np.asarray(y).reshape(N, 1)

        if isinstance(s2, (float, int)):
            s2 = np.full((N, 1), float(s2))
        elif isinstance(s2, np.ndarray):
            s2 = s2.reshape(N, 1)
        elif s2 is not None:
            raise TypeError(
                "s2 type need to be Union[np.ndarray, float, int, None]."
            )
        return X, y, s2


