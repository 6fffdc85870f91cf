"""MFU table for the four headline device programs (VERDICT r3 #7).

Turns the repeated "at the roofline" claims into checkable numbers:
effective TFLOP/s and % of v5e peak for

  kbuild  fused Pallas self-covariance build  (N=16384, D=10, f32)
  chol    forward Cholesky, XLA native        (N=16384, f32)
  vgrad   NLML value_and_grad (fwd + matmul adjoint)
  serve   MXU serving matmul tri_lower_matmul(W, sW*Ks) (M=4096 chunk)

Methodology = benchmarks/chain_eval_profile.py: each program is one
scan-over-R-varying-inputs dispatch, best-of-4 rounds, every round
ended by a scalar value pull (block_until_ready is not a sync barrier
through the tunnel, CLAUDE.md).

FLOP models (per eval; counted once in one place so the table is
auditable):
  kbuild : 2*N^2*D          (the distance matmul; the exp/profile map
                             is O(N^2) and HBM-bound — GB/s also shown)
  chol   : N^3/3
  vgrad  : N^3/3 fwd Cholesky + N^3/3 tri_inv + 2*N^3/3
           sym_tri_product = 4*N^3/3 (K-build/solve terms < 1%)
  serve  : N^2*M            (triangular-aware, half the dense 2*N^2*M)

Peaks (v5e): 197 TFLOP/s bf16 MXU; f32 accumulation paths run bf16x3
(Precision.HIGH ~= 1/2 bf16 rate) or bf16x6 (HIGHEST ~= 1/3): the
table reports % of the 197 bf16 peak AND % of the precision-adjusted
ceiling the program actually targets.  HBM peak 819 GB/s.

Run: python benchmarks/mfu_table.py  (real TPU)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gpyreg_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from gpyreg_tpu.core import nlml
from gpyreg_tpu.core.model import ModelSpec, cov_matrix
from gpyreg_tpu.ops import linalg

N, D, M, R = 16384, 10, 4096, 8
PEAK_BF16 = 197e12
PEAK_HBM = 819e9
# Precision-adjusted MXU ceilings for f32-accumulation matmul paths.
CEIL = {"bf16": PEAK_BF16, "hi": PEAK_BF16 / 2, "hi3": PEAK_BF16 / 3}


def timed(fn, args_fn, rounds=4):
    """Best-of-``rounds`` of one scan-over-R-inputs dispatch; every
    round ends with a scalar pull (see chain_eval_profile.timed)."""
    out = fn(*args_fn(-1))
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])
    best = np.inf
    for r in range(rounds):
        args = args_fn(r)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
        float(np.asarray(out).ravel()[0])
    return best / R


def main():
    global N, M
    if "--smoke" in sys.argv:  # CPU-sized script check (timings not valid)
        jax.config.update("jax_platforms", "cpu")
        N, M = 512, 128
    rng = np.random.default_rng(0)
    X = rng.normal(size=(N, D)).astype(np.float32)
    y = np.sum(np.sin(X), axis=1, keepdims=True).astype(np.float32)
    y += 0.1 * rng.normal(size=(N, 1)).astype(np.float32)
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    n_hyp = D + 3
    hyps = (
        np.concatenate([np.zeros(D), [0.0], [-1.0], [0.0]])[None, :]
        + 0.02 * rng.normal(size=(R, n_hyp))
    ).astype(np.float32)

    rows = []

    def emit(name, sec, flops, ceil_key, extra=None):
        eff = flops / sec
        row = {
            "program": name,
            "ms": round(sec * 1e3, 1),
            "eff_tflops": round(eff / 1e12, 1),
            "pct_bf16_peak": round(100 * eff / PEAK_BF16, 1),
            "ceil": ceil_key,
            "pct_ceiling": round(100 * eff / CEIL[ceil_key], 1),
        }
        if extra:
            row.update(extra)
        rows.append(row)
        print(json.dumps(row), flush=True)

    # --- 1. fused K build (production cov path; Pallas at f32 16k) ---
    @jax.jit
    def kbuild_scan(hs):
        def body(c, h):
            K = cov_matrix(spec, h[: D + 1], X)
            # Consume a full row + diag so nothing is DCE-able.
            return c + jnp.sum(K[0]) + jnp.sum(jnp.diagonal(K)), None

        return lax.scan(body, jnp.float32(0), hs)[0]

    t = timed(kbuild_scan, lambda r: (hyps + np.float32(1e-4) * (r + 2),))
    emit(
        "kbuild", t, 2 * N * N * D, "bf16",
        {
            "hbm_gbps": round(N * N * 4 / t / 1e9, 1),
            "pct_hbm_peak": round(100 * (N * N * 4 / t) / PEAK_HBM, 1),
        },
    )

    # --- 2. forward Cholesky (XLA native, the chain-phase floor) ---
    G0 = jax.block_until_ready(
        jax.jit(lambda h: nlml.assemble(spec, h, X, y, None, None)[0])(
            hyps[0]
        )
    )
    jits = np.float32(1.0) + 1e-4 * np.arange(R, dtype=np.float32)

    @jax.jit
    def chol_scan(G, js):
        def body(c, j):
            Lc = jnp.linalg.cholesky(G + j * jnp.eye(N, dtype=G.dtype))
            return c + Lc[0, 0], None

        return lax.scan(body, jnp.float32(0), js)[0]

    t = timed(
        chol_scan, lambda r: (G0, jits + np.float32(1e-5) * (r + 2))
    )
    emit("chol", t, N**3 / 3, "bf16")

    # --- 3. NLML value_and_grad (fwd + fused matmul adjoint) ---
    @jax.jit
    def vgrad_scan(hs):
        def body(c, h):
            v, g = jax.value_and_grad(
                lambda hh: nlml.nlz(spec, hh, X, y, None, None)
            )(h)
            return c + v + jnp.sum(g), None

        return lax.scan(body, jnp.float32(0), hs)[0]

    t = timed(vgrad_scan, lambda r: (hyps + np.float32(1e-4) * (r + 2),))
    emit("vgrad", t, 4 * N**3 / 3, "hi3")

    # --- 4. MXU serving matmul: tri_lower_matmul(W, sW*Ks) chunk ---
    W0 = jax.block_until_ready(
        jax.jit(lambda G: linalg.tri_inv(jnp.linalg.cholesky(G)))(G0)
    )
    Ks0 = jax.block_until_ready(
        jax.jit(
            lambda k: jax.random.normal(k, (N, M), dtype=jnp.float32)
        )(jax.random.key(1))
    )
    scales = np.float32(1.0) + 1e-3 * np.arange(R, dtype=np.float32)

    @jax.jit
    def serve_scan(W, Ks, ss):
        def body(c, s):
            V = linalg.tri_lower_matmul(W, Ks * s)
            return c + V[0, 0] + jnp.sum(V[:, 0]), None

        return lax.scan(body, jnp.float32(0), ss)[0]

    t = timed(
        serve_scan,
        lambda r: (W0, Ks0, scales + np.float32(1e-4) * (r + 2)),
    )
    emit("serve", t, N * N * M, "hi")

    print(json.dumps({"mfu_table": rows, "N": N, "D": D, "M": M}))


if __name__ == "__main__":
    main()
