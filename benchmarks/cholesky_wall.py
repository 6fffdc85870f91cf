"""Forward-Cholesky wall study (VERDICT r2 item 2).

The NLML+grad headline is forward-factorization-bound: XLA's native TPU
Cholesky runs a sequential panel algorithm far below the MXU roofline.
This script measures, on the real chip, the three forward candidates at
the headline shape (B=8, N=4096, f32) and the north-star shape
(N=8192/16384):

  native    — lax.linalg.cholesky (batched)
  blocked   — ops.linalg.blocked_cholesky (right-looking, native trsm)
  recursive — ops.linalg.recursive_cholesky (all-matmul panel solves)

plus the end-to-end NLML+grad eval rate with the winner wired in.
Prints one JSON line per config.  Run: python benchmarks/cholesky_wall.py
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

from gpyreg_tpu.ops import linalg as L


def make_spd(B, N, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(N, 8)).astype(np.float64)
    d2 = np.sum((X[:, None, :] - X[None, :, :]) ** 2, axis=-1)
    K = np.exp(-0.5 * d2 / 1.5**2) + 1e-3 * np.eye(N)
    K = np.broadcast_to(K, (B, N, N)).astype(dtype)
    return jnp.asarray(K)


def bench(fn, arg, n_iter=10, n_warm=2):
    for _ in range(n_warm):
        out = fn(arg)
        jax.block_until_ready(out)
    ts = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = fn(arg)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    results = []
    for (B, N, iters) in [(8, 4096, 10), (8, 8192, 5), (1, 16384, 5)]:
        G = make_spd(B, N)
        cands = {
            "native": jax.jit(
                lambda g: jax.lax.linalg.cholesky(
                    g, symmetrize_input=False
                )
            ),
            "blocked_1024": jax.jit(
                lambda g: L.blocked_cholesky(g, block=1024)
            ),
            "blocked_2048": jax.jit(
                lambda g: L.blocked_cholesky(g, block=2048)
            ),
            "recursive_512": jax.jit(
                lambda g: L.recursive_cholesky(g, base=512)
            ),
            "recursive_1024": jax.jit(
                lambda g: L.recursive_cholesky(g, base=1024)
            ),
            "recursive_2048": jax.jit(
                lambda g: L.recursive_cholesky(g, base=2048)
            ),
            "recursive_1024_high": jax.jit(
                lambda g: L.recursive_cholesky(
                    g, base=1024, precision=jax.lax.Precision.HIGH
                )
            ),
        }
        row = {"B": B, "N": N}
        ref = None
        for name, fn in cands.items():
            try:
                t, out = bench(fn, G, n_iter=iters)
            except Exception as e:  # OOM etc.
                row[name] = f"ERR {type(e).__name__}"
                continue
            out = np.asarray(out[0])
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(
                    np.max(np.abs(np.tril(out) - np.tril(ref)))
                    / max(1e-30, float(np.max(np.abs(ref))))
                )
            flops = B * N**3 / 3
            row[name] = {
                "ms": round(t * 1e3, 2),
                "tflops": round(flops / t / 1e12, 1),
                "rel_err_vs_native": float(f"{err:.2e}"),
            }
        results.append(row)
        print(json.dumps(row), flush=True)


def lax_chol(g):
    return jax.lax.linalg.cholesky(g, symmetrize_input=False)


if __name__ == "__main__":
    main()
