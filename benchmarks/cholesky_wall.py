"""Forward-Cholesky wall study (VERDICT r2 item 2).

The NLML+grad headline is forward-factorization-bound.  Measures the
forward candidates on the real chip:

  native    — lax.linalg.cholesky (batched)
  recursive — ops.linalg.recursive_cholesky (all-matmul panel solves)
  blocked   — ops.linalg.blocked_cholesky (right-looking, native trsm)

Tunnel-aware measurement: each candidate is timed as ONE device program
that lax.scans over R diagonal-jitter variants and reduces each factor
to a scalar (sum log diag) — per-dispatch latency, async-dispatch
artifacts and identical-dispatch memoization (CLAUDE.md) all cancel;
reported time = program_time / R.

Run: python benchmarks/cholesky_wall.py [B N]
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gpyreg_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from gpyreg_tpu.ops import linalg as L

R = 8  # scan repetitions per timing program


@partial(jax.jit, static_argnames=("B", "N"))
def make_spd_device(B, N):
    key = jax.random.key(0)
    X = jax.random.normal(key, (N, 8), dtype=jnp.float32)
    d2 = (
        jnp.sum(X**2, 1)[:, None]
        + jnp.sum(X**2, 1)[None, :]
        - 2.0 * (X @ X.T)
    )
    K = jnp.exp(-0.5 * d2 / 2.25) + 1e-3 * jnp.eye(N, dtype=jnp.float32)
    return jnp.broadcast_to(K, (B, N, N))


def make_timed(chol_fn):
    @jax.jit
    def run(G, epss):
        eye = jnp.eye(G.shape[-1], dtype=G.dtype)

        def body(c, e):
            Lc = chol_fn(G + e * eye)
            s = jnp.sum(
                jnp.log(jnp.diagonal(Lc, axis1=-2, axis2=-1))
            )
            return c + s, s

        tot, outs = lax.scan(body, jnp.float32(0), epss)
        return tot, outs

    return run


def main():
    shapes = [(8, 4096), (2, 8192), (1, 16384)]
    if len(sys.argv) == 3:
        shapes = [(int(sys.argv[1]), int(sys.argv[2]))]
    for (B, N) in shapes:
        G = jax.block_until_ready(make_spd_device(B, N))
        print(json.dumps({"setup": f"B={B} N={N}"}), flush=True)
        cands = {
            "native": lambda g: jax.lax.linalg.cholesky(
                g, symmetrize_input=False
            ),
            "recursive_1024": lambda g: L.recursive_cholesky(
                g, base=1024
            ),
            "recursive_1024_hi3": lambda g: L.recursive_cholesky(
                g, base=1024, precision=jax.lax.Precision.HIGH
            ),
            "blocked_2048": lambda g: L.blocked_cholesky(g, block=2048),
        }
        epss = jnp.asarray(
            1e-6 * np.arange(2, 2 + R), dtype=jnp.float32
        )
        ref = None
        flops = B * N**3 / 3
        for name, fn in cands.items():
            try:
                timed = make_timed(fn)
                jax.block_until_ready(timed(G, epss))  # compile
                t0 = time.perf_counter()
                tot, outs = timed(G, epss)
                jax.block_until_ready(tot)
                t = (time.perf_counter() - t0) / R
                outs = np.asarray(outs)
            except Exception as e:
                print(
                    json.dumps({"B": B, "N": N, "cand": name,
                                "err": type(e).__name__}),
                    flush=True,
                )
                continue
            if ref is None:
                ref = outs
                err = 0.0
            else:
                err = float(np.max(np.abs(outs - ref) / np.abs(ref)))
            print(
                json.dumps(
                    {
                        "B": B,
                        "N": N,
                        "cand": name,
                        "ms": round(t * 1e3, 2),
                        "tflops": round(flops / t / 1e12, 1),
                        "logdet_rel_err": float(f"{err:.2e}"),
                    }
                ),
                flush=True,
            )
        del G


if __name__ == "__main__":
    main()
