"""CG panel-build study: XLA composition vs fused Pallas cross tile.

The matrix-free tier's wall-clock is dominated by kernel-panel
rebuilds (every CG iteration / Lanczos step is one full pass over the
implicit N x N operator).  Round 5 routes the forward-only matvec
passes through the one-pass Pallas cross tile
(ops/iterative._cross_pallas_ok); this measures both builds — panel
build alone and full matvec — at the 65k production shape.

Run: python benchmarks/panel_build_bench.py [--n N] [--chunk C]
One JSON line per measurement (best-of-4 rounds of a
scan-over-varying-inputs program, scalar-pull sync — CLAUDE.md).
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

from gpyreg_tpu.core.model import ModelSpec
from gpyreg_tpu.ops import iterative as it

R = 4
ROUNDS = 4


def main():
    N, chunk, D, B = 65536, 2048, 4, 9
    if "--n" in sys.argv:
        N = int(sys.argv[sys.argv.index("--n") + 1])
    if "--chunk" in sys.argv:
        chunk = int(sys.argv[sys.argv.index("--chunk") + 1])
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    rng = np.random.default_rng(0)
    X = rng.normal(size=(N, D)).astype(np.float32)
    V = rng.normal(size=(N, B)).astype(np.float32)
    sn2 = np.full((N,), 0.01, dtype=np.float32)
    hyp_cov = np.concatenate([np.full(D, 0.3), [0.0]]).astype(np.float32)

    @partial(jax.jit, static_argnames=("pallas",))
    def timed(hyp_cov, X, V, sn2, epss, pallas: bool):
        def body(c, e):
            out = it._panel_matvec(
                spec, hyp_cov + e, X, V, sn2, chunk, pallas=pallas
            )
            return c + jnp.sum(out[0]), c

        tot, _ = lax.scan(body, jnp.float32(0), epss)
        return tot

    for pallas in (False, True):
        epss = np.asarray(1e-4 * np.arange(1, 1 + R), dtype=np.float32)
        jax.block_until_ready(timed(hyp_cov, X, V, sn2, epss, pallas))
        best = np.inf
        for r in range(ROUNDS):
            ep = epss + np.float32(1e-6 * r)
            t0 = time.perf_counter()
            tot = timed(hyp_cov, X, V, sn2, ep, pallas)
            val = float(np.asarray(tot))
            best = min(best, (time.perf_counter() - t0) / R)
        elems = N * N
        print(json.dumps({
            "what": "panel_matvec",
            "pallas": pallas,
            "N": N,
            "chunk": chunk,
            "rhs": B,
            "ms_per_pass": round(best * 1e3, 1),
            "kernel_gels_per_s": round(elems / best / 1e9, 1),
            "check": val,
        }), flush=True)


if __name__ == "__main__":
    main()
