"""Batch-size sweep of the headline NLML+grad program (bench.py shape).

bench.py measures batched NLML+grad throughput at N=4096, D=8, B=8.
B is a free protocol choice: the framework genuinely evaluates wide
hyperparameter batches (the 1024-candidate design ranking, multistart
MAP, chain groups), so if a wider batch amortizes per-dispatch overhead
and fills the MXU better, the honest headline is the faster one.  This
sweeps B and prints evals/s per B; HBM sizing caps the sweep (each
batched eval holds ~5 live (B, N, N) f32 copies — 0.34 GB per lane at
N=4096, so B=32 is ~11 GB of 15.75).

Run: python benchmarks/headline_batch_sweep.py  (real TPU)
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

from gpyreg_tpu.core.model import ModelSpec
from gpyreg_tpu.core.nlml import nlz

N, D = 4096, 8
BS = (4, 8, 16, 32)


def main():
    global N
    if "--smoke" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        N = 256
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    rng = np.random.default_rng(0)
    X = rng.normal(size=(N, D)).astype(np.float32)
    y = (
        np.sum(np.sin(X), axis=1, keepdims=True)
        + 0.1 * rng.normal(size=(N, 1))
    ).astype(np.float32)

    @jax.jit
    def batch_nlml_grad(hyps, X, y):
        f = lambda h: nlz(spec, h, X, y, None)
        return jax.vmap(jax.value_and_grad(f))(hyps)

    rows = []
    for B in BS:
        hyps = (
            0.05 * rng.normal(size=(B, spec.hyp_N))
        ).astype(np.float32)
        v, g = batch_nlml_grad(hyps, X, y)
        jax.block_until_ready((v, g))
        float(np.asarray(v).ravel()[0])  # tunnel sync
        best = 0.0
        n_iter = max(4, 160 // B)  # ~same evals per round across B
        for r in range(3):
            t0 = time.perf_counter()
            for i in range(n_iter):
                v, g = batch_nlml_grad(
                    hyps + np.float32(1e-4 * (r * n_iter + i)), X, y
                )
            jax.block_until_ready((v, g))
            elapsed = time.perf_counter() - t0
            float(np.asarray(v).ravel()[0])
            best = max(best, B * n_iter / elapsed)
        rows.append({"B": B, "evals_per_sec": round(best, 2)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"sweep": rows, "N": N, "D": D}))


if __name__ == "__main__":
    main()
