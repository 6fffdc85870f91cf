"""Measure the fused Pallas kernel build across the kernel zoo on the
real TPU: batched NLML+grad throughput per family, fused vs the XLA
composition (GPYREG_TPU_NO_FUSED_KERNEL-equivalent control via
FUSED_MIN_N).

Round-3 context: the fused custom-VJP build (ops/pallas_kernels.
kernel_self_fused) was SE-only when first measured (129.8 -> 137.4
evals/s on the headline); this run checks the generalization to
Matern/RQ/isotropic actually pays on hardware before it ships as the
default dispatch.

Run me alone (one TPU process at a time).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import gpyreg_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from gpyreg_tpu.core.model import ModelSpec
from gpyreg_tpu.core.nlml import nlz
import gpyreg_tpu.ops.pallas_kernels as PK

N, D, B = 4096, 8, 8


def measure(cov, fused):
    spec = ModelSpec(
        D=D, cov=cov, mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(N, D)), dtype=jnp.float32)
    y = jnp.asarray(
        np.sum(np.sin(np.asarray(X)), axis=1, keepdims=True)
        + 0.1 * rng.normal(size=(N, 1)),
        dtype=jnp.float32,
    )
    hyps = jnp.asarray(
        0.05 * rng.normal(size=(B, spec.hyp_N)), dtype=jnp.float32
    )

    old_gate = PK.FUSED_MIN_N
    PK.FUSED_MIN_N = 2048 if fused else 10**9
    try:
        @jax.jit
        def batch_nlml_grad(hyps, X, y):
            f = lambda h: nlz(spec, h, X, y, None)
            return jax.vmap(jax.value_and_grad(f))(hyps)

        v, g = batch_nlml_grad(hyps, X, y)
        jax.block_until_ready((v, g))

        best = 0.0
        n_iter = 20
        for r in range(3):
            t0 = time.perf_counter()
            for i in range(n_iter):
                v, g = batch_nlml_grad(
                    hyps + 1e-4 * (r * n_iter + i), X, y
                )
            jax.block_until_ready((v, g))
            best = max(best, B * n_iter / (time.perf_counter() - t0))
    finally:
        PK.FUSED_MIN_N = old_gate
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--covs", nargs="*",
        default=["m5", "rq", "se_iso", "m3"],
    )
    args = ap.parse_args()
    out = {}
    for cov in args.covs:
        f = measure(cov, fused=True)
        x = measure(cov, fused=False)
        out[cov] = {
            "fused_evals_per_sec": round(f, 1),
            "xla_evals_per_sec": round(x, 1),
            "speedup": round(f / x, 3),
        }
        print(json.dumps({cov: out[cov]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
