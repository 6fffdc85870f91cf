"""NLML-adjoint G^{-1} strategy study (VERDICT r4 #3).

The round-4 MFU table puts the value_and_grad program at 48% of its
bf16x6 ceiling with ~10 (N, N) HBM passes per eval through the adjoint
chain (tri_inv -> sym_tri_product -> cotangent assembly).  This
measures, on the real chip:

  1. the G^{-1}-from-L component alone for every _GINV_MODE strategy
     (ops/linalg._ginv_from_chol_f32), at the headline shape and the
     north-star shape;
  2. the full NLML value_and_grad headline program per strategy
     (bench.py protocol: B=8, N=4096, D=8 ARD-SE, scan over varying
     inputs, best-of-4 rounds, scalar-pull sync).

Run: python benchmarks/adjoint_bench.py [--modes m1,m2] [--skip-e2e]
One JSON line per measurement.
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
from gpyreg_tpu.core.nlml import nlz
from gpyreg_tpu.ops import linalg as LA

R = 8  # scan repetitions per timing program
ROUNDS = 4
MODES = ("compose", "gram", "gram_nodbl", "dense")


@partial(jax.jit, static_argnames=("B", "N"))
def make_chol_device(B, N):
    key = jax.random.key(0)
    X = jax.random.normal(key, (N, 8), dtype=jnp.float32)
    d2 = (
        jnp.sum(X**2, 1)[:, None]
        + jnp.sum(X**2, 1)[None, :]
        - 2.0 * (X @ X.T)
    )
    K = jnp.exp(-0.5 * d2 / 2.25) + 1e-3 * jnp.eye(N, dtype=jnp.float32)
    L = lax.linalg.cholesky(
        jnp.broadcast_to(K, (B, N, N)), symmetrize_input=False
    )
    return L


def time_component(mode, Lfac, B, N):
    """One scan-over-R-variants program: G^{-1} of a diagonally
    perturbed factor, reduced to a scalar.  Fresh jitted fn per mode
    (the _GINV_MODE switch is read at trace time)."""
    LA._GINV_MODE = mode

    @jax.jit
    def run(Lf, epss):
        eye = jnp.eye(Lf.shape[-1], dtype=Lf.dtype)

        def body(c, e):
            Gi = LA._ginv_from_chol_f32(Lf + e * eye)
            return c + jnp.sum(jnp.diagonal(Gi, axis1=-2, axis2=-1)), c

        tot, _ = lax.scan(body, jnp.float32(0), epss)
        return tot

    epss = jnp.asarray(1e-5 * np.arange(2, 2 + R), dtype=jnp.float32)
    jax.block_until_ready(run(Lfac, epss))  # compile
    best = np.inf
    val = None
    for r in range(ROUNDS):
        ep = epss + np.float32(1e-7 * r)
        t0 = time.perf_counter()
        tot = run(Lfac, ep)
        val = float(np.asarray(tot))  # scalar pull = honest sync
        t = (time.perf_counter() - t0) / R
        best = min(best, t)
    # ~2N^3/3 useful flops (tri_inv N^3/3 + gram N^3/3; dense pays 3x
    # on the product but the USEFUL flop count is held fixed so the
    # numbers compare as throughput of the same mathematical job).
    flops = B * 2 * N**3 / 3
    return {
        "what": "ginv_component",
        "mode": mode,
        "B": B,
        "N": N,
        "ms": round(best * 1e3, 2),
        "eff_tflops": round(flops / best / 1e12, 1),
        "check": val,
    }


def time_e2e(mode):
    """bench.py headline protocol with the adjoint strategy switched."""
    LA._GINV_MODE = mode
    N, D, B = 4096, 8, 8
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    rng = np.random.default_rng(0)
    X = np.asarray(rng.normal(size=(N, D)), dtype=np.float32)
    y = np.asarray(
        np.sum(np.sin(X), axis=1, keepdims=True)
        + 0.1 * rng.normal(size=(N, 1)),
        dtype=np.float32,
    )
    hyps = np.asarray(
        0.05 * rng.normal(size=(B, spec.hyp_N)), dtype=np.float32
    )

    @jax.jit
    def batch_nlml_grad(hyps, X, y):
        f = lambda h: nlz(spec, h, X, y, None)
        return jax.vmap(jax.value_and_grad(f))(hyps)

    v, g = batch_nlml_grad(hyps, X, y)
    jax.block_until_ready((v, g))
    gref = np.asarray(g)
    best = 0.0
    n_iter = 20
    for r in range(3):
        t0 = time.perf_counter()
        for i in range(n_iter):
            v, g = batch_nlml_grad(hyps + 1e-4 * (r * n_iter + i), X, y)
        jax.block_until_ready((v, g))
        best = max(best, B * n_iter / (time.perf_counter() - t0))
    return {
        "what": "headline_e2e",
        "mode": mode,
        "evals_per_sec": round(best, 2),
        "grad_ref_l2": float(f"{np.linalg.norm(gref):.6e}"),
    }


def main():
    modes = MODES
    if "--modes" in sys.argv:
        modes = sys.argv[sys.argv.index("--modes") + 1].split(",")
    for (B, N) in [(8, 4096), (1, 16384)]:
        Lfac = jax.block_until_ready(make_chol_device(B, N))
        for mode in modes:
            print(json.dumps(time_component(mode, Lfac, B, N)), flush=True)
        del Lfac
    if "--skip-e2e" not in sys.argv:
        for mode in modes:
            print(json.dumps(time_e2e(mode)), flush=True)
    LA._GINV_MODE = "compose"


if __name__ == "__main__":
    main()
