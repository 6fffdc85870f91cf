"""Where does the 16k MCMC chain's ~0.14 s/probe go?

Times, at the north-star chain shape (N=16384 padded, D=10, f32, TPU),
each layer of the per-probe work as a scan-over-varying-inputs program
(best-of-4 rounds — identical-args re-dispatch can return a
memoized-transfer artifact, CLAUDE.md):

  chol    jitter-free Cholesky of G               (the FLOP floor)
  jchol   jittered_cholesky (retry while_loop)
  nlz     full NLML forward (K build + quad_logdet)
  vgrad   value_and_grad NLML (the MAP-phase unit)

Prints one JSON line with ms/eval for each.
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
from gpyreg_tpu.core import nlml
from gpyreg_tpu.ops import linalg

N, D, R = 16384, 10, 8  # R = scan length (evals per timed dispatch)


def timed(fn, args_fn, rounds=4):
    """args_fn(r) must return DISTINCT args per round r: re-dispatching
    a compiled program with identical args can return a
    memoized-transfer artifact (CLAUDE.md) — round -1 warms/compiles.

    Each round ends with a VALUE PULL of the (scalar) result:
    block_until_ready alone is NOT a sync barrier through the remote
    tunnel (measured: four 400 ms scans "block" in 0.1 ms without a
    pull; with a pull per round the next block waits for real
    execution).  The pull is outside the timed region."""
    out = fn(*args_fn(-1))
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])
    best = np.inf
    for r in range(rounds):
        args = args_fn(r)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
        float(np.asarray(out).ravel()[0])  # drain the remote stream
    return best / R * 1e3  # ms per eval


def main():
    print("start", flush=True)
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

    out = {"N": N, "D": D, "scan_len": R}

    def emit(k, v):
        out[k] = v
        print(f"  {k}: {v}", flush=True)

    # --- raw Cholesky floor: scan over R different jitters ---
    # G0 stays DEVICE-resident: passed as host numpy it would re-upload
    # 1 GB through the tunnel on every dispatch (~6 s/eval measured),
    # swamping the Cholesky being measured.
    G0 = jax.block_until_ready(
        jax.jit(lambda h: nlml.assemble(spec, h, X, y, None, None)[0])(
            hyps[0]
        )
    )
    jits = np.float32(1.0) + 1e-4 * np.arange(R, dtype=np.float32)

    @jax.jit
    def chol_scan(G, js):
        def body(c, j):
            L = jnp.linalg.cholesky(
                G + j * jnp.eye(N, dtype=G.dtype)
            )
            return c + L[0, 0], None
        return jax.lax.scan(body, jnp.float32(0), js)[0]

    emit("chol_ms", round(timed(
        chol_scan, lambda r: (G0, jits + np.float32(1e-5) * (r + 2))
    ), 1))

    # --- jittered_cholesky (retry loop) on the same scan ---
    sn2v = np.full((N, 1), np.exp(2 * -1.0), np.float32)

    @jax.jit
    def jchol_scan(G, js):
        def body(c, j):
            L, mult = linalg.jittered_cholesky(G * j, sn2v)
            return c + L[0, 0] + mult, None
        return jax.lax.scan(body, jnp.float32(0), js)[0]

    emit("jchol_ms", round(timed(
        jchol_scan, lambda r: (G0, jits + np.float32(1e-5) * (r + 2))
    ), 1))

    # --- full NLML forward, scan over R hyp vectors ---
    @jax.jit
    def nlz_scan(hs):
        def body(c, h):
            return c + nlml.nlz(spec, h, X, y, None, None), None
        return jax.lax.scan(body, jnp.float32(0), hs)[0]

    emit("nlz_ms", round(timed(
        nlz_scan, lambda r: (hyps + np.float32(1e-4) * (r + 2),)
    ), 1))

    # --- NLML value_and_grad (MAP unit) ---
    @jax.jit
    def vgrad_scan(hs):
        def body(c, h):
            v, g = jax.value_and_grad(
                lambda hh: nlml.nlz(spec, hh, X, y, None, None)
            )(h)
            return c + v + jnp.sum(g), None
        return jax.lax.scan(body, jnp.float32(0), hs)[0]

    emit("vgrad_ms", round(timed(
        vgrad_scan, lambda r: (hyps + np.float32(1e-4) * (r + 2),)
    ), 1))

    chol_tflops = (N**3 / 3) / (out["chol_ms"] * 1e-3) / 1e12
    out["chol_eff_tflops"] = round(chol_tflops, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
