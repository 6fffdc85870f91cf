"""How does the batched chain NLML eval scale with chain count B?

The converged north-star protocol question (VERDICT r4 #2): batching
B chains into one program divides the per-chain collection work by B,
but each batched eval factors B (N, N) matrices.  If the batched eval
wall is linear in B, batching buys convergence structure only; if it
is sub-linear (the 16k Cholesky is panel-sequential at ~11% of MXU
peak — idle pipeline slots that extra lanes can fill), B=4 cuts the
converged-fit wall.  This measures the memory-lean chain forward
(core.nlml.nlz_chain — the exact eval `fit(n_chains=B)` dispatches)
at B in {1, 2, 4}, N=16384, as scan-over-varying-inputs programs
(best-of-4 rounds, value-pull synced; CLAUDE.md timing recipe).

Prints one JSON line: ms per batched eval and per-lane ms for each B.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:  # smoke mode: NEVER touch the chip
    jax.config.update("jax_platforms", "cpu")
import gpyreg_tpu  # noqa: F401
import jax.numpy as jnp

from gpyreg_tpu.core.model import ModelSpec
from gpyreg_tpu.core.nlml import get_fns

N, D, R = 16384, 10, 6  # R = evals per timed dispatch


def timed(fn, args_fn, rounds=4):
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
    return best / R * 1e3  # ms per batched eval


def main():
    n = N
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    bs = [1, 2, 4]
    if "--bs" in sys.argv:
        bs = [int(v) for v in
              sys.argv[sys.argv.index("--bs") + 1].split(",")]
    rng = np.random.default_rng(0)
    X = rng.normal(size=(n, D)).astype(np.float32)
    y = np.sum(np.sin(X), axis=1, keepdims=True).astype(np.float32)
    y += 0.1 * rng.normal(size=(n, 1)).astype(np.float32)
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    fns = get_fns(spec, False, False)
    n_hyp = D + 3
    base = np.concatenate([np.zeros(D), [0.0], [-1.0], [0.0]])

    out = {"N": n, "D": D, "scan_len": R}
    for B in bs:
        hyps = (
            base[None, None, :]
            + 0.02 * rng.standard_normal((R, B, n_hyp))
        ).astype(np.float64)

        @jax.jit
        def eval_scan(hs):
            def body(c, h):
                v = jax.vmap(
                    lambda hh: fns["log_post_chain_raw"](hh, X, y)
                )(h)
                return c + jnp.sum(v), None
            return jax.lax.scan(body, jnp.float64(0), hs)[0]

        try:
            ms = timed(
                eval_scan,
                lambda r: (hyps + np.float64(1e-4) * (r + 2),),
            )
        except Exception as e:  # OOM at this B: record and move on
            out[f"B{B}_error"] = str(e)[:200]
            print(f"  B={B}: ERROR {str(e)[:200]}", flush=True)
            continue
        out[f"B{B}_ms"] = round(ms, 1)
        out[f"B{B}_ms_per_lane"] = round(ms / B, 1)
        print(f"  B={B}: {ms:.1f} ms/eval "
              f"({ms / B:.1f} ms/lane)", flush=True)
    if "B1_ms" in out and "B4_ms" in out:
        out["r_4_vs_1"] = round(out["B4_ms"] / out["B1_ms"], 2)
    if "B2_ms" in out and "B4_ms" in out:
        out["r_4_vs_2"] = round(out["B4_ms"] / out["B2_ms"], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
