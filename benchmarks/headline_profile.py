"""Component profile of the headline NLML+grad evaluation
(B=8, N=4096, D=8 ARD-SE, f32) with artifact-proof scan timing:
each component is one device program lax.scanning over R DIFFERENT
hyperparameter batches (fresh values per iteration, one scalar out), so
tunnel memoization / async-dispatch artifacts cancel.

Components:
  kbuild      — kernel matrix build alone (vmapped over B hyps)
  kbuild_chol — build + native batched Cholesky
  nlz         — the library forward (core.nlml.nlz, jitter retry incl.)
  nlz_grad    — the library value_and_grad (the headline evaluation)

Run: python benchmarks/headline_profile.py
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

from gpyreg_tpu.core.model import ModelSpec, cov_matrix
from gpyreg_tpu.core.nlml import nlz

B, N, D = 8, 4096, 8
R = 8


def main():
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(N, D)), dtype=jnp.float32)
    y = jnp.asarray(
        np.sum(np.sin(np.asarray(X)), axis=1, keepdims=True),
        dtype=jnp.float32,
    )
    # R distinct hyp batches: (R, B, hyp_N)
    hyps = jnp.asarray(
        0.05 * rng.normal(size=(R, B, spec.hyp_N)) + 0.2,
        dtype=jnp.float32,
    )

    def kbuild_one(hyp):
        hyp_cov = hyp[: spec.cov_N]
        K = cov_matrix(spec, hyp_cov, X)
        return jnp.sum(K[:, 0])

    def kchol_one(hyp):
        hyp_cov = hyp[: spec.cov_N]
        K = cov_matrix(spec, hyp_cov, X)
        G = K + jnp.exp(2.0 * hyp[spec.cov_N]) * jnp.eye(
            N, dtype=K.dtype
        )
        Lc = lax.linalg.cholesky(G, symmetrize_input=False)
        return jnp.sum(jnp.log(jnp.diag(Lc)))

    def nlz_one(hyp):
        return nlz(spec, hyp, X, y, None)

    nlz_grad_one = jax.value_and_grad(nlz_one)

    comps = {
        "kbuild": lambda hb: jnp.sum(jax.vmap(kbuild_one)(hb)),
        "kbuild_chol": lambda hb: jnp.sum(jax.vmap(kchol_one)(hb)),
        "nlz": lambda hb: jnp.sum(jax.vmap(nlz_one)(hb)),
        "nlz_grad": lambda hb: (
            lambda v_g: jnp.sum(v_g[0]) + jnp.sum(v_g[1])
        )(jax.vmap(nlz_grad_one)(hb)),
    }

    for name, fn in comps.items():
        @jax.jit
        def timed(hyps_all, fn=fn):
            def body(c, hb):
                s = fn(hb)
                return c + s, s

            tot, outs = lax.scan(body, jnp.float32(0), hyps_all)
            return tot

        # Compile with one hyp set, time with ANOTHER (identical
        # dispatches are memoized by the tunnel runtime).
        jax.block_until_ready(timed(hyps))
        hyps2 = hyps + jnp.float32(0.01)
        t0 = time.perf_counter()
        jax.block_until_ready(timed(hyps2))
        t = (time.perf_counter() - t0) / R
        print(
            json.dumps(
                {"component": name, "ms_per_eval": round(t * 1e3, 2),
                 "evals_per_s": round(1.0 / t, 1)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
