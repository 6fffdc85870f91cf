"""Compile-time peak-memory analysis of the B-chain batched MCMC eval.

Compares the general NLML forward (core.nlml.nlz via quad_logdet — the
round-4 chain eval, ~5 live (B, N, N) copies, 41.03 GB at B=8 N=16384
f32 per the XLA OOM log) against the memory-lean chain schedule
(core.nlml.nlz_chain).  Uses AOT ``memory_analysis()`` — no execution,
so it can also size TPU programs without dispatching.

Usage:
  python benchmarks/chain_mem_analysis.py [--tpu] [--n N] [--b B]
CPU default is a proxy (different buffer assignment than TPU); pass
--tpu for the real numbers when the chip is free.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if "--tpu" not in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from gpyreg_tpu.core.model import ModelSpec
    from gpyreg_tpu.core.nlml import get_fns

    N = 16384
    B = 4
    if "--n" in sys.argv:
        N = int(sys.argv[sys.argv.index("--n") + 1])
    if "--b" in sys.argv:
        B = int(sys.argv[sys.argv.index("--b") + 1])

    spec = ModelSpec(
        D=10, cov="se", mean="const", noise_constant=True,
        noise_user=0, noise_rectified=False,
    )
    fns = get_fns(spec, False, False)
    X = np.zeros((N, 10), dtype=np.float32)
    y = np.zeros((N, 1), dtype=np.float32)
    hyps = np.zeros((B, spec.hyp_N), dtype=np.float64)

    bnn = B * N * N * 4 / 2**30
    print(f"(B,N,N) f32 = {bnn:.2f} GiB")
    # Lean chain schedule FIRST: on TPU .compile() is a real compile,
    # and the general path OOMs at B=4 N=16384 (21.03 GB vs 15.75 HBM,
    # 2026-08-19 log) — it must not kill the measurement of the lean one.
    for name in ("log_post_chain_raw", "log_post_raw"):
        f = jax.jit(jax.vmap(lambda h: fns[name](h, X, y)))
        out = {"fn": name, "B": B, "N": N}
        try:
            c = f.lower(jnp.asarray(hyps)).compile()
        except Exception as e:
            msg = str(e)
            out["compile_error"] = msg[:300]
            import re as _re

            mm = _re.search(r"Used ([0-9.]+)G of ([0-9.]+)G hbm", msg)
            if mm:
                out["hbm_needed_gib"] = float(mm.group(1))
                out["real_BNN_copies_incl_frag"] = round(
                    float(mm.group(1)) / bnn, 2
                )
            print(json.dumps(out), flush=True)
            continue
        m = c.memory_analysis()
        if m is not None:
            for k in (
                "temp_size_in_bytes",
                "argument_size_in_bytes",
                "output_size_in_bytes",
                "generated_code_size_in_bytes",
            ):
                v = getattr(m, k, None)
                if v is not None:
                    out[k.replace("_in_bytes", "_gib")] = round(
                        v / 2**30, 3
                    )
            t = getattr(m, "temp_size_in_bytes", None)
            if t:
                out["live_BNN_copies"] = round(t / (B * N * N * 4), 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
