"""Scale validation of the distributed exact tier (VERDICT r3 #6).

Runs the row-sharded build + distributed blocked Cholesky + solves
(parallel/dist_exact.py) at exact-path scale on the 8-device virtual
CPU mesh — the same validation surface the driver's dryrun uses, at a
size where the layout actually matters (per-device slab = N^2/8).

  - N=16384 (default): dist NLML + alpha + 256-point predict, checked
    against the single-device replicated core (f32; the two sides
    factor differently-scaled matrices, so agreement is conditioning-
    bounded, reported not asserted).
  - --big: N=32768 — the slab tier's target size; the replicated
    single-device cross-check is skipped (the 32k^2 f32 matrix is the
    very thing the tier exists to avoid), correctness is pinned by the
    16k row and the machine-precision parity suite
    (tests/test_dist_exact.py).

Prints one JSON line per size.  CPU wall-clock is NOT a TPU perf
number (single host core ~100 GFLOP/s); the row exists to prove the
sharded programs compile + execute at scale, per SURVEY §2.3.

Run: python benchmarks/dist_exact_scale.py [--big]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--tpu" not in sys.argv:
    # CPU mode: stale cross-machine CPU AOT artifacts risk SIGILL; the
    # TPU mode keeps the persistent cache (remote compiles are minutes).
    os.environ["GPYREG_TPU_NO_COMPILE_CACHE"] = "1"
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import gpyreg_tpu  # noqa: F401,E402
from gpyreg_tpu.core.model import ModelSpec  # noqa: E402
from gpyreg_tpu.core.nlml import get_fns  # noqa: E402
from gpyreg_tpu.parallel import dist_exact as de  # noqa: E402
from gpyreg_tpu.parallel import mesh as pmesh  # noqa: E402

D, M, B_PANEL = 8, 256, 512


def run(N, check_single, algorithm="masked_full"):
    rng = np.random.default_rng(0)
    X = rng.uniform(-3, 3, (N, D)).astype(np.float32)
    y = (
        np.sum(np.sin(X[:, :3]), axis=1, keepdims=True)
        + 0.1 * rng.normal(size=(N, 1))
    ).astype(np.float32)
    xs = rng.uniform(-3, 3, (M, D)).astype(np.float32)
    spec = ModelSpec(
        D=D, cov="se", mean="const", noise_constant=True,
        noise_user=0, noise_rectified=False,
    )
    hyp = np.concatenate([np.zeros(D), [0.0], [-1.0], [0.0]])
    mesh = pmesh.make_mesh(8)

    t0 = time.perf_counter()
    post = de.dist_exact_fit(
        spec, mesh, hyp, X, y, b=B_PANEL, algorithm=algorithm
    )
    nlml = float(post.nlml)  # value pull = sync
    fit_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    mu, s2 = de.dist_exact_predict(post, xs)
    predict_s = time.perf_counter() - t0

    rec = {
        "N": N,
        "b": B_PANEL,
        "algorithm": algorithm,
        "devices": 8,
        "dist_nlml": round(nlml, 3),
        "fit_s": round(fit_s, 1),
        "predict_s": round(predict_s, 1),
        "slab_gb_per_device": round(post.Np**2 / 8 * 4 / 1e9, 2),
        "finite": bool(
            np.all(np.isfinite(mu)) and np.all(np.isfinite(s2))
        ),
    }
    if check_single:
        fns = get_fns(spec, False, False)
        t0 = time.perf_counter()
        ref = float(fns["nlz"](hyp.astype(np.float32), X, y))
        rec["single_device_nlml"] = round(ref, 3)
        rec["single_device_nlz_s"] = round(time.perf_counter() - t0, 1)
        rec["nlml_rel_diff"] = float(
            f"{abs(nlml - ref) / abs(ref):.2e}"
        )
    print(json.dumps(rec), flush=True)


def tpu_overhead(N=16384):
    """Single-chip cost of the distributed program (1-device mesh; the
    collectives are no-ops) vs the replicated native path — the
    measured overhead the BASELINE decision note quotes.  Timing: each
    side is re-dispatched with a varied hyp and synced by the nlml
    value pull (best of 3)."""
    import time as _t

    rng = np.random.default_rng(0)
    X = rng.uniform(-3, 3, (N, D)).astype(np.float32)
    y = (
        np.sum(np.sin(X[:, :3]), axis=1, keepdims=True)
        + 0.1 * rng.normal(size=(N, 1))
    ).astype(np.float32)
    spec = ModelSpec(
        D=D, cov="se", mean="const", noise_constant=True,
        noise_user=0, noise_rectified=False,
    )
    mesh = pmesh.make_mesh(1)
    fns = get_fns(spec, False, False)

    def best_of(f, rounds=3):
        f(0)  # warm/compile
        best = np.inf
        for r in range(1, rounds + 1):
            t0 = _t.perf_counter()
            f(r)
            best = min(best, _t.perf_counter() - t0)
        return best

    def dist_once(r):
        hyp = np.concatenate(
            [np.full(D, 1e-4 * r), [1e-4 * r], [-1.0], [0.0]]
        )
        post = de.dist_exact_fit(spec, mesh, hyp, X, y, b=B_PANEL)
        return float(post.nlml)  # value pull = sync

    def native_once(r):
        hyp = np.concatenate(
            [np.full(D, 1e-4 * r), [1e-4 * r], [-1.0], [0.0]]
        ).astype(np.float32)
        return float(fns["nlz"](hyp, X, y))

    t_dist = best_of(dist_once)
    t_nat = best_of(native_once)
    print(
        json.dumps(
            {
                "mode": "tpu_single_chip_overhead",
                "N": N,
                "b": B_PANEL,
                "dist_fit_s": round(t_dist, 2),
                "native_nlz_s": round(t_nat, 2),
                "overhead_x": round(t_dist / t_nat, 1),
                "note": (
                    "dist does factor+2 solves vs native nlz factor+"
                    "solve; the tier exists for N^2/P memory, not "
                    "single-chip speed"
                ),
            }
        ),
        flush=True,
    )


def main():
    if "--tpu" in sys.argv:
        tpu_overhead()
        return
    run(16384, check_single=True)
    run(16384, check_single=False, algorithm="two_level")
    if "--big" in sys.argv:
        run(32768, check_single=False, algorithm="two_level")


if __name__ == "__main__":
    main()
