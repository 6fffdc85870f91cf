"""TPU-vs-CPU consistency spot-check for the vmapped hot paths.

The v5e toolchain miscompiled the vmapped L-BFGS program (see
inference/map_optimize.py) — this script guards the remaining vmapped
programs (batched NLML+grad, batched posterior factors, vmapped
prediction) by comparing TPU f32 results against the CPU f64 oracle at
f32-appropriate tolerances, and batched-vs-solo consistency ON the TPU
(a miscompile signature independent of precision).

Run on a TPU host:  python benchmarks/tpu_consistency_check.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import gpyreg_tpu as gpr  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gpyreg_tpu.core.model import ModelSpec  # noqa: E402
from gpyreg_tpu.core.nlml import get_fns  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    N, D, B = 300, 3, 8
    X = rng.uniform(-3, 3, (N, D))
    y = np.sin(np.sum(X, axis=1, keepdims=True)) + 0.1 * rng.normal(
        size=(N, 1)
    )
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    fns = get_fns(spec, False, False)
    Xj = jnp.asarray(X, dtype=jnp.float32)
    yj = jnp.asarray(y, dtype=jnp.float32)
    hyps = 0.1 * rng.normal(size=(B, spec.hyp_N))
    hb = jnp.asarray(hyps, dtype=jnp.float32)

    # 1. batched-vs-solo NLML+grad ON the device.
    vb, gb = fns["obj_grad_batch"](hb, Xj, yj)
    vb, gb = np.asarray(vb), np.asarray(gb)
    for i in range(B):
        vi, gi = fns["obj_grad"](hb[i], Xj, yj)
        assert abs(float(vi) - vb[i]) < 1e-3 * max(1, abs(float(vi))), (
            f"obj_grad batch-vs-solo mismatch at lane {i}: "
            f"{float(vi)} vs {vb[i]}"
        )
        assert np.max(np.abs(np.asarray(gi) - gb[i])) < 1e-2, i
    print("obj_grad_batch == solo lanes: OK")

    # 2. batched posterior factors vs solo.
    ab, Lb, mb, sb = fns["post_batch"](hb, Xj, yj)
    for i in range(0, B, 3):
        ai, Li, mi, si = fns["post"](hb[i], Xj, yj)
        assert np.max(np.abs(np.asarray(ai) - np.asarray(ab)[i])) < 1e-2, i
        assert float(mi) == float(np.asarray(mb)[i])
    print("post_batch == solo lanes: OK")

    # 3. vmapped prediction vs per-sample prediction via the GP API.
    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        dtype=np.float32,
    )
    gp.update(X_new=X, y_new=y, hyp=hyps)
    xs = rng.uniform(-3, 3, (64, D))
    mu_b, s2_b = gp.predict(xs, separate_samples=True)
    gp._posterior_mem_budget = 1  # force the per-sample (no-vmap) path
    mu_s, s2_s = gp.predict(xs, separate_samples=True)
    assert np.max(np.abs(mu_b - mu_s)) < 1e-4, np.max(np.abs(mu_b - mu_s))
    assert np.max(np.abs(s2_b - s2_s)) < 1e-4
    print("vmapped predict == per-sample predict: OK")

    print("TPU CONSISTENCY CHECK PASS")


if __name__ == "__main__":
    main()
