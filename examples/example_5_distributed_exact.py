"""Exact GP inference with the kernel matrix SHARDED across devices.

Every replicated exact-GP program in this package keeps the whole
(N, N) kernel matrix on each chip, capping exact inference at roughly
N = 60k per 16 GB of HBM (f32).  The distributed exact tier
(`gpyreg_tpu.parallel.dist_exact`) removes that cap with chips: the
scaled kernel matrix lives block-row-sharded over a `jax.sharding.Mesh`
and is factored in place by a distributed blocked Cholesky, so the
per-device footprint is N^2/P — an 8-chip v5e slice serves exact
NLML/posterior/predictions at N ≈ 180k f32.

This example runs the whole flow on an 8-device VIRTUAL CPU mesh (no
TPU needed) at a small N and checks it against the replicated path;
on a real pod slice, drop the two config lines and pass the real mesh.

Run anywhere:  python examples/example_5_distributed_exact.py
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# --- virtual 8-device CPU mesh (delete on real multi-chip hardware) ---
os.environ["GPYREG_TPU_NO_COMPILE_CACHE"] = "1"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import gpyreg_tpu  # noqa: F401,E402  (enables x64)
from gpyreg_tpu.core.model import ModelSpec  # noqa: E402
from gpyreg_tpu.core.nlml import nlz  # noqa: E402
from gpyreg_tpu.parallel.dist_exact import (  # noqa: E402
    dist_exact_fit,
    dist_exact_predict,
)
from gpyreg_tpu.parallel.mesh import make_mesh  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    N, D, M = 2000, 4, 500
    X = rng.uniform(-3, 3, (N, D))
    y = np.sum(np.sin(X), axis=1, keepdims=True)
    y += 0.05 * rng.normal(size=(N, 1))
    xs = rng.uniform(-3, 3, (M, D))

    # The ops-level tier works on a ModelSpec (the hashable model-family
    # description every jitted core program keys on).
    spec = ModelSpec(
        D=D, cov="se", mean="const",
        noise_constant=True, noise_user=0, noise_rectified=False,
    )
    # hyp layout: cov (D lengthscales + outputscale) | noise | mean.
    hyp = np.concatenate([np.zeros(D), [0.0], [-2.0], [0.0]])

    mesh = make_mesh(8)
    post = dist_exact_fit(spec, mesh, hyp, X, y, b=128)
    print(f"distributed NLML          : {float(post.nlml):.6f}")
    print(f"replicated  NLML (check)  : {float(nlz(spec, hyp, X, y, None)):.6f}")
    print(
        "factor sharding           :",
        post.slab.sharding.spec,
        f"({post.Np}x{post.Np} over 8 devices ->",
        f"{post.Np * post.Np // 8 * 8 / 1e6:.0f} MB/device at f64)",
    )

    mu, s2 = dist_exact_predict(post, xs)
    print(
        f"predict (M={M})           : mu[:3]={np.round(mu[:3], 4)}, "
        f"min s2={s2.min():.2e}"
    )
    rmse = float(np.sqrt(np.mean((mu - np.sum(np.sin(xs), 1)) ** 2)))
    print(f"latent-mean RMSE vs truth : {rmse:.4f}")


if __name__ == "__main__":
    main()
