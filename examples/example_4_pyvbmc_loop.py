"""PyVBMC-style active-learning loop on the TPU GP surrogate.

This is the workload the framework is the north star for (reference
README.md:11: gpyreg is the GP engine of PyVBMC): a GP surrogate over a
log-density is alternately REFIT (warm-started MAP + MCMC over the
hyperposterior), EXTENDED one observation at a time (rank-1 posterior
updates), and INTEGRATED against Gaussian proposals (Bayesian
quadrature — the ELBO's expected-log-joint terms).

Every step below is one (or a few) device programs with packed
single-transfer results; posterior factors never leave the device.

Run on the TPU:  python examples/example_4_pyvbmc_loop.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import gpyreg_tpu as gpr  # noqa: E402


def log_target(x):
    """A banana-ish 2-D log density standing in for the user's model."""
    return -0.5 * (x[:, 0] ** 2 + 4.0 * (x[:, 1] - 0.3 * x[:, 0] ** 2) ** 2)


def main():
    rng = np.random.default_rng(0)
    D = 2

    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.NegativeQuadratic(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        dtype=np.float32,
        pad_bucket=64,  # compile reuse while N grows
    )

    # Initial design.
    X = rng.uniform(-3, 3, (40, D))
    y = log_target(X)[:, None] + 0.05 * rng.normal(size=(X.shape[0], 1))

    # A noise prior, as PyVBMC sets one: without it the hyperposterior
    # on near-noise-free data wanders into the sn2 -> 0 region where
    # exact-GP posteriors are ill-conditioned in ANY implementation.
    priors = gp.get_priors()
    priors["noise_log_scale"] = ("gaussian", (np.log(0.05), 0.5))
    gp.set_priors(priors)

    fit_opts = {"n_samples": 4, "opts_N": 2, "init_N": 256, "thin": 2}
    # Warm refits use the slicelite ESS shortcut (gplite_train.m:178-197):
    # when the previous hyperposterior samples still cover the new
    # posterior (importance-weight ESS fraction > 0.5), fit() skips
    # design + MAP and just refreshes each sample with a few no-adapt
    # slice sweeps — the oracle's PyVBMC refit fast path.
    warm_opts = {
        "sampler": "slicelite",
        "n_samples": 4,
        "opts_N": 1,
        "init_N": 0,
        "thin": 2,
    }

    t0 = time.perf_counter()
    gp.fit(X=X, y=y, options=fit_opts)
    print(f"cold fit (N={X.shape[0]}): {time.perf_counter() - t0:.2f} s")

    for it in range(4):
        # --- active sampling: add points one at a time (rank-1). ---
        t0 = time.perf_counter()
        for _ in range(8):
            # PyVBMC picks acquisition maximizers; here: posterior draws.
            x_new = rng.uniform(-3, 3, (1, D))
            y_new = log_target(x_new)[:, None] + 0.05 * rng.normal(
                size=(1, 1)
            )
            gp.update(X_new=x_new, y_new=y_new)  # rank-1, on device
        t_upd = time.perf_counter() - t0

        # --- ELBO-style quadrature against the variational proposal. ---
        t0 = time.perf_counter()
        mu_q = rng.uniform(-2, 2, (50, D))  # 50 mixture components
        sig_q = np.full((50, D), 0.4)
        F, F_var = gp.quad(mu_q, sig_q, compute_var=True)
        t_quad = time.perf_counter() - t0

        # --- warm refit of the hyperposterior. ---
        t0 = time.perf_counter()
        _, opt_res, _ = gp.fit(options=warm_opts)
        t_fit = time.perf_counter() - t0

        n = gp.X.shape[0]
        print(
            f"iter {it}: N={n}  8 rank-1 updates {t_upd:.2f} s, "
            f"50-component quad {t_quad * 1e3:.0f} ms, "
            f"warm refit {t_fit:.2f} s"
            f"{' [ESS shortcut]' if opt_res is None else ''}   "
            f"(E[f] mean {float(np.mean(F)):+.3f})"
        )

    mu, s2 = gp.predict(rng.uniform(-3, 3, (1000, D)))
    print(
        f"final surrogate: N={gp.X.shape[0]}, "
        f"predictive sd range [{np.sqrt(s2).min():.3f}, "
        f"{np.sqrt(s2).max():.3f}]"
    )


if __name__ == "__main__":
    main()
