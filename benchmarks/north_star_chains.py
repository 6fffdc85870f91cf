"""Converged north star via chain-parallel MCMC (VERDICT r4 item 2).

The round-3 headline north-star fit reports exit_flag=-2 (max R-hat >
1.1 from a single chain's split diagnostics at 8 samples x thin 5) —
the reference would report the same, but a framework claiming to beat
it should also show what a CONVERGED hyperposterior costs.  This runs
the exact north-star workload (N=16384, D=10 ARD-SE; same data seeds
as benchmarks/north_star.py) through ``fit(n_chains=8)``: 8 chains
from the MAP point, batched into one program (each chain sweep shares
one B=8 batched Cholesky per eval), cross-chain Gelman-Rubin R-hat.

Protocol (r4 final): B=2 chains, burn=80, thin=40 -> each chain
collects 160 post-burn sweeps; the cross-chain SPLIT R-hat (each chain
halved -> 4 sequences of 80) has ~0.94 power to show max R-hat < 1.1
over the 13 hyperparameters when the chains ARE mixed.  The earlier
escalating-burn protocol (burn 40/120/360 at thin 5) could not
converge even in principle: with 2 chains x 20 consecutive draws the
between-chain variance has 1 degree of freedom and P(max R-hat < 1.1
over 13 dims | perfect mixing) ~ 0.08 — the observed max R-hat 1.27 /
1.38 rows were diagnostic noise, not burn-in failure.  One JSON line
per row; a warm repeat runs if the budget allows.

``--chain-thin k`` collects every k-th sweep inside each chain (same
320 kept draws, k× the sweeps): the cold row's min eff_N 23.7 of 320
sits just under the reference's kept/10 = 32 exit bar (worst-dim
autocorrelation time ~13.5 kept draws vs the <=10 demanded), so k=2
halves the kept-draw autocorrelation and clears exit_flag >= 0.

Usage: python benchmarks/north_star_chains.py [--smoke]
       [--chains B] [--burn B] [--thin T] [--chain-thin K]
       [--budget-min M] [--one-row]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D = 16384, 10
# B=2 chains: the B-chain batched eval holds ~4-5 live copies of the
# (B, N, N) array (K build, jitter-retry carry, factor, NaN check) —
# measured 41 GB at B=8 vs the v5e's 15.75 GB HBM (r4 OOM log), and a
# 16k Cholesky already saturates the MXU so batching chains buys
# convergence structure, not wall-clock.  2 chains x split = 4
# sequences for the Gelman-Rubin diagnostic (Stan's default strength).
S_N, THIN, B = 8, 40, 2
BURN = 80
CHAIN_THIN = 1


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-3, 3, (N, D))
    y = (
        np.sum(np.sin(X[:, :3]), axis=1, keepdims=True)
        + 0.5 * np.sum(X[:, 3:5] ** 2, axis=1, keepdims=True) / 3.0
        + 0.1 * rng.normal(size=(N, 1))
    )
    return X, y


def main():
    global N, B, THIN, BURN, CHAIN_THIN
    if "--smoke" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        N = 256
    if "--chains" in sys.argv:
        B = int(sys.argv[sys.argv.index("--chains") + 1])
    if "--burn" in sys.argv:
        BURN = int(sys.argv[sys.argv.index("--burn") + 1])
    if "--thin" in sys.argv:
        THIN = int(sys.argv[sys.argv.index("--thin") + 1])
    if "--chain-thin" in sys.argv:
        CHAIN_THIN = int(sys.argv[sys.argv.index("--chain-thin") + 1])
    budget_min = 180.0
    if "--budget-min" in sys.argv:
        budget_min = float(sys.argv[sys.argv.index("--budget-min") + 1])
    seed1 = 1
    if "--seed" in sys.argv:
        seed1 = int(sys.argv[sys.argv.index("--seed") + 1])
    label_override = None
    if "--label" in sys.argv:
        label_override = sys.argv[sys.argv.index("--label") + 1]
    t_start = time.perf_counter()

    import gpyreg_tpu as gpr

    X, y = make_data()

    gp = gpr.GP(
        D=D,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ConstantMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
        dtype=np.float32,
    )

    group = None
    if "--group" in sys.argv:
        group = int(sys.argv[sys.argv.index("--group") + 1])
    no_base = "--no-base-widths" in sys.argv

    def run(burn, seed, label):
        opts = {
            "n_samples": S_N,
            "thin": THIN,
            "opts_N": 3,
            "init_N": 1024,
            "n_chains": B,
            "burn": burn,
        }
        if CHAIN_THIN > 1:
            opts["chain_thin"] = CHAIN_THIN
        if group is not None:
            opts["chain_group"] = group
        if no_base:
            opts["sample_width_base"] = False
        np.random.seed(seed)
        t0 = time.perf_counter()
        hyp, _, sr = gp.fit(X=X, y=y, options=opts)
        wall = time.perf_counter() - t0
        R = sr.get("R")
        eff = sr.get("eff_N")
        rec = {
            "row": label,
            "n_chains": B,
            "burn": burn,
            "chain_thin": CHAIN_THIN,
            "chain_group": group,
            "width_base": not no_base,
            "fit_wall_s": round(wall, 1),
            "timings_s": {
                k: round(v, 1) for k, v in gp.fit_timings.items()
            },
            "exit_flag": sr["exit_flag"],
            "max_R": None if R is None else round(float(np.max(R)), 3),
            "min_eff_N": (
                None if eff is None else round(float(np.min(eff)), 1)
            ),
            "hyp_mean": [round(float(v), 3) for v in np.mean(hyp, 0)],
            "hyp_std": [round(float(v), 3) for v in np.std(hyp, 0)],
        }
        n_ev = sr.get("n_evals")
        if n_ev is not None:
            rec["n_evals_per_chain"] = [int(v) for v in n_ev]
        print(json.dumps(rec), flush=True)
        return rec

    suffix = f"_cthin{CHAIN_THIN}" if CHAIN_THIN > 1 else ""
    if "--one-row" in sys.argv:
        # One labeled row (e.g. the warm converged run after the cold
        # row already landed): warm-vs-cold is whatever the persistent
        # compile cache holds.
        label = label_override or f"warm_burn{BURN}_thin{THIN}{suffix}"
        run(BURN, seed=seed1, label=label)
        return
    # Cold run pays every remote compile (design/MAP programs are shared
    # with the ordinary fit; the B-chain segments are new).
    cold = run(BURN, seed=0, label=f"cold_burn{BURN}_thin{THIN}{suffix}")
    converged = cold["exit_flag"] >= 0 or (
        cold["max_R"] is not None and cold["max_R"] < 1.1
    )
    rows = [cold]
    elapsed = (time.perf_counter() - t_start) / 60.0
    projected = cold["fit_wall_s"] / 60.0
    if converged and elapsed + projected < budget_min:
        # Warm repeat: the converged cost without the remote compiles,
        # comparable to the single-chain warm north-star row.
        rows.append(
            run(BURN, seed=1, label=f"warm_burn{BURN}_thin{THIN}")
        )
    elif not converged and elapsed + 1.6 * projected < budget_min:
        # One escalation: triple the burn-in (R-hat genuinely > 1.1
        # means the chains still remember their starts).
        rows.append(
            run(3 * BURN, seed=1, label=f"warm_burn{3 * BURN}_thin{THIN}")
        )
    best = [
        r
        for r in rows
        if r["exit_flag"] >= 0
        or (r["max_R"] is not None and r["max_R"] < 1.1)
    ]
    print(
        json.dumps(
            {
                "converged": bool(best),
                "row": best[-1]["row"] if best else None,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
