"""Reproducible binary-treatment benchmark with known ground-truth effects.

The reference's headline binary result is on ACIC-2018 (dATE 0.0069 /
dPEHE 0.0001, docs/source/causalbgm/tutorial_py.ipynb cell 31), whose CSVs
are not redistributable and absent from this environment.  This committed,
fully seeded semi-synthetic stands in: confounded binary treatment with a
known per-sample effect surface, so dATE / dPEHE / ITE-coverage are exact.

Generator (all np.random.RandomState(data_seed), deterministic):
    V ~ N(0, I_100)
    P(X=1 | V) = sigmoid(0.8 v1 - 0.6 v2 + 0.4 v3)          (confounding)
    mu0(V)     = v1 + 0.5 v2 - 0.5 v3 + 0.3 v4 v5           (baseline outcome)
    tau(V)     = 1 + 0.5 sin(v1)                            (heterogeneous ITE)
    Y          = mu0(V) + tau(V) X + N(0, 0.5^2)

Protocol mirrors the ACIC recipe: z_dims=[3,6,3,6], BNN, EGM 30k iters,
100 epochs, predict n_mcmc=3000 / burn_in=5000.  Acceptance bars (stated,
logged in RESULTS.md): dATE <= 0.05 (~5% of the effect size), ITE 95%%
coverage >= 0.9.

Usage:
    python benchmarks/binary_ate.py              # full protocol (TPU, ~9 min)
    python benchmarks/binary_ate.py --quick      # CI smoke (~1 min)
"""

import argparse
import json
import time

import numpy as np


def make_data(n=10000, v_dim=100, data_seed=7):
    rng = np.random.RandomState(data_seed)
    v = rng.randn(n, v_dim).astype("float32")
    p = 1.0 / (1.0 + np.exp(-(0.8 * v[:, 0] - 0.6 * v[:, 1] + 0.4 * v[:, 2])))
    x = (rng.rand(n) < p).astype("float32")
    mu0 = v[:, 0] + 0.5 * v[:, 1] - 0.5 * v[:, 2] + 0.3 * v[:, 3] * v[:, 4]
    tau = 1.0 + 0.5 * np.sin(v[:, 0])
    y = (mu0 + tau * x + 0.5 * rng.randn(n)).astype("float32")
    return x.reshape(-1, 1), y.reshape(-1, 1), v, tau


def main():
    from bayesgm_tpu.utils.runtime import force_cpu_if_requested

    force_cpu_if_requested()
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="tiny smoke run")
    p.add_argument("--seed", type=int, default=123, help="model seed")
    p.add_argument("--data_seed", type=int, default=7)
    p.add_argument("--identifiable", action="store_true")
    p.add_argument("--engine", choices=["base", "identifiable", "fullmcmc",
                                        "ensemble"], default=None,
                   help="model variant (overrides --identifiable)")
    p.add_argument("--n_members", type=int, default=3,
                   help="ensemble size when --engine ensemble")
    p.add_argument("--output_dir", type=str, default="/tmp/binary_ate")
    args = p.parse_args()

    from bayesgm_tpu.models.causalbgm import CausalBGM
    from bayesgm_tpu.models.ensemble import EnsembleCausalBGM
    from bayesgm_tpu.models.fullmcmc import FullMCMCCausalBGM
    from bayesgm_tpu.models.identifiable import IdentifiableCausalBGM

    n = 1000 if args.quick else 10000
    x, y, v, tau = make_data(n=n, data_seed=args.data_seed)

    params = dict(
        v_dim=v.shape[1], z_dims=[3, 6, 3, 6], binary_treatment=True,
        dataset="binary_ate", output_dir=args.output_dir,
        use_bnn=not args.quick, save_res=False, save_model=False)
    engine = args.engine or ("identifiable" if args.identifiable else "base")
    cls = {"base": CausalBGM, "identifiable": IdentifiableCausalBGM,
           "fullmcmc": FullMCMCCausalBGM, "ensemble": EnsembleCausalBGM}[engine]
    if engine == "ensemble":
        params["n_members"] = args.n_members
    model = cls(params, random_seed=args.seed)

    epochs = 5 if args.quick else 100
    egm = 500 if args.quick else 30000
    t0 = time.time()
    model.fit((x, y, v), epochs=epochs, epochs_per_eval=10, batch_size=32,
              use_egm_init=True, egm_n_iter=egm, egm_batches_per_eval=egm,
              verbose=0)
    t_fit = time.time() - t0
    if engine == "fullmcmc":
        model.run_mcmc_training((x, y, v))

    t0 = time.time()
    n_mcmc, burn_in = (200, 300) if args.quick else (3000, 5000)
    ite, intervals = model.predict((x, y, v), alpha=0.05, n_mcmc=n_mcmc,
                                   burn_in=burn_in, q_sd=1.0)
    t_pred = time.time() - t0

    ate_true = float(tau.mean())
    d_ate = abs(float(ite.mean()) - ate_true)
    pehe = float(np.sqrt(np.mean((ite - tau) ** 2)))
    coverage = float(np.mean((intervals[:, 0] <= tau) & (tau <= intervals[:, 1])))
    print(json.dumps(dict(
        n=n, engine=engine, seed=args.seed, data_seed=args.data_seed,
        ate_true=round(ate_true, 4), ate_est=round(float(ite.mean()), 4),
        d_ate=round(d_ate, 4), pehe=round(pehe, 4), ite_coverage=round(coverage, 3),
        fit_s=round(t_fit, 1), predict_s=round(t_pred, 1),
        bars=dict(d_ate=0.05, coverage=0.9))))


if __name__ == "__main__":
    main()
