"""BNN-MALA vs BNN-MH on the flagship posterior (round 3).

Round 1 compared the samplers on the PLAIN (deterministic-target) model;
the default configuration is the flipout BNN, whose stochastic target
needs `recompute_current` on both sides of the accept ratio and, for
MALA, a gradient through the SAME weight-noise draw — exactly what
`make_fused_causal_logp_and_grad_bnn_hosteps` provides (the eps is passed
in, so forward and backward see one consistent perturbation).

Protocol: train ONE flagship seed at the exact reference protocol
(cosine recipe), then predict with
  - adaptive MH (reference algorithm; paired 2n-row fused launches),
  - adaptive MALA at the same chain length,
  - adaptive MALA at 1/4 chain length (the regime where gradient
    proposals should pay: equal ESS from fewer steps)
recording ADRF RMSE, acceptance, min/median ESS, and wall-clock.

Usage:  python benchmarks/bnn_mala_study.py [--seed 123]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--data_seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--egm", type=int, default=30000)
    ap.add_argument("--out", default="benchmarks/artifacts/bnn_mala_r3.jsonl")
    args = ap.parse_args()

    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM
    from bayesgm_tpu.utils import get_ADRF

    x, y, v = Sim_Hirano_Imbens_sampler(
        batch_size=32, N=20000, v_dim=200, seed=args.data_seed).load_all()
    grid = np.linspace(0, 3, 20)
    true = get_ADRF(x_values=grid, dataset="Imbens")

    m = CausalBGM(dict(
        v_dim=200, z_dims=[1, 1, 1, 7], binary_treatment=False,
        dataset="bnn_mala", output_dir="/tmp/bnn_mala", use_bnn=True,
        save_res=False, save_model=False, lr_decay="cosine"),
        random_seed=args.seed)
    t0 = time.time()
    m.fit((x, y, v), epochs=args.epochs, epochs_per_eval=10**9,
          use_egm_init=True, egm_n_iter=args.egm,
          egm_batches_per_eval=10**9, verbose=0)
    print(json.dumps({"fit_s": round(time.time() - t0, 1)}), flush=True)

    runs = [("mh", 3000, 5000), ("mala", 3000, 5000), ("mala", 750, 1250)]
    for sampler, n_mcmc, burn_in in runs:
        t0 = time.time()
        adrf, _, diag = m.predict(
            (x, y, v), alpha=0.1, n_mcmc=n_mcmc, burn_in=burn_in,
            x_values=grid, q_sd=1.0, sampler=sampler,
            return_diagnostics=True)
        dt = time.time() - t0
        rec = dict(sampler=sampler, n_mcmc=n_mcmc, burn_in=burn_in,
                   seed=args.seed,
                   rmse=float(np.sqrt(np.mean((np.asarray(adrf) - true) ** 2))),
                   accept=round(float(diag["accept_rate"]), 4),
                   ess_min=round(float(np.min(diag["ess"])), 1),
                   ess_med=round(float(np.median(diag["ess"])), 1),
                   rhat_max=round(float(np.max(diag["rhat"])), 4),
                   predict_s=round(dt, 1))
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
