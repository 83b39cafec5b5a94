"""ESS-adaptive predict vs the reference's fixed schedule (VERDICT r3 item 4).

Fits the flagship cosine recipe once per seed, then compares:

  full    — the reference schedule: burn_in=5000, n_mcmc=3000 (8000 steps)
  adaptive — burn_in=B, n_mcmc=3000 with ess_target: collection stops at the
             first chunk boundary where min-ESS >= target and split-R-hat
             <= 1.01 on the ADRF draw series

over ADRF RMSE, 99% interval width, and total chain steps.  The claim to
adjudicate: equal RMSE / interval coverage at >= 2x fewer steps (else a
recorded negative).  Total steps = burn_in + kept (the BNN path evaluates
two launches per step in both arms, so steps are cost-proportional).

Usage:
    python benchmarks/ess_adaptive_probe.py --seeds 123 456 789 \
        --out benchmarks/artifacts/ess_adaptive_r4.jsonl
"""

import argparse
import json
import time

import numpy as np


def run_seed(seed, args):
    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM
    from bayesgm_tpu.utils import get_ADRF

    x, y, v = Sim_Hirano_Imbens_sampler(N=20000, v_dim=200,
                                        seed=args.data_seed).load_all()
    grid = np.linspace(0, 3, 20)
    true = get_ADRF(x_values=grid, dataset="Imbens")

    params = dict(v_dim=200, z_dims=[1, 1, 1, 7], binary_treatment=False,
                  dataset="ess_probe", output_dir="/tmp/ess_probe",
                  use_bnn=True, save_res=False, save_model=False,
                  lr_decay="cosine")
    m = CausalBGM(params, random_seed=seed)
    t0 = time.time()
    m.fit((x, y, v), epochs=100, epochs_per_eval=10, batch_size=32,
          use_egm_init=True, egm_n_iter=30000, egm_batches_per_eval=30000,
          verbose=0)
    t_fit = time.time() - t0

    def arm(tag, burn_in, n_mcmc, ess_target=None):
        t0 = time.time()
        adrf, iv, draws = m.predict(
            (x, y, v), alpha=0.01, n_mcmc=n_mcmc, burn_in=burn_in,
            x_values=grid, q_sd=1.0, ess_target=ess_target,
            return_draws=True)
        kept = draws.shape[1]
        inside = np.mean((true >= iv[:, 0]) & (true <= iv[:, 1]))
        return {
            "tag": tag, "burn_in": burn_in, "kept": kept,
            "total_steps": burn_in + kept,
            "rmse": float(np.sqrt(np.mean((adrf - true) ** 2))),
            "iv_width_mean": float(np.mean(iv[:, 1] - iv[:, 0])),
            "coverage": float(inside),
            "t_predict_s": round(time.time() - t0, 1),
        }

    arms = [arm("full", 5000, 3000)]
    for burn in args.adaptive_burn_ins:
        arms.append(arm(f"adaptive_b{burn}_e{args.ess_target}", burn, 3000,
                        ess_target=args.ess_target))
    rec = dict(seed=seed, t_fit=round(t_fit, 1), ess_target=args.ess_target,
               arms=arms)
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[123, 456, 789])
    p.add_argument("--data_seed", type=int, default=0)
    p.add_argument("--ess_target", type=float, default=400.0)
    p.add_argument("--adaptive_burn_ins", type=int, nargs="+",
                   default=[1000, 2000])
    p.add_argument("--out", default="benchmarks/artifacts/ess_adaptive_r4.jsonl")
    args = p.parse_args()
    for s in args.seeds:
        run_seed(s, args)


if __name__ == "__main__":
    main()
