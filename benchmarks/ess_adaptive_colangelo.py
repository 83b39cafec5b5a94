"""ESS-adaptive predict generalization check on the Colangelo recipe.

The flagship (Hirano-Imbens) study showed equal RMSE/width/coverage at
3500-4000 of 8000 steps on all five canonical seeds (RESULTS.md round 4).
This probe asks whether the fast-predict recipe (burn_in=1000 +
ess_target=400) transfers to a second continuous-treatment dataset with a
different recipe (Colangelo: v_dim=100, z_dims [5,5,5,5], constant rate —
reference protocol, base RMSE ~0.0557).

Usage:
    python benchmarks/ess_adaptive_colangelo.py --seeds 123 456 789 \
        --out benchmarks/artifacts/ess_adaptive_colangelo_r4.jsonl
"""

import argparse
import json
import time

import numpy as np


def run_seed(seed, args):
    from bayesgm_tpu.datasets import Sim_Colangelo_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM
    from bayesgm_tpu.utils import get_ADRF

    x, y, v = Sim_Colangelo_sampler(N=20000, v_dim=100,
                                    seed=args.data_seed).load_all()
    lo, hi = np.quantile(x, [0.05, 0.95])
    grid = np.linspace(lo, hi, 20)
    true = get_ADRF(x_values=grid, dataset="Lee")

    # configs/Sim_Colangelo.yaml recipe (reference protocol; probes in
    # RESULTS.md round 2 found every alternative worse, so keep as-is).
    params = dict(v_dim=100, z_dims=[5, 5, 5, 5], binary_treatment=False,
                  dataset="ess_colangelo", output_dir="/tmp/ess_colangelo",
                  use_bnn=True, save_res=False, save_model=False,
                  lr_theta=1e-4, lr_z=1e-4, lr=2e-4, kl_weight=1e-4,
                  g_units=[64, 64, 64, 64, 64], f_units=[64, 32, 8],
                  h_units=[64, 32, 8], e_units=[64, 64, 64, 64, 64],
                  dz_units=[64, 32, 8], g_d_freq=5, use_z_rec=True)
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

    arms = [
        arm("full", burn_in=5000, n_mcmc=3000),
        arm(f"adaptive_b1000_e{args.ess_target}", burn_in=1000,
            n_mcmc=3000, ess_target=args.ess_target),
    ]
    return {"seed": seed, "t_fit": round(t_fit, 1),
            "ess_target": args.ess_target, "arms": arms}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[123, 456, 789])
    p.add_argument("--data-seed", type=int, default=0)
    p.add_argument("--ess-target", type=float, default=400.0)
    p.add_argument("--out", default="benchmarks/artifacts/"
                   "ess_adaptive_colangelo_r4.jsonl")
    args = p.parse_args()
    for seed in args.seeds:
        rec = run_seed(seed, args)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print("RESULT", json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
