"""ESS-adaptive fast-predict validation on the remaining datasets.

VERDICT r4 #4: the fast-predict recipe (burn_in=1000 + ess_target=400,
default schedule 5000+3000) was validated on flagship + Colangelo only.
This harness runs the full-vs-adaptive A/B on:

- ``binary``: the seeded semi-synthetic binary-ITE benchmark
  (benchmarks/binary_ate.py protocol: z_dims [3,6,3,6], BNN, EGM 30k,
  100 epochs) — metrics dATE, PEHE, ITE 95% coverage; the early-stop gate
  here monitors the PER-SUBJECT effect series (the (steps, n) collect).
- ``sun``: the shipped Sim_Sun recipe (configs/Sim_Sun.yaml: identifiable
  model, z_dims [3,3,3,7]) — ADRF RMSE/width/coverage on the 20-pt grid.

Usage:
    python benchmarks/ess_adaptive_multi.py --dataset binary \
        --seeds 123 456 789 --out benchmarks/artifacts/ess_binary_r5.jsonl
"""

import argparse
import importlib.util
import json
import os
import time

import numpy as np


def _load_binary_data(data_seed):
    spec = importlib.util.spec_from_file_location(
        "binary_ate", os.path.join(os.path.dirname(__file__), "binary_ate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.make_data(n=10000, v_dim=100, data_seed=data_seed)


def _schedule(args):
    if args.quick:
        return dict(epochs=2, egm=60, full=(60, 40), adapt_burn=30)
    return dict(epochs=100, egm=30000, full=(5000, 3000), adapt_burn=1000)


def run_binary(seed, args):
    from bayesgm_tpu.models.causalbgm import CausalBGM

    sch = _schedule(args)
    x, y, v, tau = _load_binary_data(args.data_seed)
    if args.quick:
        x, y, v, tau = x[:300], y[:300], v[:300, :10], tau[:300]
    params = dict(v_dim=v.shape[1], z_dims=[3, 6, 3, 6],
                  binary_treatment=True, dataset="ess_binary",
                  output_dir="/tmp/ess_binary", use_bnn=True,
                  save_res=False, save_model=False)
    m = CausalBGM(params, random_seed=seed)
    t0 = time.time()
    m.fit((x, y, v), epochs=sch["epochs"], epochs_per_eval=10, batch_size=32,
          use_egm_init=True, egm_n_iter=sch["egm"],
          egm_batches_per_eval=sch["egm"], verbose=0)
    t_fit = time.time() - t0
    ate_true = float(tau.mean())

    def arm(tag, burn_in, n_mcmc, ess_target=None):
        t0 = time.time()
        out = m.predict((x, y, v), alpha=0.05, n_mcmc=n_mcmc,
                        burn_in=burn_in, q_sd=1.0, ess_target=ess_target,
                        return_draws=True)
        ite, iv, draws = out
        kept = draws.shape[0]  # binary draw matrix is (kept_steps, n_test)
        return {
            "tag": tag, "burn_in": burn_in, "kept": int(kept),
            "total_steps": burn_in + int(kept),
            "d_ate": round(abs(float(np.mean(ite)) - ate_true), 4),
            "pehe": round(float(np.sqrt(np.mean((ite - tau) ** 2))), 4),
            "ite_coverage": round(float(np.mean(
                (iv[:, 0] <= tau) & (tau <= iv[:, 1]))), 3),
            "iv_width_mean": round(float(np.mean(iv[:, 1] - iv[:, 0])), 4),
            "t_predict_s": round(time.time() - t0, 1),
        }

    arms = [arm("full", burn_in=sch["full"][0], n_mcmc=sch["full"][1]),
            arm(f"adaptive_b{sch['adapt_burn']}_e{args.ess_target:.0f}",
                burn_in=sch["adapt_burn"], n_mcmc=sch["full"][1],
                ess_target=args.ess_target)]
    return {"dataset": "binary", "seed": seed, "t_fit": round(t_fit, 1),
            "ess_target": args.ess_target, "arms": arms}


def run_sun(seed, args):
    from bayesgm_tpu.datasets import Sim_Sun_sampler
    from bayesgm_tpu.models.identifiable import IdentifiableCausalBGM
    from bayesgm_tpu.utils import get_ADRF

    sch = _schedule(args)
    n = 300 if args.quick else 20000
    v_dim = 20 if args.quick else 200
    x, y, v = Sim_Sun_sampler(N=n, v_dim=v_dim,
                              seed=args.data_seed).load_all()
    lo, hi = np.quantile(x, [0.05, 0.95])
    grid = np.linspace(lo, hi, 20)
    true = get_ADRF(x_values=grid, dataset="Sun")
    params = dict(v_dim=v_dim, z_dims=[3, 3, 3, 7], binary_treatment=False,
                  dataset="ess_sun", output_dir="/tmp/ess_sun",
                  use_bnn=True, save_res=False, save_model=False)
    m = IdentifiableCausalBGM(params, random_seed=seed)
    t0 = time.time()
    m.fit((x, y, v), epochs=sch["epochs"], epochs_per_eval=10, batch_size=32,
          use_egm_init=True, egm_n_iter=sch["egm"],
          egm_batches_per_eval=sch["egm"], verbose=0)
    t_fit = time.time() - t0

    def arm(tag, burn_in, n_mcmc, ess_target=None):
        t0 = time.time()
        adrf, iv, draws = m.predict(
            (x, y, v), alpha=0.01, n_mcmc=n_mcmc, burn_in=burn_in,
            x_values=grid, q_sd=1.0, ess_target=ess_target,
            return_draws=True)
        kept = draws.shape[1]
        return {
            "tag": tag, "burn_in": burn_in, "kept": int(kept),
            "total_steps": burn_in + int(kept),
            "rmse": round(float(np.sqrt(np.mean((adrf - true) ** 2))), 4),
            "iv_width_mean": round(float(np.mean(iv[:, 1] - iv[:, 0])), 4),
            "coverage": round(float(np.mean(
                (true >= iv[:, 0]) & (true <= iv[:, 1]))), 3),
            "t_predict_s": round(time.time() - t0, 1),
        }

    arms = [arm("full", burn_in=sch["full"][0], n_mcmc=sch["full"][1]),
            arm(f"adaptive_b{sch['adapt_burn']}_e{args.ess_target:.0f}",
                burn_in=sch["adapt_burn"], n_mcmc=sch["full"][1],
                ess_target=args.ess_target)]
    return {"dataset": "sun", "seed": seed, "t_fit": round(t_fit, 1),
            "ess_target": args.ess_target, "arms": arms}


def main():
    from bayesgm_tpu.utils.runtime import force_cpu_if_requested

    force_cpu_if_requested()
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["binary", "sun"], required=True)
    p.add_argument("--seeds", type=int, nargs="+", default=[123, 456, 789])
    p.add_argument("--data-seed", type=int, default=7)
    p.add_argument("--ess-target", type=float, default=400.0)
    p.add_argument("--quick", action="store_true", help="CPU wiring smoke")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    out = args.out or (f"benchmarks/artifacts/ess_{args.dataset}_r5.jsonl")
    runner = run_binary if args.dataset == "binary" else run_sun
    for seed in args.seeds:
        rec = runner(seed, args)
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print("RESULT", json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
