"""Exhaustive warm-start selector study (VERDICT r3 item 1 groundwork).

The pooled 15-seed flagship median (0.0224) is held above the bar by a right
tail (0.028-0.038 seeds) that earlier studies attribute to the adversarial
EGM warm-start realization; reconstruction quality barely predicts final
ADRF error (RESULTS.md, best-of-3 screen).  This study trains EVERY one of K
warm-start realizations per seed to completion at the exact reference
protocol and records, per candidate:

  - recon:   post-EGM full-data mse_x+mse_y+mse_v (the known-weak signal)
  - adrf0:   post-EGM in-sample ADRF curve (evaluate() with Z=e(V))
  - adrf10:  in-sample ADRF after a 10-epoch probe on a CLONE of the
             post-EGM state (the candidate's own stream is untouched)
  - rmse:    final protocol ADRF RMSE (EGM + 100 epochs + n_mcmc=3000)

so that every selection rule (min-recon, consensus distance on adrf0 /
adrf10, probe drift ||adrf10-adrf0||, oracle) can be scored offline against
what it WOULD have picked.  JSONL written to --out.

Usage:
    python benchmarks/warmstart_selector_study.py --seeds 3 4 5 84 105 --k 4
"""

import argparse
import json
import time

import numpy as np


def snapshot(tree):
    import jax

    return jax.tree.map(lambda a: np.array(a), tree)


def run_candidate(seed, sub, data, grid, true, args):
    import jax

    from bayesgm_tpu.models.causalbgm import CausalBGM

    x, y, v = data
    params = dict(v_dim=args.v_dim, z_dims=[1, 1, 1, 7], binary_treatment=False,
                  dataset="ws_study", output_dir=args.output_dir,
                  use_bnn=True, save_res=False, save_model=False,
                  lr_decay="cosine")
    rs = seed * 10 + sub
    m = CausalBGM(params, random_seed=rs)
    t0 = time.time()
    m.egm_init(data, egm_n_iter=args.egm, egm_batches_per_eval=args.egm, verbose=0)
    t_egm = time.time() - t0

    causal0, mse_x, mse_y, mse_v = m.evaluate(data)
    rec = dict(seed=seed, sub=sub,
               recon=float(mse_x) + float(mse_y) + float(mse_v),
               adrf0=np.asarray(causal0).tolist())

    # 10-epoch probe on a clone: same post-EGM nets, separate stream, so the
    # candidate's own continuation is unaffected by the probe.
    nets_snap = snapshot(m.nets)
    probe = CausalBGM(params, random_seed=rs + 7919)
    probe.nets = jax.tree.map(lambda a: jax.numpy.asarray(a), nets_snap)
    t0 = time.time()
    probe.fit(data, epochs=args.probe_epochs, epochs_per_eval=10**9,
              use_egm_init=True, egm_n_iter=0, egm_batches_per_eval=10**9,
              verbose=0)
    t_probe = time.time() - t0
    causal10, _, _, _ = probe.evaluate(data, data_z=probe.data_z)
    rec["adrf10"] = np.asarray(causal10).tolist()

    # Full protocol continuation on the candidate's own stream.
    t0 = time.time()
    m.fit(data, epochs=args.epochs, epochs_per_eval=10**9,
          use_egm_init=True, egm_n_iter=0, egm_batches_per_eval=10**9,
          verbose=0)
    t_fit = time.time() - t0
    t0 = time.time()
    adrf, _ = m.predict(data, alpha=0.01, n_mcmc=args.n_mcmc,
                        burn_in=args.burn_in, x_values=grid, q_sd=1.0)
    rec.update(rmse=float(np.sqrt(np.mean((adrf - true) ** 2))),
               adrf_final=np.asarray(adrf).tolist(),
               t_egm=round(t_egm, 1), t_probe=round(t_probe, 1),
               t_fit=round(t_fit, 1), t_predict=round(time.time() - t0, 1))
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[3, 4, 5, 84, 105])
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--egm", type=int, default=30000)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--probe_epochs", type=int, default=10)
    p.add_argument("--data_seed", type=int, default=0)
    p.add_argument("--n", type=int, default=20000)
    p.add_argument("--v_dim", type=int, default=200)
    p.add_argument("--n_mcmc", type=int, default=3000)
    p.add_argument("--burn_in", type=int, default=5000)
    p.add_argument("--out", default="/tmp/ws_study.jsonl")
    p.add_argument("--output_dir", default="/tmp/ws_study")
    args = p.parse_args()

    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.utils import get_ADRF

    data = Sim_Hirano_Imbens_sampler(N=args.n, v_dim=args.v_dim,
                                     seed=args.data_seed).load_all()
    grid = np.linspace(0, 3, 20)
    true = get_ADRF(x_values=grid, dataset="Imbens")

    for seed in args.seeds:
        for sub in range(args.k):
            rec = run_candidate(seed, sub, data, grid, true, args)
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"seed {seed} sub {sub}: rmse {rec['rmse']:.4f} "
                  f"recon {rec['recon']:.4f} (egm {rec['t_egm']}s fit {rec['t_fit']}s "
                  f"predict {rec['t_predict']}s)", flush=True)


if __name__ == "__main__":
    main()
