"""Sun shipped-recipe variance decomposition (VERDICT r2 item 10).

The shipped Sun recipe (IdentifiableCausalBGM, z_dims=[3,3,3,7],
configs/Sim_Sun.yaml) spans ADRF RMSE 0.069-0.119 across model seeds on the
same data draw.  This study decomposes that band into its three stochastic
stages with a nested factorial on one fixed data draw:

  EGM warm start   x  training stream (incl. auxiliary-U draw  x  conditional
  prior init)      x  predict chain stream

For each EGM seed the post-EGM nets are snapshotted and continued under
independent training streams; each trained model is predicted twice with
fresh chain streams.  Per-stage variance components of the final RMSE (and
of the ADRF curves) then attribute the band.

Usage:
    python benchmarks/sun_variance_study.py --egm_seeds 42 777 123 \
        --out benchmarks/artifacts/sun_variance_r3.jsonl
"""

import argparse
import json
import time

import numpy as np


def snapshot(tree):
    import jax

    return jax.tree.map(lambda a: np.array(a), tree)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--egm_seeds", type=int, nargs="+", default=[42, 777, 123])
    p.add_argument("--train_subs", type=int, default=2)
    p.add_argument("--predict_reps", type=int, default=2)
    p.add_argument("--egm", type=int, default=30000)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--n_mcmc", type=int, default=3000)
    p.add_argument("--burn_in", type=int, default=5000)
    p.add_argument("--data_seed", type=int, default=0)
    p.add_argument("--n", type=int, default=20000)
    p.add_argument("--out", default="benchmarks/artifacts/sun_variance_r3.jsonl")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from bayesgm_tpu.datasets import Sim_Sun_sampler
    from bayesgm_tpu.models.identifiable import IdentifiableCausalBGM
    from bayesgm_tpu.utils import get_ADRF

    x, y, v = Sim_Sun_sampler(N=args.n, v_dim=200,
                              seed=args.data_seed).load_all()
    lo, hi = np.quantile(x, [0.05, 0.95])
    grid = np.linspace(lo, hi, 20)
    true = get_ADRF(x_values=grid, dataset="Sun")

    params = dict(v_dim=200, z_dims=[3, 3, 3, 7], binary_treatment=False,
                  dataset="Sun_var", output_dir="/tmp/sun_var",
                  use_bnn=True, save_res=False, save_model=False)

    def emit(rec):
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps({k: rec[k] for k in rec
                          if k not in ("adrf", "adrf_insample", "grid")}),
              flush=True)

    rows = []
    for egm_seed in args.egm_seeds:
        m0 = IdentifiableCausalBGM(params, random_seed=egm_seed)
        t0 = time.time()
        m0.egm_init((x, y, v), egm_n_iter=args.egm,
                    egm_batches_per_eval=args.egm, verbose=0)
        t_egm = time.time() - t0
        causal0, mse_x, mse_y, mse_v = m0.evaluate((x, y, v))[:4]
        nets0 = snapshot(m0.nets)
        recon = float(mse_x) + float(mse_y) + float(mse_v)

        for sub in range(args.train_subs):
            m = IdentifiableCausalBGM(
                params, random_seed=egm_seed * 100 + 10 * sub + 7)
            m.nets = jax.tree.map(jax.numpy.asarray, nets0)
            t0 = time.time()
            m.fit((x, y, v), epochs=args.epochs, epochs_per_eval=10 ** 9,
                  use_egm_init=True, egm_n_iter=0,
                  egm_batches_per_eval=10 ** 9, verbose=0)
            t_fit = time.time() - t0
            adrf_in = m.evaluate((x, y, v), data_z=m.data_z)[0]
            adrf_in = np.asarray(adrf_in)

            for rep in range(args.predict_reps):
                t0 = time.time()
                adrf, _ = m.predict((x, y, v), alpha=0.01,
                                    n_mcmc=args.n_mcmc, burn_in=args.burn_in,
                                    x_values=grid, q_sd=1.0)
                rec = dict(egm_seed=egm_seed, sub=sub, rep=rep,
                           recon=recon,
                           rmse=float(np.sqrt(np.mean((adrf - true) ** 2))),
                           t_egm=round(t_egm, 1), t_fit=round(t_fit, 1),
                           t_predict=round(time.time() - t0, 1),
                           adrf=[float(a) for a in adrf],
                           adrf_insample=[float(a) for a in adrf_in],
                           grid=[float(g) for g in grid])
                emit(rec)
                rows.append(rec)

    # --- variance decomposition on the final RMSE -------------------------
    # nested ANOVA-style components: rep-within-train (chain), train-within-
    # egm (training stream), egm (warm start).
    def comp(rows):
        r = {}
        for rec in rows:
            r.setdefault((rec["egm_seed"], rec["sub"]), []).append(rec["rmse"])
        within_train = np.mean([np.var(v) for v in r.values()])
        train_means = {}
        for (e, s), v in r.items():
            train_means.setdefault(e, []).append(np.mean(v))
        within_egm = np.mean([np.var(v) for v in train_means.values()])
        egm_means = [np.mean(v) for v in train_means.values()]
        across_egm = np.var(egm_means)
        return dict(chain_var=float(within_train),
                    train_var=float(within_egm),
                    warmstart_var=float(across_egm),
                    chain_sd=float(np.sqrt(within_train)),
                    train_sd=float(np.sqrt(within_egm)),
                    warmstart_sd=float(np.sqrt(across_egm)),
                    grand_median=float(np.median([x["rmse"] for x in rows])))

    print("DECOMP " + json.dumps(comp(rows)), flush=True)


if __name__ == "__main__":
    main()
