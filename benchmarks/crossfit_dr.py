"""Cross-fitted doubly-robust ADRF at the flagship Hirano-Imbens protocol.

VERDICT r3 item 2(i): plain kernel-AIPW (predict(estimator="dr")) keeps the
own-fit correlation between the nuisance estimates and the data they were
trained on; round-3 measured it decorrelating the shared bias (0.32 vs 1.00)
but paying more smoothing error than it removes at n=20000 (RESULTS.md).
Cross-fitting removes the own-fit term: split the sample into two folds,
train a full flagship model per fold, and evaluate each fold's DR estimate
under the OTHER fold's nuisances, sweeping an undersmoothed bandwidth
(scale x Silverman).  The cross-fit estimate is the subject-weighted
average of the two out-of-fold curves.

Protocol per fold: the shipped cosine recipe (configs/Sim_Hirano_Imbens.yaml)
on n=10000 rows (half of the standard n=20000 draw, data_seed=0).

Usage:
    python benchmarks/crossfit_dr.py --seeds 123 456 789 \
        --bw_scales 0.3 0.5 0.75 1.0 --out benchmarks/artifacts/crossfit_dr_r4.jsonl
"""

import argparse
import json
import time

import numpy as np


def run_seed(seed, args):
    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM
    from bayesgm_tpu.utils import get_ADRF

    x, y, v = Sim_Hirano_Imbens_sampler(N=args.n, v_dim=200,
                                        seed=args.data_seed).load_all()
    grid = np.linspace(0, 3, 20)
    true = get_ADRF(x_values=grid, dataset="Imbens")

    rng = np.random.RandomState(seed)
    perm = rng.permutation(args.n)
    folds = [np.sort(perm[: args.n // 2]), np.sort(perm[args.n // 2:])]
    data_f = [tuple(a[f] for a in (x, y, v)) for f in folds]

    def make_model(tag, member_seed):
        params = dict(
            v_dim=200, z_dims=[1, 1, 1, 7], binary_treatment=False,
            dataset=f"crossfit_{tag}", output_dir=args.output_dir,
            use_bnn=True, save_res=False, save_model=False,
            lr_decay="cosine")
        return CausalBGM(params, random_seed=member_seed)

    models = []
    for i, d in enumerate(data_f):
        t0 = time.time()
        m = make_model(f"fold{i}", seed + i)
        m.fit(d, epochs=args.epochs, epochs_per_eval=10, batch_size=32,
              use_egm_init=True, egm_n_iter=args.egm,
              egm_batches_per_eval=args.egm, verbose=0)
        models.append(m)
        print(f"# seed {seed} fold {i} fit {time.time() - t0:.0f}s",
              flush=True)

    # Shared Silverman bandwidth on the FULL treatment sample so every
    # fold/scale estimates the same functional.
    bw0 = float(1.06 * np.std(x) * args.n ** (-0.2))
    kw = dict(alpha=0.01, n_mcmc=args.n_mcmc, burn_in=args.burn_in,
              x_values=grid, q_sd=1.0)

    rec = dict(seed=seed, n=args.n, bw_silverman=bw0, epochs=args.epochs,
               egm=args.egm, results={})

    def rmse(curve):
        return float(np.sqrt(np.mean((np.asarray(curve) - true) ** 2)))

    # Cross-fit PLUGIN control: out-of-fold g-computation isolates how much
    # of any improvement is cross-fitting vs the DR correction itself.
    plug = [models[1 - i].predict(data_f[i], bs=len(data_f[i][0]), **kw)[0]
            for i in range(2)]
    rec["results"]["plugin_crossfit"] = rmse(0.5 * (plug[0] + plug[1]))
    # In-fold plugin (each model on its own training fold) — the standard
    # protocol's analogue at half-n.
    inplug = [models[i].predict(data_f[i], bs=len(data_f[i][0]), **kw)[0]
              for i in range(2)]
    rec["results"]["plugin_infold"] = rmse(0.5 * (inplug[0] + inplug[1]))

    for scale in args.bw_scales:
        bw = scale * bw0
        curves = [models[1 - i].predict(data_f[i], estimator="dr", dr_bw=bw,
                                        bs=len(data_f[i][0]), **kw)[0]
                  for i in range(2)]
        rec["results"][f"dr_crossfit_bw{scale}"] = rmse(
            0.5 * (curves[0] + curves[1]))
        # In-fold DR at the same bandwidth (the round-3 estimator) for the
        # own-fit-correlation comparison.
        incurves = [models[i].predict(data_f[i], estimator="dr", dr_bw=bw,
                                      bs=len(data_f[i][0]), **kw)[0]
                    for i in range(2)]
        rec["results"][f"dr_infold_bw{scale}"] = rmse(
            0.5 * (incurves[0] + incurves[1]))
        print(f"# seed {seed} bw{scale}: crossfit "
              f"{rec['results'][f'dr_crossfit_bw{scale}']:.4f} infold "
              f"{rec['results'][f'dr_infold_bw{scale}']:.4f}", flush=True)

    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[123, 456, 789])
    p.add_argument("--data_seed", type=int, default=0)
    p.add_argument("--n", type=int, default=20000)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--egm", type=int, default=30000)
    p.add_argument("--n_mcmc", type=int, default=3000)
    p.add_argument("--burn_in", type=int, default=5000)
    p.add_argument("--bw_scales", type=float, nargs="+",
                   default=[0.3, 0.5, 0.75, 1.0])
    p.add_argument("--out", default="benchmarks/artifacts/crossfit_dr_r4.jsonl")
    p.add_argument("--output_dir", default="/tmp/crossfit_dr")
    args = p.parse_args()
    for s in args.seeds:
        run_seed(s, args)


if __name__ == "__main__":
    main()
