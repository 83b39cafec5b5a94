"""Seeded Sim_Hirano_Imbens flagship benchmark at the exact reference protocol.

Protocol (reference tutorial, docs/source/causalbgm/tutorial_py.ipynb +
src/bayesgm/models/causalbgm/base.py:434-532): n=20000, v_dim=200,
z_dims=[1,1,1,7], BNN, EGM 30000 iters, 100 epochs, predict with n_mcmc=3000,
burn_in=5000, q_sd=1.0, 20-point grid on [0, 3].  Reference headline:
ADRF RMSE 0.0188 (single run).  Round-2 acceptance bar: median RMSE <= 0.022
over 5 seeds.

Usage:
    python benchmarks/hi_protocol.py --seeds 123 456 789 1011 1213
    python benchmarks/hi_protocol.py --seeds 123 --epochs 100 --egm 30000 \
        --kl_weight 1e-4 --lr_z 1e-4   # recipe-sweep overrides

Prints one JSON line per seed plus a summary line; results logged in
RESULTS.md.
"""

import argparse
import json
import time

import numpy as np


def run_seed(seed, args):
    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM
    from bayesgm_tpu.models.ensemble import EnsembleCausalBGM
    from bayesgm_tpu.models.fullmcmc import FullMCMCCausalBGM
    from bayesgm_tpu.models.identifiable import IdentifiableCausalBGM
    from bayesgm_tpu.utils import get_ADRF

    x, y, v = Sim_Hirano_Imbens_sampler(N=20000, v_dim=200, seed=args.data_seed).load_all()

    params = dict(
        v_dim=200, z_dims=list(args.z_dims), binary_treatment=False,
        dataset="HI_protocol", output_dir=args.output_dir,
        use_bnn=not args.no_bnn, save_res=False, save_model=False,
        kl_weight=args.kl_weight, lr=args.lr, lr_theta=args.lr_theta,
        lr_z=args.lr_z, use_z_rec=args.use_z_rec, lr_decay=args.lr_decay,
        g_units=args.g_units, e_units=args.e_units,
        f_units=args.f_units, h_units=args.h_units,
        deconf_weight=args.deconf_weight,
        antithetic_eps=args.antithetic_eps)
    if args.sigma_y is not None:
        params["sigma_y"] = args.sigma_y
    if args.sigma_x is not None:
        params["sigma_x"] = args.sigma_x
    if args.sigma_v is not None:
        params["sigma_v"] = args.sigma_v

    if args.ensemble:
        params["n_members"] = args.ensemble
        cls = EnsembleCausalBGM
    elif args.identifiable:
        cls = IdentifiableCausalBGM
    elif args.fullmcmc:
        cls = FullMCMCCausalBGM
    else:
        cls = CausalBGM
    model = cls(params, random_seed=seed)

    t0 = time.time()
    fit_kw = {"egm_batch_size": args.egm_bs} if args.egm_bs else {}
    model.fit((x, y, v), epochs=args.epochs, epochs_per_eval=10,
              batch_size=32, use_egm_init=not args.no_egm,
              egm_n_iter=args.egm, egm_batches_per_eval=args.egm,
              verbose=0, **fit_kw)
    t_fit = time.time() - t0
    if args.fullmcmc:
        # weight-space HMC over the fitted nets; predict() marginalises
        # over these posterior weight draws (fullmcmc.py run_mcmc_training).
        model.run_mcmc_training((x, y, v))

    grid = np.linspace(0, 3, 20)
    true = get_ADRF(x_values=grid, dataset="Imbens")

    out = dict(seed=seed, best_epoch=getattr(model, "best_epoch", None),
               fit_s=round(t_fit, 1))
    t0 = time.time()
    kw = ({} if (args.identifiable or args.ensemble or args.fullmcmc)
          else dict(use_best_nets=False))
    adrf, iv = model.predict((x, y, v), alpha=0.01, n_mcmc=3000, burn_in=5000,
                             x_values=grid, q_sd=1.0, bs=20000, **kw)
    out["rmse"] = float(np.sqrt(np.mean((adrf - true) ** 2)))
    out["mape"] = float(np.mean(np.abs((adrf - true) / true)))
    out["iv_width_mean"] = float(np.mean(iv[:, 1] - iv[:, 0]))
    out["coverage"] = float(np.mean((true >= iv[:, 0]) & (true <= iv[:, 1])))
    out["predict_s"] = round(time.time() - t0, 1)
    adrf_final = adrf
    if args.also_best and not (args.identifiable or args.ensemble or args.fullmcmc):
        adrf_b, _ = model.predict((x, y, v), alpha=0.01, n_mcmc=3000, burn_in=5000,
                                  x_values=grid, q_sd=1.0, bs=20000, use_best_nets=True)
        out["rmse_best_nets"] = float(np.sqrt(np.mean((adrf_b - true) ** 2)))
    if args.also_swa and not (args.identifiable or args.ensemble or args.fullmcmc):
        adrf_s, _ = model.predict((x, y, v), alpha=0.01, n_mcmc=3000, burn_in=5000,
                                  x_values=grid, q_sd=1.0, bs=20000, use_swa_nets=True)
        out["rmse_swa_nets"] = float(np.sqrt(np.mean((adrf_s - true) ** 2)))
        # snapshot ensemble: average the final-nets and SWA-nets curves
        adrf_e = 0.5 * (adrf_final + adrf_s)
        out["rmse_ensemble"] = float(np.sqrt(np.mean((adrf_e - true) ** 2)))
    if args.dump_curves:
        import os

        os.makedirs(args.dump_curves, exist_ok=True)
        bundle = dict(grid=grid, true=true, adrf=adrf_final)
        if "rmse_swa_nets" in out:
            bundle["adrf_swa"] = adrf_s
        np.savez(f"{args.dump_curves}/curves_seed{seed}.npz", **bundle)
    print(json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[123, 456, 789, 1011, 1213])
    p.add_argument("--data_seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--egm", type=int, default=30000)
    p.add_argument("--egm_bs", type=int, default=0,
                   help="EGM warm-start batch size (0 = the iterative "
                        "phase's 32); probe larger batches with "
                        "proportionally fewer --egm iterations")
    p.add_argument("--no_egm", action="store_true")
    p.add_argument("--no_bnn", action="store_true")
    p.add_argument("--identifiable", action="store_true")
    p.add_argument("--fullmcmc", action="store_true",
                   help="FullMCMCCausalBGM variant (weight-space HMC)")
    p.add_argument("--ensemble", type=int, default=0,
                   help="train a K-member EnsembleCausalBGM instead")
    p.add_argument("--also_best", action="store_true",
                   help="also predict with the best-mse_y nets snapshot")
    p.add_argument("--also_swa", action="store_true",
                   help="also predict with the tail weight-averaged nets")
    p.add_argument("--kl_weight", type=float, default=1e-4)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lr_theta", type=float, default=1e-4)
    p.add_argument("--lr_z", type=float, default=1e-4)
    p.add_argument("--use_z_rec", type=float, default=1.0)
    p.add_argument("--deconf_weight", type=float, default=0.0,
                   help="training-time deconfounding penalty on the f-update "
                        "(squared residual-vs-treatment correlation; 0 = "
                        "reference-exact objective)")
    p.add_argument("--antithetic_eps", action="store_true",
                   help="paired MH launches use antithetic flipout eps "
                        "(set 1 = -set 0) instead of independent sets")
    p.add_argument("--z_dims", type=int, nargs="+", default=[1, 1, 1, 7])
    p.add_argument("--lr_decay", type=str, default=None,
                   choices=[None, "cosine", "linear"])
    p.add_argument("--sigma_v", type=float, default=None)
    p.add_argument("--sigma_x", type=float, default=None)
    p.add_argument("--sigma_y", type=float, default=None)
    p.add_argument("--g_units", type=int, nargs="+", default=[64, 64, 64, 64, 64])
    p.add_argument("--e_units", type=int, nargs="+", default=[64, 64, 64, 64, 64])
    p.add_argument("--f_units", type=int, nargs="+", default=[64, 32, 8])
    p.add_argument("--h_units", type=int, nargs="+", default=[64, 32, 8])
    p.add_argument("--output_dir", type=str, default="/tmp/hi_protocol")
    p.add_argument("--dump_curves", type=str, default=None,
                   help="directory to save per-seed ADRF curves for bias analysis")
    args = p.parse_args()

    results = [run_seed(s, args) for s in args.seeds]
    rmses = sorted(r["rmse"] for r in results)
    summary = dict(median_rmse=float(np.median(rmses)), rmses=rmses,
                   reference_rmse=0.0188, bar=0.022)
    if all("rmse_best_nets" in r for r in results):
        summary["median_rmse_best_nets"] = float(
            np.median([r["rmse_best_nets"] for r in results]))
    if all("rmse_swa_nets" in r for r in results):
        summary["median_rmse_swa_nets"] = float(
            np.median([r["rmse_swa_nets"] for r in results]))
    if all("rmse_ensemble" in r for r in results):
        summary["median_rmse_ensemble"] = float(
            np.median([r["rmse_ensemble"] for r in results]))
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
