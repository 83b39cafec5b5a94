"""Decompose flagship fit wall-clock: EGM init vs iterative updating.

predict_overhead.py showed the MH chain is 88% of a warm predict; this is
the training-side twin.  The flagship protocol's fit is 30k EGM iterations
(each g_d_freq=5 critic steps + 1 encoder/generator step, bs=32, WGAN-GP)
followed by 100 epochs x 625 batches of iterative updating (reference
causalbgm/base.py fit driver).  Both phases run as on-device lax.scan
chunks (EGM inner length 500), so the measurement is whole-phase
wall-clock on warmed programs: run a short phase first to compile, then
time the full-length phase in the same process.

Usage:  python benchmarks/fit_breakdown.py [--egm 30000] [--epochs 100]
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--egm", type=int, default=30000)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args()

    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM

    x, y, v = Sim_Hirano_Imbens_sampler(N=20000, v_dim=200,
                                        seed=0).load_all()
    params = dict(v_dim=200, z_dims=[1, 1, 1, 7], binary_treatment=False,
                  dataset="fit_breakdown", output_dir="/tmp/fit_breakdown",
                  use_bnn=True, save_res=False, save_model=False,
                  lr_decay="cosine")
    m = CausalBGM(params, random_seed=args.seed)

    # Warm both phases' programs: egm_n_iter=500 compiles the 500-iter scan
    # chunk AND the 1-iter remainder chunk (501 total iterations), exactly
    # the programs the 30000-iter run reuses (see benchmarks/warm_cache.py).
    m.fit((x, y, v), epochs=1, epochs_per_eval=1, use_egm_init=True,
          egm_n_iter=500, egm_batches_per_eval=500, verbose=0)

    # Fresh model, same process: measure warmed full-length phases.
    m2 = CausalBGM(params, random_seed=args.seed)
    t0 = time.perf_counter()
    m2.egm_init((x, y, v), egm_n_iter=args.egm, batch_size=32,
                egm_batches_per_eval=500, verbose=0)
    t_egm = time.perf_counter() - t0
    t0 = time.perf_counter()
    m2.fit((x, y, v), epochs=args.epochs, epochs_per_eval=10 ** 9,
           use_egm_init=False, verbose=0)
    t_iter = time.perf_counter() - t0

    n_batches = args.epochs * (len(x) // 32)
    print(json.dumps({
        "egm_iters": args.egm, "t_egm_s": round(t_egm, 2),
        "egm_iters_per_s": round(args.egm / t_egm, 1),
        "epochs": args.epochs, "train_batches": n_batches,
        "t_iterative_s": round(t_iter, 2),
        "batches_per_s": round(n_batches / t_iter, 1),
        "egm_share_of_fit": round(t_egm / (t_egm + t_iter), 3),
    }))


if __name__ == "__main__":
    main()
