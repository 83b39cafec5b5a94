"""Study: best-of-3 EGM warm-start restarts (negative-ish result, RESULTS.md).

Usage: python benchmarks/egm_restart_study.py [seeds...]

Hypothesis: the weak-seed tail (1011: 0.0272, 1213: 0.0294 under cosine)
is adversarial warm-start variance.  For each protocol seed, run THREE
EGM warm-starts (sub-seeds), score each by the post-EGM full-data
reconstruction sum (mse_v + mse_x + mse_y with Z = e(V)), continue the
iterative phase only on the best, and predict at the exact protocol.
"""
import sys
import time

import numpy as np

from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
from bayesgm_tpu.models.causalbgm import CausalBGM
from bayesgm_tpu.utils import get_ADRF

x, y, v = Sim_Hirano_Imbens_sampler(N=20000, v_dim=200, seed=0).load_all()
grid = np.linspace(0, 3, 20)
true = get_ADRF(x_values=grid, dataset="Imbens")

for seed in [int(s) for s in (sys.argv[1:] or ["1011", "1213"])]:
    t0 = time.time()
    cands = []
    for sub in range(3):
        params = dict(v_dim=200, z_dims=[1, 1, 1, 7], binary_treatment=False,
                      dataset="egm_restart", output_dir="/tmp/egm_restart",
                      use_bnn=True, save_res=False, save_model=False,
                      lr_decay="cosine")
        m = CausalBGM(params, random_seed=seed * 10 + sub)
        m.egm_init((x, y, v), egm_n_iter=30000, egm_batches_per_eval=30000,
                   verbose=0)
        _, mse_x, mse_y, mse_v = m.evaluate((x, y, v))
        score = float(mse_x) + float(mse_y) + float(mse_v)
        cands.append((score, sub, m))
        print(f"seed {seed} sub {sub}: egm recon score {score:.4f} "
              f"(x {float(mse_x):.3f} y {float(mse_y):.3f} v {float(mse_v):.3f})",
              flush=True)
    score, sub, best = min(cands, key=lambda t: t[0])
    print(f"seed {seed}: picked sub {sub} (score {score:.4f})", flush=True)
    # use_egm_init=True with egm_n_iter=0 -> one no-op-ish EGM iteration on
    # the already-warmed nets, then the protocol's Z = e(V) init (with
    # use_egm_init=False fit draws Z ~ N(0,1), wasting the warm start —
    # that bug produced the first screen's 0.0887).
    best.fit((x, y, v), epochs=100, epochs_per_eval=10, use_egm_init=True,
             egm_n_iter=0, egm_batches_per_eval=10**9, verbose=0)
    adrf, _ = best.predict((x, y, v), alpha=0.01, n_mcmc=3000, burn_in=5000,
                           x_values=grid, q_sd=1.0)
    rmse = float(np.sqrt(np.mean((adrf - true) ** 2)))
    print(f"RESULT seed {seed}: best-of-3-EGM ADRF RMSE {rmse:.4f} "
          f"({time.time()-t0:.0f} s)", flush=True)
