"""IdentifiableCausalBGM on the Sun and Colangelo recipes (reference
protocol predict; base-model numbers: Sun 0.1483 / Colangelo 0.0557)."""
import time

import numpy as np

from bayesgm_tpu.datasets import Sim_Colangelo_sampler, Sim_Sun_sampler
from bayesgm_tpu.models.identifiable import IdentifiableCausalBGM
from bayesgm_tpu.utils import get_ADRF

RUNS = [
    ("SUN", Sim_Sun_sampler(N=20000, v_dim=200), "Sun",
     dict(v_dim=200, z_dims=[1, 1, 1, 7])),
    ("COLANGELO", Sim_Colangelo_sampler(N=20000, v_dim=100), "Lee",
     dict(v_dim=100, z_dims=[5, 5, 5, 5])),
]

for name, ds, oracle, extra in RUNS:
    x, y, v = ds.load_all()
    params = dict(binary_treatment=False, dataset=f"ivae_{name}",
                  output_dir="/tmp/ivae_sc", use_bnn=True,
                  save_res=False, save_model=False, **extra)
    m = IdentifiableCausalBGM(params, random_seed=42)
    t0 = time.time()
    m.fit((x, y, v), epochs=100, epochs_per_eval=10, use_egm_init=True,
          egm_n_iter=30000, egm_batches_per_eval=30000, verbose=0)
    t_fit = time.time() - t0
    lo, hi = np.quantile(x, [0.05, 0.95])
    grid = np.linspace(lo, hi, 20)
    true = get_ADRF(x_values=grid, dataset=oracle)
    t0 = time.time()
    adrf, _ = m.predict((x, y, v), alpha=0.01, n_mcmc=3000, burn_in=5000,
                        x_values=grid, q_sd=1.0)
    rmse = float(np.sqrt(np.mean((adrf - true) ** 2)))
    mape = float(np.mean(np.abs((adrf - true) / true)))
    print(f"RESULT {name} identifiable: ADRF RMSE {rmse:.4f} MAPE {mape:.4f} "
          f"(fit {t_fit:.0f} s, predict {time.time()-t0:.0f} s)", flush=True)
