"""Decompose flagship predict wall-clock: chain steps vs fixed overhead.

The round-4 ESS-adaptive probe (RESULTS.md) showed halving total chain steps
(8000 -> 4000) barely moves predict wall-clock at the flagship shape
(n=20000, v_dim=200, BNN): the fused chain costs ~4 s, predict ~15-20 s.
This probe pins down where the rest goes, via the two-length method on
WHOLE warm predicts (every program already compiled by the first call):

    per_step = (t(8000 steps) - t(4000 steps)) / 4000     [cross-check 2k]
    overhead = t(2000 steps) - 2000 * per_step

and then times the known fixed pieces host-side (data conversion, init
draw, effect aggregation/quantiles) to attribute the remainder.

Run on the TPU chip (after the round's campaign queue — single chip):
    python benchmarks/predict_overhead.py
"""

import json
import time

import numpy as np


def main():
    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM

    n, v_dim = 20000, 200
    x, y, v = Sim_Hirano_Imbens_sampler(N=n, v_dim=v_dim, seed=0).load_all()
    grid = np.linspace(0, 3, 20)

    params = dict(v_dim=v_dim, z_dims=[1, 1, 1, 7], binary_treatment=False,
                  dataset="predict_overhead", output_dir="/tmp/po",
                  use_bnn=True, save_res=False, save_model=False)
    m = CausalBGM(params, random_seed=123)
    # Short fit: predict cost does not depend on fit quality.
    m.fit((x, y, v), epochs=2, epochs_per_eval=2, batch_size=32,
          use_egm_init=True, egm_n_iter=499, verbose=0)

    def t_predict(burn_in, n_mcmc, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            m.predict((x, y, v), alpha=0.01, n_mcmc=n_mcmc, burn_in=burn_in,
                      x_values=grid, q_sd=1.0)
            ts.append(time.perf_counter() - t0)
        return min(ts), ts

    # Warm every program shape once (chunked chain: all arms share the same
    # 500-step chunk program, so one warm call covers them all).
    t_predict(1000, 1000, reps=1)

    t8, raw8 = t_predict(5000, 3000)
    t4, raw4 = t_predict(1000, 3000)
    t2, raw2 = t_predict(1000, 1000)
    per_step_a = (t8 - t4) / 4000.0
    per_step_b = (t4 - t2) / 2000.0
    per_step = (t8 - t2) / 6000.0
    overhead = t2 - 2000.0 * per_step

    print(json.dumps({
        "t_8000": round(t8, 3), "t_4000": round(t4, 3), "t_2000": round(t2, 3),
        "raw": {"8000": [round(t, 2) for t in raw8],
                "4000": [round(t, 2) for t in raw4],
                "2000": [round(t, 2) for t in raw2]},
        "per_step_ms_hi": round(per_step_a * 1e3, 4),
        "per_step_ms_lo": round(per_step_b * 1e3, 4),
        "per_step_ms": round(per_step * 1e3, 4),
        "steps_per_s": round(1.0 / per_step, 1),
        "fixed_overhead_s": round(overhead, 3),
        "chain_frac_at_8000": round(8000.0 * per_step / t8, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
