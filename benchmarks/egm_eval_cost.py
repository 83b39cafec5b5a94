"""Measure the EGM phase's logging-evaluate cost (interleaved A/B on-chip).

egm_breakdown.py measures the pure EGM iteration at ~0.48 ms; the
production egm_init additionally ran a full evaluate() (200-point ADRF
grid x full-data BNN forwards, ~0.4-0.6 s) every 500 iterations whose
result nothing consumes at save_res=False.  CausalBGM.egm_init now skips
that compute — stream-preserving: the chain key still advances
(tests/test_models.py::test_egm_eval_skip_is_stream_preserving pins
bit-identical nets) — and no longer host-syncs the loss dict per chunk.

Timing discipline (r5): block_until_ready through the tunneled chip has
been observed returning BEFORE the work completes (a 5000-iter scan
"finished" in 0.01 s), and Python tracing of a fresh model's scan costs
seconds of host CPU.  So each arm's model is created and TRACE-WARMED
outside the timed region, arms are INTERLEAVED against chip drift, and
completion is forced by fetching a result leaf to host.

- skip arm: save_res=False -> evals skipped (new default behavior)
- eval arm: save_res=True  -> evals computed every 500 iters (the old
  unconditional behavior; the txt writes are host-side and tiny)

Usage:  python benchmarks/egm_eval_cost.py [--iters 5000] [--repeats 3]
"""

import argparse
import json
import time

import jax
import numpy as np


def _fetch(m):
    """Force completion by value transfer of a trained-net leaf."""
    return np.asarray(jax.tree_util.tree_leaves(m.nets["g"])[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5000)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--json", default=None)
    args = p.parse_args()

    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM

    x, y, v = Sim_Hirano_Imbens_sampler(N=20000, v_dim=200, seed=0).load_all()

    def make(save_res):
        params = dict(v_dim=200, z_dims=[1, 1, 1, 7], binary_treatment=False,
                      dataset="egm_eval_cost", output_dir="/tmp/egm_eval_cost",
                      use_bnn=True, save_res=save_res, save_model=False)
        return CausalBGM(params, random_seed=args.seed)

    models = {"skip": make(False), "eval": make(True)}
    # Trace + compile warm-up per arm (egm chunk at inner length AND the
    # 1-iter remainder, plus the eval program), excluded from timing.
    for m in models.values():
        m.egm_init((x, y, v), egm_n_iter=500, batch_size=32,
                   egm_batches_per_eval=500, verbose=0)
        _fetch(m)

    m = models["eval"]
    t0 = time.perf_counter()
    out = m.evaluate((x, y, v))
    np.asarray(out[0])
    t_eval = time.perf_counter() - t0

    times = {"skip": [], "eval": []}
    for _ in range(args.repeats):
        for arm in ("skip", "eval"):
            mm = models[arm]
            t0 = time.perf_counter()
            mm.egm_init((x, y, v), egm_n_iter=args.iters, batch_size=32,
                        egm_batches_per_eval=500, verbose=0)
            _fetch(mm)
            times[arm].append(time.perf_counter() - t0)

    med_skip = float(np.median(times["skip"]))
    med_eval = float(np.median(times["eval"]))
    n_evals = args.iters // 500 + 1
    out = {
        "iters": args.iters, "repeats": args.repeats,
        "t_eval_once_s": round(t_eval, 3),
        "t_skip_s": [round(t, 2) for t in times["skip"]],
        "t_eval_s": [round(t, 2) for t in times["eval"]],
        "median_skip_s": round(med_skip, 2),
        "median_eval_s": round(med_eval, 2),
        "speedup_egm_phase": round(med_eval / med_skip, 3),
        "implied_eval_total_s": round(t_eval * n_evals, 2),
        "ms_per_iter_skip": round(med_skip / args.iters * 1e3, 4),
    }
    print(json.dumps(out))
    if args.json:
        with open(args.json, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
