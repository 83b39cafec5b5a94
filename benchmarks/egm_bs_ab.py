"""EGM warm-start batch-size scaling A/B (interleaved, on-chip).

VERDICT r4 #1 named "larger EGM batch sizes" as the unprobed lever on the
~78 s EGM phase.  Hypothesis: the WGAN-GP update pair at bs=32 is
latency-bound in its serial SGD dependency (fit_breakdown: 384 it/s, nets
are [64]*5 MLPs — tiny matmuls), so a larger batch costs nearly the same
per iteration; at equal sample-visits (iters scaled 1/k for batch k*32)
the phase wall-clock drops ~k-fold IF per-iter cost is flat.

This measures the per-iteration cost only.  Whether the OPTIMIZATION
(fewer, larger WGAN-GP updates) reaches the same warm-start quality is a
separate accuracy campaign (hi_protocol --egm_bs, pooled seeds); this
script just establishes the wall-clock ceiling.

Timing discipline as egm_eval_cost.py: per-arm models trace-warmed outside
the timed region, arms interleaved against chip drift, completion forced
by fetching a net leaf.

Usage:  python benchmarks/egm_bs_ab.py [--iters 3000] [--repeats 3]
        [--bs 32 64 128 256]
"""

import argparse
import json
import time

import jax
import numpy as np


def _fetch(m):
    return np.asarray(jax.tree_util.tree_leaves(m.nets["g"])[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--bs", type=int, nargs="+", default=[32, 64, 128, 256])
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--json", default=None)
    args = p.parse_args()

    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM

    x, y, v = Sim_Hirano_Imbens_sampler(N=20000, v_dim=200, seed=0).load_all()

    def make(tag):
        params = dict(v_dim=200, z_dims=[1, 1, 1, 7], binary_treatment=False,
                      dataset=f"egm_bs_{tag}", output_dir="/tmp/egm_bs_ab",
                      use_bnn=True, save_res=False, save_model=False)
        return CausalBGM(params, random_seed=args.seed)

    models = {bs: make(bs) for bs in args.bs}
    for bs, m in models.items():
        t0 = time.perf_counter()
        m.egm_init((x, y, v), egm_n_iter=500, batch_size=bs,
                   egm_batches_per_eval=500, verbose=0)
        _fetch(m)
        print(f"warm bs={bs}: {time.perf_counter() - t0:.1f} s "
              "(includes compile)", flush=True)

    times = {bs: [] for bs in args.bs}
    for _ in range(args.repeats):
        for bs in args.bs:
            m = models[bs]
            t0 = time.perf_counter()
            m.egm_init((x, y, v), egm_n_iter=args.iters, batch_size=bs,
                       egm_batches_per_eval=args.iters, verbose=0)
            _fetch(m)
            times[bs].append(time.perf_counter() - t0)

    base = float(np.median(times[args.bs[0]]))
    rows = []
    for bs in args.bs:
        med = float(np.median(times[bs]))
        k = bs / args.bs[0]
        rows.append({
            "bs": bs,
            "t_s": [round(t, 2) for t in times[bs]],
            "median_s": round(med, 2),
            "ms_per_iter": round(med / args.iters * 1e3, 4),
            "per_iter_vs_bs32": round(med / base, 3),
            # wall-clock factor for the SAME sample-visits (iters/k at bs)
            "equal_data_speedup": round(base / (med / k), 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = {"iters": args.iters, "repeats": args.repeats, "arms": rows}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
