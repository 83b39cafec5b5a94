"""Summarize benchmarks/deconfound_study.py output.

Prints per-variant RMSE stats, per-seed tables, and a bias decomposition:
for each variant the cross-seed MEAN curve error (shared bias) vs the
cross-seed sd (seed noise), plus the correlation of each variant's bias
curve with the baseline's (does the variant remove or merely reshape the
leak?).

Usage:
    python benchmarks/deconfound_analyze.py benchmarks/artifacts/deconfound_r3.jsonl
"""

import json
import sys
from collections import defaultdict

import numpy as np


def main(path):
    rows = [json.loads(l) for l in open(path) if l.strip()]
    by_variant = defaultdict(list)
    for r in rows:
        by_variant[r["variant"]].append(r)

    # truth from any row's grid
    from bayesgm_tpu.utils import get_ADRF

    grid = np.asarray(rows[0]["grid"])
    true = get_ADRF(x_values=grid, dataset="Imbens")

    known = ["A", "B", "B0", "C", "D", "E", "F"]
    order = ([v for v in known if v in by_variant]
             + sorted(set(by_variant) - set(known)))

    print(f"{'variant':8s} {'n':>3s} {'median':>8s} {'mean':>8s} {'min':>8s} "
          f"{'max':>8s} {'biasRMSE':>9s} {'sdRMSE':>8s} {'corrA':>6s}")
    bias_a = None
    for v in order:
        rs = sorted(by_variant[v], key=lambda r: r["seed"])
        rmses = np.array([r["rmse"] for r in rs])
        curves = np.array([r["adrf"] for r in rs])  # (seeds, grid)
        bias = curves.mean(axis=0) - true
        sd = curves.std(axis=0)
        if v == "A":
            bias_a = bias
        corr = (np.corrcoef(bias, bias_a)[0, 1]
                if bias_a is not None else np.nan)
        print(f"{v:8s} {len(rs):3d} {np.median(rmses):8.4f} "
              f"{rmses.mean():8.4f} {rmses.min():8.4f} {rmses.max():8.4f} "
              f"{np.sqrt((bias ** 2).mean()):9.4f} "
              f"{np.sqrt((sd ** 2).mean()):8.4f} {corr:6.2f}")

    print("\nper-seed RMSE:")
    seeds = sorted({r["seed"] for r in rows})
    hdr = "seed " + " ".join(f"{v:>8s}" for v in order)
    print(hdr)
    for s in seeds:
        cells = []
        for v in order:
            match = [r for r in by_variant[v] if r["seed"] == s]
            cells.append(f"{match[0]['rmse']:8.4f}" if match else f"{'-':>8s}")
        print(f"{s:<4d} " + " ".join(cells))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "benchmarks/artifacts/deconfound_r3.jsonl")
