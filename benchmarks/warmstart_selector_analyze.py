"""Offline analysis for warmstart_selector_study.py JSONL output.

Scores every candidate selection rule against the oracle on groups of K
fully-trained warm-start realizations (all candidates share one dataset):

  recon      : min post-EGM reconstruction sum (known-weak baseline)
  cons0      : min L2 distance of the post-EGM in-sample ADRF curve to the
               group's pointwise-median curve
  cons10     : same on the 10-epoch-probe curve
  drift      : min ||adrf10 - adrf0|| (probe stability, group-free)
  first      : sub 0 (no selection — the status quo)
  oracle/anti: best / worst final RMSE in the group

Also prints pooled Spearman rank correlations of each signal vs final RMSE.

Usage: python benchmarks/warmstart_selector_analyze.py /tmp/ws_study.jsonl
"""

import json
import sys
from collections import defaultdict

import numpy as np


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))


def main(path):
    groups = defaultdict(list)
    for line in open(path):
        r = json.loads(line)
        groups[r["seed"]].append(r)
    for g in groups.values():
        g.sort(key=lambda r: r["sub"])

    all_rmse, sig = [], defaultdict(list)
    picks = defaultdict(list)
    for seed, g in sorted(groups.items()):
        rmse = np.array([r["rmse"] for r in g])
        recon = np.array([r["recon"] for r in g])
        a0 = np.array([r["adrf0"] for r in g])     # (K, 200)
        a10 = np.array([r["adrf10"] for r in g])
        d0 = np.linalg.norm(a0 - np.median(a0, axis=0), axis=1)
        d10 = np.linalg.norm(a10 - np.median(a10, axis=0), axis=1)
        drift = np.linalg.norm(a10 - a0, axis=1)

        all_rmse.extend(rmse)
        for name, s in [("recon", recon), ("cons0", d0), ("cons10", d10),
                        ("drift", drift)]:
            sig[name].extend(s)
            picks[name].append(rmse[int(np.argmin(s))])
        picks["first"].append(rmse[0])
        picks["oracle"].append(rmse.min())
        picks["anti"].append(rmse.max())
        picks["groupmed"].append(float(np.median(rmse)))

        print(f"group {seed}: rmse {np.round(rmse, 4).tolist()}")
        print(f"  recon {np.round(recon, 3).tolist()}  -> pick sub {int(np.argmin(recon))}")
        print(f"  cons0 {np.round(d0, 3).tolist()}  -> pick sub {int(np.argmin(d0))}")
        print(f"  cons10 {np.round(d10, 3).tolist()} -> pick sub {int(np.argmin(d10))}")
        print(f"  drift {np.round(drift, 3).tolist()} -> pick sub {int(np.argmin(drift))}")

    all_rmse = np.array(all_rmse)
    print(f"\npooled candidates: n={len(all_rmse)} median {np.median(all_rmse):.4f} "
          f"IQR [{np.quantile(all_rmse, .25):.4f}, {np.quantile(all_rmse, .75):.4f}]")
    print("\nSpearman(signal, final rmse) pooled within-... over all candidates:")
    for name in ("recon", "cons0", "cons10", "drift"):
        print(f"  {name:7s}: {spearman(np.array(sig[name]), all_rmse):+.3f}")
    print("\nselector -> per-group picked RMSEs (median):")
    for name in ("first", "recon", "cons0", "cons10", "drift", "groupmed",
                 "oracle", "anti"):
        v = np.array(picks[name])
        print(f"  {name:8s}: {np.round(v, 4).tolist()}  median {np.median(v):.4f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ws_study.jsonl")
