"""Compare the in-image REFERENCE flagship campaign against ours.

Inputs (JSONL):
  - benchmarks/artifacts/ref_hi_r{4,3}.jsonl (run_reference_hi.py output;
    newest round present wins)
  - benchmarks/artifacts/deconfound_r3.jsonl (our variant-A baseline runs,
    same data draw data_seed=0, exact protocol)

Reports per-implementation seed distributions and — the round-3 question —
whether the reference's across-seed MEAN-BIAS curve matches ours (the
shared ~0.017 bias our elimination studies attribute to the published
algorithm+protocol itself).  A high correlation + similar magnitude means
the residual flagship gap is inherent to the method, not our build.

Usage:  python benchmarks/refrun/analyze.py
"""

import json
import os

import numpy as np

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "artifacts")


def load(path):
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def main():
    # Prefer the newest campaign artifact present.
    ref = []
    for name in ("ref_hi_r4.jsonl", "ref_hi_r3.jsonl"):
        p = os.path.join(ART, name)
        if os.path.exists(p):
            ref = load(p)
            break
    ours = [r for r in load(os.path.join(ART, "deconfound_r3.jsonl"))
            if r["variant"] == "A"]
    if not ref:
        raise SystemExit("no reference seeds recorded yet")

    grid = np.asarray(ref[0]["grid"])
    true = grid + 2.0 / (1.0 + grid) ** 3

    def stats(recs, name):
        rmses = np.asarray([r["rmse"] for r in recs])
        curves = np.stack([np.asarray(r["adrf"], np.float64) for r in recs])
        bias = curves.mean(0) - true
        print(json.dumps({
            "impl": name, "n_seeds": len(recs),
            "rmse_per_seed": [round(float(r), 4) for r in np.sort(rmses)],
            "rmse_median": round(float(np.median(rmses)), 4),
            "mean_bias_rmse": round(float(np.sqrt(np.mean(bias ** 2))), 4),
        }))
        return bias

    b_ref = stats(ref, "reference (TF, in-image shim)")
    b_ours = stats(ours, "bayesgm_tpu (variant A baseline)")
    # correlation of the across-seed mean-bias curves (drop endpoints the
    # same way the deconfound analysis does not — keep all 20 points)
    c = float(np.corrcoef(b_ref, b_ours)[0, 1])
    print(json.dumps({"bias_curve_correlation": round(c, 3),
                      "ref_bias": [round(float(b), 4) for b in b_ref],
                      "ours_bias": [round(float(b), 4) for b in b_ours]}))


if __name__ == "__main__":
    main()
