"""Statistical parity gate: fused flipout-BNN Pallas kernel vs XLA composite.

The BNN log-posterior target is stochastic (fresh flipout weight noise per
evaluation, reference causalbgm/base.py:765-817 with DenseFlipout nets), so
the kernel (on-core TPU PRNG) and the XLA composite (threefry) can only be
compared in distribution: per-row mean and std of the negative log-posterior
over K independent evaluations must agree within Monte-Carlo error.

Run on the TPU chip after any kernel change:

    python benchmarks/bnn_kernel_parity.py          # ~2 min

Prints one JSON line; ``ok`` requires the median per-row |mean diff| to be
below 3x the Monte-Carlo standard error and the median std ratio within 5%.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np


def main(n=2048, v_dim=200, K=200):
    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models import causalbgm as cb
    from bayesgm_tpu.models.causalbgm import CausalBGM
    from bayesgm_tpu.ops import pallas_kernels as pk

    x, y, v = Sim_Hirano_Imbens_sampler(batch_size=32, N=n, v_dim=v_dim,
                                        seed=0).load_all()
    m = CausalBGM(dict(v_dim=v_dim, z_dims=[1, 1, 1, 7],
                       binary_treatment=False, dataset="bnn_parity",
                       output_dir="/tmp/bnn_parity", use_bnn=True,
                       save_res=False, save_model=False), random_seed=123)
    cfg = m.cfg
    dims = (pk.flipout_mlp_layer_dims(m.nets["g"]),
            pk.flipout_mlp_layer_dims(m.nets["h"]),
            pk.flipout_mlp_layer_dims(m.nets["f"]))
    gf = pk.flatten_flipout_params(m.nets["g"])
    hf = pk.flatten_flipout_params(m.nets["h"])
    ff = pk.flatten_flipout_params(m.nets["f"])
    xs, ys, vs = (jnp.asarray(a) for a in (x, y, v))
    zs = jax.random.normal(jax.random.PRNGKey(0), (n, sum(cfg.z_dims)))

    fused_raw = pk.make_fused_causal_logp_bnn(cfg, *dims)
    # jit once with the seed as an argument: repeated draws reuse ONE
    # compiled program each (re-tracing a pallas_call per draw costs seconds
    # per call through the remote-compile tunnel).
    fused = jax.jit(lambda seed: fused_raw(zs, xs, ys, vs, seed, gf, hf, ff))
    xla = jax.jit(lambda key: cb._neg_log_posterior_rows(
        cfg, m.nets, zs, xs, ys, vs, key))

    a = np.stack([np.asarray(fused(pk.key_to_seed(jax.random.PRNGKey(100 + i))))
                  for i in range(K)])
    b = np.stack([np.asarray(xla(jax.random.PRNGKey(500 + i)))
                  for i in range(K)])

    mean_rel = np.abs(a.mean(0) - b.mean(0)) / (np.abs(b.mean(0)) + 1e-9)
    # MC SE of the DIFFERENCE of two K-draw means
    se_rel = (np.sqrt((a.std(0) ** 2 + b.std(0) ** 2) / K)
              / (np.abs(b.mean(0)) + 1e-9))
    std_ratio = a.std(0) / np.maximum(b.std(0), 1e-12)
    med_mean_rel = float(np.median(mean_rel))
    med_se = float(np.median(se_rel))
    med_std_ratio = float(np.median(std_ratio))
    ok = med_mean_rel < 3 * med_se and abs(med_std_ratio - 1.0) < 0.05
    print(json.dumps({
        "metric": "bnn_kernel_parity",
        "median_mean_rel_diff": round(med_mean_rel, 6),
        "median_mc_se": round(med_se, 6),
        "median_std_ratio": round(med_std_ratio, 4),
        "K": K, "n": n, "ok": bool(ok),
    }))
    return ok


if __name__ == "__main__":
    import sys

    sys.exit(0 if main() else 1)
