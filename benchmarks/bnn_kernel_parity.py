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

    # Host-eps kernel (the DEFAULT hot path since round 3): eps from XLA,
    # per-row signs in-kernel.
    gw, gs = pk.split_flipout_flat(gf)
    hw, hs = pk.split_flipout_flat(hf)
    fw, fs = pk.split_flipout_flat(ff)
    sigs = gs + hs + fs
    he_raw = pk.make_fused_causal_logp_bnn_hosteps(cfg, *dims)

    def he(key):
        k_eps, k_sig = jax.random.split(key)
        ps = pk.flipout_step_perturbations(sigs, k_eps)
        return he_raw(zs, xs, ys, vs, pk.key_to_seed(k_sig), gw, hw, fw, ps)

    he = jax.jit(he)
    c = np.stack([np.asarray(he(jax.random.PRNGKey(900 + i)))
                  for i in range(K)])

    def gate(sample, ref):
        mean_rel = np.abs(sample.mean(0) - ref.mean(0)) / (np.abs(ref.mean(0)) + 1e-9)
        # MC SE of the DIFFERENCE of two K-draw means
        se_rel = (np.sqrt((sample.std(0) ** 2 + ref.std(0) ** 2) / K)
                  / (np.abs(ref.mean(0)) + 1e-9))
        std_ratio = sample.std(0) / np.maximum(ref.std(0), 1e-12)
        med_mean_rel = float(np.median(mean_rel))
        med_se = float(np.median(se_rel))
        med_std_ratio = float(np.median(std_ratio))
        ok = med_mean_rel < 3 * med_se and abs(med_std_ratio - 1.0) < 0.05
        return ok, {"median_mean_rel_diff": round(med_mean_rel, 6),
                    "median_mc_se": round(med_se, 6),
                    "median_std_ratio": round(med_std_ratio, 4)}

    ok_a, stats_a = gate(a, b)
    ok_c, stats_c = gate(c, b)

    # Paired set-routing, exact on-chip: the proposed half of a paired
    # launch occupies the SAME program ids (0..split-1) and eps set 0 as a
    # plain launch on that half alone, so the first half must match a
    # single-set call bit-for-bit (exercises the compiled index map).
    paired_raw = pk.make_fused_causal_logp_bnn_hosteps(cfg, *dims, paired=True)
    block = pk.bnn_block_rows(cfg, *dims)
    n_half = ((n + block - 1) // block) * block
    pad = ((0, n_half - n), (0, 0))
    zsp = jnp.pad(zs, pad)
    xsp, ysp, vsp = (jnp.pad(s, pad) for s in (xs, ys, vs))
    z2 = jnp.concatenate([zsp, zsp + 0.1])
    x2, y2, v2 = (jnp.concatenate([s, s]) for s in (xsp, ysp, vsp))
    kk = jax.random.PRNGKey(77)
    ps2 = pk.flipout_step_perturbations(sigs, kk, n_sets=2)
    seed = pk.key_to_seed(jax.random.PRNGKey(78))
    both = np.asarray(jax.jit(paired_raw)(z2, x2, y2, v2, seed, gw, hw, fw, ps2))
    first = np.asarray(jax.jit(he_raw)(zsp, xsp, ysp, vsp, seed, gw, hw, fw,
                                       [p[:1] for p in ps2]))
    pair_exact = float(np.max(np.abs(both[:n_half] - first)))
    ok_pair = pair_exact == 0.0

    ok = ok_a and ok_c and ok_pair
    print(json.dumps({
        "metric": "bnn_kernel_parity",
        "inkernel_eps": stats_a,
        "hosteps": stats_c,
        "paired_first_half_max_abs_diff": pair_exact,
        "K": K, "n": n, "ok": bool(ok),
    }))
    return ok


if __name__ == "__main__":
    import sys

    sys.exit(0 if main() else 1)
