"""In-process A/B: fused one-launch flipout draws vs per-layer draws.

The round-3 predict path learned that a dozen tiny threefry launches per
evaluation cost more than the normals themselves (hosteps kernels).  This
probe measures the same fix applied to the TRAINING path
(ops/nn._fused_flipout_draws): the full jitted train epoch at flagship
shapes (n=20000, v_dim=200, bs=32, BNN+cosine) is built twice in one
process — current fused implementation vs the round-3 per-layer
implementation (inlined below) — and timed interleaved (median of 4 x
3-epoch blocks).  Cross-process chip variance is ~25% on unchanged code,
so only this in-process ratio is trustworthy.

Measured (round 4): fused 4628 vs per-layer 3190 batches/s = 1.45x.

Usage:  python benchmarks/fused_eps_ab.py
"""

import time, json
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
from bayesgm_tpu.models.causalbgm import CausalBGM
from bayesgm_tpu.ops import nn, optim

x, y, v = Sim_Hirano_Imbens_sampler(N=20000, v_dim=200, seed=0).load_all()
params = dict(v_dim=200, z_dims=[1,1,1,7], binary_treatment=False,
              dataset="ab", output_dir="/tmp/ab", use_bnn=True,
              save_res=False, save_model=False, lr_decay="cosine")
m = CausalBGM(params, random_seed=123)
m.fit((x, y, v), epochs=1, epochs_per_eval=10**9, use_egm_init=False, verbose=0)  # init data_z/opts

def perlayer_apply(net, xx, key):  # round-3 implementation (per-layer draws)
    xx = nn.frozen_batchnorm_apply(net["norm"], xx)
    keys = jax.random.split(key, len(net["layers"]))
    for p, k in zip(net["layers"][:-1], keys[:-1]):
        xx = nn.leaky_relu(nn.flipout_dense_apply(p, xx, k))
    return nn.flipout_dense_apply(net["layers"][-1], xx, keys[-1])

fused_apply = nn.flipout_mlp_apply
n, bs = 20000, 32
n_batches = n // bs
data = tuple(jnp.asarray(a) for a in (x, y, v))
perm = np.random.RandomState(0).permutation(n)[: n_batches*bs].reshape(n_batches, bs)
idx = jnp.asarray(perm); k_epoch = jax.random.PRNGKey(7)

carry0 = (m.nets, m.opts, m.data_z, optim.table_adam_init(m.data_z))

def build(apply_fn):
    nn.flipout_mlp_apply = apply_fn
    fused_vg = m._build_fused_latent_vg(bs, None)
    fn = jax.jit(partial(m._train_epoch, m.cfg, fused_latent_vg=fused_vg))
    c, _ = fn(carry0, idx, k_epoch, data)  # trace+compile NOW, under this patch
    jax.block_until_ready(c[2])
    return fn

fns = {"fused": build(fused_apply), "perlayer": build(perlayer_apply)}
res = {k: [] for k in fns}
for rep in range(4):
    for name, fn in fns.items():
        c = carry0; t0 = time.perf_counter()
        for _ in range(3):
            c, _ = fn(c, idx, k_epoch, data)
        jax.block_until_ready(c[2])
        res[name].append(3 * n_batches / (time.perf_counter() - t0))
out = {k: round(float(np.median(r)), 1) for k, r in res.items()}
out["speedup"] = round(out["fused"] / out["perlayer"], 3)
print(json.dumps(out))
