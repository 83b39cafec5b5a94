"""Step-time breakdown: fraction of hot-path time spent in Pallas kernels.

Measures, on the flagship Sim_Hirano_Imbens shapes (n=20000, v_dim=200):

1. predict (default BNN config): wall time of one 500-step adaptive-MH chunk
   vs the standalone fused BNN kernel time x (2 evals/step x 500)
   -> fraction of the MH step spent inside make_fused_causal_logp_bnn.
2. predict (non-BNN): same with make_fused_causal_logp (1 eval/step,
   cached current logp).
3. training (non-BNN): wall time of a 625-batch epoch scan vs the standalone
   fused logp+grad kernel time x 625 -> fraction of the training step in
   the fused latent update (the remainder is the three net Adam updates,
   which are XLA).

Run on the TPU chip; prints one JSON line per workload.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _time(f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM
    from bayesgm_tpu.ops import mcmc, optim
    from bayesgm_tpu.ops import pallas_kernels as pk

    n, v_dim, bs = 20000, 200, 32
    x, y, v = Sim_Hirano_Imbens_sampler(batch_size=bs, N=n, v_dim=v_dim, seed=0).load_all()
    data = tuple(jnp.asarray(a) for a in (x, y, v))

    def marginal_mh(log_prob, init, key, recompute):
        """Steady-state s/step via the marginal method (cancels the fixed
        per-call re-trace + program-load cost)."""
        def run(steps):
            t0 = time.perf_counter()
            res = mcmc.adaptive_mh(log_prob, init, key, burn_in=steps, n_keep=0,
                                   q_sd=1.0, recompute_current=recompute)
            jax.block_until_ready(res.q_sd)
            return time.perf_counter() - t0

        run(mcmc.CHUNK)
        t_short = run(500)
        t_long = run(3000)
        return (t_long - t_short) / 2500

    init = jax.random.normal(jax.random.PRNGKey(0), (n, 10))
    key = jax.random.PRNGKey(1)

    # scan overhead alone: the same chain with a trivial target
    def cheap_logp(z, k):
        return -jnp.sum(z * z, axis=1) / 2.0

    t_overhead = marginal_mh(cheap_logp, init, key, recompute=True)

    results = []
    for use_bnn in (True, False):
        params = dict(v_dim=v_dim, z_dims=[1, 1, 1, 7], binary_treatment=False,
                      dataset="breakdown", output_dir="/tmp/breakdown",
                      use_bnn=use_bnn, save_res=False, save_model=False)
        model = CausalBGM(params, random_seed=0)
        log_prob = model._make_log_prob(*data)
        t_step = marginal_mh(log_prob, init, key, recompute=use_bnn)
        frac = max(0.0, t_step - t_overhead) / t_step
        results.append(dict(
            workload=f"predict_mh_{'bnn' if use_bnn else 'plain'}",
            ms_per_step=round(t_step * 1e3, 3),
            ms_scan_overhead=round(t_overhead * 1e3, 3),
            evals_per_step=2 if use_bnn else 1,
            pallas_fraction=round(min(frac, 1.0), 3)))

    # training epoch (non-BNN): compare the in-scan fused latent update
    # against the in-scan XLA latent update.
    params = dict(v_dim=v_dim, z_dims=[1, 1, 1, 7], binary_treatment=False,
                  dataset="breakdown", output_dir="/tmp/breakdown",
                  use_bnn=False, save_res=False, save_model=False)
    model = CausalBGM(params, random_seed=0)
    model.fit((x, y, v), epochs=0, epochs_per_eval=10**9, batch_size=bs,
              use_egm_init=False, verbose=0)
    n_batches = n // bs
    idx = jnp.asarray(np.random.RandomState(0).permutation(n)[: n_batches * bs]
                      .reshape(n_batches, bs))
    carry = (model.nets, model.opts, model.data_z, optim.table_adam_init(model.data_z))
    k = jax.random.PRNGKey(2)

    timings = {}
    for label, vg in (("fused", model._build_fused_latent_vg(bs, None)), ("xla", None)):
        epoch_fn = jax.jit(partial(model._train_epoch, model.cfg, fused_latent_vg=vg))
        t_epoch = _time(lambda: epoch_fn(carry, idx, k, data)[1]["mse_y"], reps=5)
        timings[label] = t_epoch / n_batches
    results.append(dict(
        workload="train_iterative_plain",
        us_per_batch_fused_latent=round(timings["fused"] * 1e6, 1),
        us_per_batch_xla_latent=round(timings["xla"] * 1e6, 1),
        fused_latent_speedup=round(timings["xla"] / timings["fused"], 3)))

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
