"""Headline benchmark: CausalBGM iterative-phase training throughput.

Workload matches the reference tutorial's Sim_Hirano_Imbens configuration
(n=20000, v_dim=200, batch_size=32 -> 625 batches/epoch).  The reference
sustains ~55 batches/s on CPU (SURVEY.md §6, tutorial_py.ipynb cell 14);
that is the ``vs_baseline`` denominator.

Each batch performs the full iterative update: three net Adam updates
(g: 200-wide output MLP, h, f) plus the row-sparse latent-table Adam update —
identical numerical work to the reference's four ``@tf.function`` calls, but
scanned on device so an epoch is one dispatch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_BATCHES_PER_SEC = 55.0


def main():
    import jax

    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM

    n, v_dim, bs = 20000, 200, 32
    ds = Sim_Hirano_Imbens_sampler(batch_size=bs, N=n, v_dim=v_dim, seed=0)
    x, y, v = ds.load_all()

    params = dict(
        v_dim=v_dim, z_dims=[1, 1, 1, 7], binary_treatment=False,
        dataset="bench_HI", output_dir="/tmp/bench_out", use_bnn=False,
        save_res=False, save_model=False)
    model = CausalBGM(params, random_seed=123)

    # Warmup (compiles the epoch scan) + measured epochs.
    n_batches = n // bs
    model.fit((x, y, v), epochs=1, epochs_per_eval=10**9, batch_size=bs,
              use_egm_init=False, verbose=0)

    import jax.numpy as jnp

    data = tuple(jnp.asarray(a) for a in (x, y, v))
    from functools import partial

    epoch_fn = jax.jit(partial(model._train_epoch, model.cfg))
    from bayesgm_tpu.ops import optim

    carry = (model.nets, model.opts, model.data_z,
             optim.table_adam_init(model.data_z), model._key)
    perm = np.random.permutation(n)[: n_batches * bs].reshape(n_batches, bs)
    idx = jnp.asarray(perm)
    carry, _ = epoch_fn(carry, idx, data)  # compile
    jax.block_until_ready(carry[2])

    n_epochs = 5
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        carry, _ = epoch_fn(carry, idx, data)
    jax.block_until_ready(carry[2])
    elapsed = time.perf_counter() - t0

    batches_per_sec = n_epochs * n_batches / elapsed
    print(json.dumps({
        "metric": "causalbgm_train_batches_per_sec",
        "value": round(batches_per_sec, 2),
        "unit": "batches/s (n=20000, v_dim=200, bs=32, iterative phase)",
        "vs_baseline": round(batches_per_sec / BASELINE_BATCHES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
