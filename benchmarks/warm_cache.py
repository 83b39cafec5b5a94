"""Pre-warm the XLA/Mosaic compile cache for every hot kernel shape.

Any edit to ``ops/pallas_kernels.py`` shifts the MLIR source locations
embedded in each Pallas program's HLO, invalidating every cached kernel
program at once; the next first-run of each workload then recompiles cold
through the remote compile tunnel (minutes per program, occasionally
wedging).  Run this once after a kernel edit so benchmarks and research
runs start warm:

    python benchmarks/warm_cache.py          # ~5-15 min cold, seconds warm

Covers: flagship continuous (BNN + plain, v_dim=200) and binary
(BNN, v_dim=100) chain programs via a CHUNK-length adaptive_mh round each,
plus the training epoch programs (fused latent update) for both configs.
"""

import time

import numpy as np


def warm_causal(v_dim, z_dims, binary, use_bnn, n):
    """``n`` must match the real workload's row count: chain programs are
    shape-specialized, so warming 4096-row programs does nothing for a
    20000-row benchmark."""
    import jax

    from bayesgm_tpu.models.causalbgm import CausalBGM
    from bayesgm_tpu.ops import mcmc

    rng = np.random.RandomState(0)
    if binary:
        x = (rng.rand(n, 1) < 0.5).astype("float32")
    else:
        x = rng.rand(n, 1).astype("float32")
    y = rng.randn(n, 1).astype("float32")
    v = rng.randn(n, v_dim).astype("float32")

    m = CausalBGM(dict(v_dim=v_dim, z_dims=list(z_dims),
                       binary_treatment=binary, dataset="warm",
                       output_dir="/tmp/warm_cache", use_bnn=use_bnn,
                       save_res=False, save_model=False), random_seed=0)
    t0 = time.time()
    # Programs are specialized on EVERY shape: row count, scan length, and
    # effect-grid size.  Use one standard 500-iter EGM chunk, the standard
    # 500-step chain chunks, and the benchmarks' 20-point grid so the warmed
    # programs are byte-identical to the real workloads'.
    # egm_n_iter=CHUNK runs CHUNK+1 total iterations = one standard
    # 500-iter chunk PLUS the 1-iter remainder chunk that every real
    # 30000-iter run also executes (30001 = 60*500 + 1).
    m.fit((x, y, v), epochs=1, epochs_per_eval=10**9, batch_size=32,
          use_egm_init=True, egm_n_iter=mcmc.CHUNK,
          egm_batches_per_eval=10**9, verbose=0)
    grid = None if binary else np.linspace(0, 3, 20)
    # bs=n: the benchmarks predict with one full-data launch (the reference
    # tutorial's bs=20000), so the warmed chain program must be n-row too.
    m.predict((x, y, v), alpha=0.1, n_mcmc=mcmc.CHUNK, burn_in=mcmc.CHUNK,
              x_values=grid, q_sd=1.0, bs=n)
    label = ("binary" if binary else "continuous") + ("/bnn" if use_bnn else "/plain")
    print(f"warmed {label} v_dim={v_dim} z={list(z_dims)} in {time.time()-t0:.0f} s",
          flush=True)


def main():
    # flagship (hi_protocol / bench predict at bs=10000) + binary gate shapes
    warm_causal(200, (1, 1, 1, 7), binary=False, use_bnn=True, n=20000)
    warm_causal(200, (1, 1, 1, 7), binary=False, use_bnn=False, n=20000)
    warm_causal(100, (3, 6, 3, 6), binary=True, use_bnn=True, n=10000)


if __name__ == "__main__":
    main()
