"""Multi-chip scaling: device meshes + sharded training/inference steps.

The reference has no distributed infrastructure at all (SURVEY.md §2.8); this
subsystem is new.  The scalable axes of the workload are the dataset axis
``n`` (per-sample latent rows and MCMC chains are embarrassingly parallel)
and the chain axis — both shard over a 1-D ``data`` mesh with parameters
replicated; XLA inserts the only collectives needed (gradient psum for
replicated nets, mean/quantile reductions at inference).
"""

from bayesgm_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicate,
    replicated_shard_map,
    rowwise_shard_map,
    shard_rows,
)

__all__ = ["make_mesh", "shard_rows", "replicate", "data_sharding",
           "rowwise_shard_map", "replicated_shard_map"]
