#!/bin/bash
# Reproduce every recorded benchmark, in dependency-free order.
# Single TPU chip: run serially, never concurrently.  Approximate timings
# are warm-compile-cache numbers on one v5e; the first run after any edit
# to ops/pallas_kernels.py recompiles every kernel (much slower).
set -e
cd "$(dirname "$0")/.."

python benchmarks/warm_cache.py                   # ~5 min: pre-compile every hot kernel shape
python bench.py                                   # ~4 min: train + inference headline JSON
python benchmarks/step_breakdown.py               # ~4 min: Pallas fraction of the hot paths
python benchmarks/bnn_kernel_parity.py            # ~4 min: kernel statistical-parity gate
python benchmarks/hi_protocol.py --seeds 123 456 789 1011 1213 \
  --lr_decay cosine                               # ~25 min: flagship ADRF campaign
python benchmarks/binary_ate.py                   # ~10 min: dATE / PEHE / ITE coverage gate
python benchmarks/bgm_impute.py --lr_decay cosine # ~6 min: imputation RMSE / coverage
python benchmarks/mnist_inpaint.py --lr_decay cosine  # ~8 min: inpainting accuracy / L1
