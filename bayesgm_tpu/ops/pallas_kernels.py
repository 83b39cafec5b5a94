"""Pallas TPU kernels for the hot inference paths.

The MCMC log-posterior evaluation is the dominant cost of ``predict``:
per chain step it runs three small-MLP forward chains over all ``n`` subjects
(g: z -> v_dim+1, h: (z0,z2) -> 2, f: (z0,z1,x) -> 2).  The networks are
64-wide, so each XLA matmul writes its (n, 64) activation back to HBM and the
step is bandwidth-bound.  The kernels here fuse a block of rows into VMEM
once, run every layer's matmul on the MXU with activations resident in VMEM,
and return only the final scalar statistics to HBM:

- :func:`make_fused_causal_logp` — CausalBGM's non-Bayesian posterior: all
  three nets plus the Gaussian/Bernoulli NLL reductions and the N(0,I) prior
  in a single kernel emitting the (n,) log-posterior — the entire MH target
  is one kernel launch.
- :func:`make_fused_causal_logp_and_grad` — same, plus the hand-written
  z-gradient in the same kernel (MALA / HMC / the training latent update).
- :func:`make_fused_causal_logp_bnn` — the DEFAULT configuration's target:
  the flipout-Bayesian posterior with all per-layer weight noise (Gaussian
  eps, Rademacher sign pairs) generated in-kernel by the TPU PRNG.

Weights are passed as a flat list of (w, b) arrays and live in VMEM for every
grid step (they total a few hundred KB).  Row blocks default to 512 (f32 tile
sublane multiple).  On non-TPU backends callers should fall back to the plain
XLA path (`mlp_apply`); these kernels also run under ``interpret=True`` for
CPU testing.

FACADE — the kernel bodies live in per-family modules so that editing one
family does not shift the MLIR source locations (= persistent compile-cache
keys, CLAUDE.md "Compile cache") of the others:

- ops/_pk_traced_common.py  frozen traced helpers shared by every family
- ops/_pk_util.py           host-side metadata/flatten/block-sizing helpers
- ops/_pk_plain.py          non-BNN fused logp / logp+grad
- ops/_pk_bnn_inkernel.py   in-kernel-PRNG flipout family + MH window kernel
- ops/_pk_bnn_hosteps.py    host-eps flipout family (DEFAULT BNN hot path)

New kernel families (e.g. EGM training steps) belong in NEW modules, imported
here.  This facade is import-only: editing it never invalidates kernel caches.
"""

from __future__ import annotations

from bayesgm_tpu.ops.nn import LEAKY_SLOPE
from bayesgm_tpu.ops._pk_traced_common import (
    _flipout_backprop_input,
    _kernel_normal,
    _kernel_signs,
    _kernel_uniform,
    _leaky,
    _sign_source,
)
from bayesgm_tpu.ops._pk_util import (
    _round_up,
    bnn_block_rows,
    flatten_flipout_params,
    flatten_mlp_params,
    flipout_mlp_layer_dims,
    flipout_step_perturbations,
    key_to_seed,
    mlp_layer_dims,
    on_tpu,
    pick_block_rows,
    split_flipout_flat,
)
from bayesgm_tpu.ops._pk_plain import (
    _mlp_backprop_input,
    _mlp_chain,
    _mlp_chain_with_preacts,
    make_fused_causal_logp,
    make_fused_causal_logp_and_grad,
)
from bayesgm_tpu.ops._pk_bnn_inkernel import (
    _causal_neg_logp_block,
    _flipout_chain,
    _flipout_chain_with_tape,
    _make_sign_source,
    make_fused_causal_logp_and_grad_bnn,
    make_fused_causal_logp_bnn,
    make_fused_mh_steps_bnn,
)
from bayesgm_tpu.ops._pk_bnn_hosteps import (
    _causal_neg_logp_block_hosteps,
    _flipout_chain_hosteps,
    _flipout_chain_tape_hosteps,
    make_fused_causal_logp_and_grad_bnn_hosteps,
    make_fused_causal_logp_bnn_hosteps,
)
