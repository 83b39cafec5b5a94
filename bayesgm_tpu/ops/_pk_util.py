"""Host-side (non-traced) helpers for the Pallas kernel families.

Nothing in this module is traced inside a kernel body, so editing it does NOT
shift the MLIR source locations of any Pallas program: kernel compile-cache
entries survive edits here.  (The XLA programs of `flipout_step_perturbations`
callers re-trace, which is cheap.)  Param flattening / layer-dim metadata,
block sizing, and the host-eps perturbation draw live here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bayesgm_tpu.ops.nn import LEAKY_SLOPE


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m



def on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


def pick_block_rows(row_bytes: int, budget_bytes: int = 4 * 2**20,
                    lo: int = 256, hi: int = 2048) -> int:
    """Largest power-of-two row block whose working set fits the VMEM budget.

    Measured on the v_dim=200 Hirano-Imbens posterior: 0.315 ms @ 4096,
    0.348 ms @ 2048 vs 0.542 ms XLA.  When the kernel runs inside a scan
    (the MH chain) Mosaic's scoped-vmem accounting is stricter, so the
    default budget stays conservative (block 4096 OOMs there)."""
    block = hi
    while block > lo and block * row_bytes > budget_bytes:
        block //= 2
    return block


def flatten_mlp_params(net) -> list:
    """[w1, b1, ...] from an ops.nn plain-MLP pytree."""
    out = []
    for layer in net["layers"]:
        out.append(layer["w"])
        out.append(layer["b"])
    return out


def mlp_layer_dims(net) -> list:
    """[in, h1, ..., out] from an ops.nn plain-MLP pytree."""
    dims = [net["layers"][0]["w"].shape[0]]
    for layer in net["layers"]:
        dims.append(layer["w"].shape[1])
    return dims


def flatten_flipout_params(net) -> list:
    """[gamma_eff, beta, (loc, sigma, b) per layer] from an ops.nn flipout-MLP
    pytree.  ``sigma = softplus(rho)`` is precomputed so the kernel does only
    matmuls; ``gamma_eff`` folds the frozen-BN rsqrt(1+eps) factor."""
    from bayesgm_tpu.ops.nn import BN_EPS

    out = [net["norm"]["gamma"] * (1.0 + BN_EPS) ** -0.5, net["norm"]["beta"]]
    for layer in net["layers"]:
        out.append(layer["loc"])
        out.append(jax.nn.softplus(layer["rho"]))
        out.append(layer["b"])
    return out


def flipout_mlp_layer_dims(net) -> list:
    dims = [net["layers"][0]["loc"].shape[0]]
    for layer in net["layers"]:
        dims.append(layer["loc"].shape[1])
    return dims


def key_to_seed(key):
    """Fold a JAX PRNG key into the int32[2] seed the BNN kernel consumes."""
    data = jax.random.key_data(key) if jnp.issubdtype(
        key.dtype, jax.dtypes.prng_key) else key
    return jax.lax.bitcast_convert_type(data.reshape(-1)[:2], jnp.int32)


def split_flipout_flat(flat):
    """[gamma_eff, beta, (loc, sig, b) x L] ->
    ([gamma_eff, beta, (loc, b) x L], [sig x L]).

    Pure reorganization of :func:`flatten_flipout_params` output so callers
    holding the classic flat layout (e.g. a params pytree built once per
    predict) can feed the host-eps kernels without rebuilding anything."""
    w = [flat[0], flat[1]]
    sigs = []
    for i in range((len(flat) - 2) // 3):
        w.append(flat[2 + 3 * i])
        sigs.append(flat[2 + 3 * i + 1])
        w.append(flat[2 + 3 * i + 2])
    return w, sigs


def flipout_step_perturbations(sigs, key, n_sets=1, antithetic=False):
    """Fresh per-evaluation perturbation matrices P = sigma * eps.

    ``sigs`` is the concatenated per-layer sigma list (g, then h, then f);
    one eps draw per call shared across all rows = the tfp DenseFlipout
    convention the reference executes.  With ``n_sets=2`` each P gets a
    leading set axis holding two INDEPENDENT draws — the paired MH launch
    assigns set 0 to the proposed half and set 1 to the current half, exactly
    reproducing the reference's two separate get_log_posterior calls per
    step (base.py:865-866).

    ``antithetic=True`` (n_sets=2 only; beyond-reference, gated behind
    params['antithetic_eps']) sets eps_1 = -eps_0: each half's MARGINAL eps
    law is unchanged (standard normals are symmetric), but the two sides of
    the accept ratio see negatively-correlated weight noise, reducing the
    variance of their logp difference at zero extra kernel cost."""
    # One fused draw for all layers (sliced per layer): a dozen separate
    # threefry launches per MH step cost more than the normals themselves.
    sizes = [int(s.shape[0]) * int(s.shape[1]) for s in sigs]
    if antithetic and n_sets == 2:
        half = jax.random.normal(key, (1, sum(sizes)), jnp.float32)
        flat = jnp.concatenate([half, -half], axis=0)
    else:
        flat = jax.random.normal(key, (n_sets, sum(sizes)), jnp.float32)
    out, off = [], 0
    for s, sz in zip(sigs, sizes):
        out.append(s * flat[:, off:off + sz].reshape((n_sets,) + s.shape))
        off += sz
    return out


def bnn_block_rows(cfg, g_dims, h_dims, f_dims) -> int:
    """Row-block size :func:`make_fused_causal_logp_bnn` picks by default.

    Mirrors that kernel's VMEM model (forward activations + two live sign
    matrices per layer — keep in sync with its ``block_rows is None``
    branch).  Exposed so the paired 2n-row MH evaluation can pad each half
    to a block boundary, guaranteeing the proposed and current states never
    share a per-block weight-noise draw.
    """
    max_width = max(*g_dims, *h_dims, *f_dims)
    row_bytes = 4 * (sum(cfg.z_dims) + 2 + 2 * (cfg.v_dim + 1) + 4 * max_width)
    return pick_block_rows(row_bytes)
