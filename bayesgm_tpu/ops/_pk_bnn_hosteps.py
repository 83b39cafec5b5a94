"""Fused flipout-BNN kernels with HOST-provided eps (the DEFAULT hot path).

The weight-noise matrices eps are generated in XLA once per evaluation and
passed in as P = sigma * eps; only the per-row Rademacher signs stay on the
in-kernel TPU PRNG.  This matches the reference's noise semantics EXACTLY:
a tfp DenseFlipout layer samples ONE eps per forward call, shared across the
whole batch, with per-row sign decorrelation (reference
causalbgm/base.py:765-817 runs each net once per get_log_posterior call) —
whereas the in-kernel-eps kernels (_pk_bnn_inkernel.py) draw eps per ROW
BLOCK (a finer approximation than the reference).  It is also ~1.5x faster:
the serial MH hot loop was bound by the Box-Muller transcendentals, not by
matmuls (benchmarks/mxu_probe.py: eps generation 0.22 ms of a 0.62 ms eval;
eps passed as an input is free).

Split out of the former pallas_kernels.py monolith to contain compile-cache
invalidation to this family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bayesgm_tpu.ops.nn import LEAKY_SLOPE
from bayesgm_tpu.ops._pk_traced_common import (
    _flipout_backprop_input,
    _leaky,
    _sign_source,
)
from bayesgm_tpu.ops._pk_util import (
    _round_up,
    bnn_block_rows,
    on_tpu,
    pick_block_rows,
)


def _flipout_chain_hosteps(h, wrefs, prefs, n_layers):
    """Flipout forward with HOST-provided perturbations.

    ``wrefs``: [gamma_eff, beta, (loc, b) x L]; ``prefs``: [(1, in, out) x L]
    blocks (the set axis is resolved by each pref's BlockSpec index map).
    Per-row signs come from the in-kernel PRNG as before."""
    h = h * wrefs[0][:] + wrefs[1][:]
    max_w = max(max(wrefs[2 + 2 * i].shape) for i in range(n_layers))
    signs = _sign_source(h.shape[0], max_w, 2 * n_layers)
    for i in range(n_layers):
        loc = wrefs[2 + 2 * i][:]
        b = wrefs[2 + 2 * i + 1][:]
        P = prefs[i][0]
        r_in = signs(2 * i, loc.shape[0])
        r_out = signs(2 * i + 1, loc.shape[1])
        pert = jnp.dot(h * r_in, P, preferred_element_type=jnp.float32) * r_out
        h = jnp.dot(h, loc, preferred_element_type=jnp.float32) + b + pert
        if i < n_layers - 1:
            h = _leaky(h)
    return h


def _causal_neg_logp_block_hosteps(cfg, z, x, y, v, g_w, g_p, h_w, h_p,
                                   f_w, f_p, n_g, n_h, n_f):
    """Negative log-posterior rows, host-eps flipout chains (same likelihood
    conventions as _causal_neg_logp_block / reference base.py:765-817)."""
    d0, d1, d2, _ = cfg.z_dims
    v_dim = cfg.v_dim
    eps_f = 1e-6
    z0 = z[:, :d0]
    z1 = z[:, d0 : d0 + d1]
    z2 = z[:, d0 + d1 : d0 + d1 + d2]

    g_out = _flipout_chain_hosteps(z, g_w, g_p, n_g)
    mu_v = g_out[:, :v_dim]
    if cfg.sigma_v is not None:
        s_v = jnp.float32(cfg.sigma_v) ** 2
    else:
        s_v = jax.nn.softplus(g_out[:, v_dim]) + eps_f
    loss = jnp.sum((v - mu_v) ** 2, axis=1) / (2.0 * s_v) \
        + v_dim * jnp.log(s_v) / 2.0

    h_out = _flipout_chain_hosteps(jnp.concatenate([z0, z2], axis=1),
                                   h_w, h_p, n_h)
    if cfg.binary_treatment:
        lx = h_out[:, 0]
        loss += jnp.maximum(lx, 0.0) - lx * x[:, 0] \
            + jnp.log1p(jnp.exp(-jnp.abs(lx)))
    else:
        if cfg.sigma_x is not None:
            s_x = jnp.float32(cfg.sigma_x) ** 2
        else:
            s_x = jax.nn.softplus(h_out[:, 1]) + eps_f
        loss += jnp.sum((x - h_out[:, 0:1]) ** 2, axis=1) / (2.0 * s_x) \
            + jnp.log(s_x) / 2.0

    f_out = _flipout_chain_hosteps(jnp.concatenate([z0, z1, x], axis=1),
                                   f_w, f_p, n_f)
    if cfg.sigma_y is not None:
        s_y = jnp.float32(cfg.sigma_y) ** 2
    else:
        s_y = jax.nn.softplus(f_out[:, 1]) + eps_f
    loss += jnp.sum((y - f_out[:, 0:1]) ** 2, axis=1) / (2.0 * s_y) \
        + jnp.log(s_y) / 2.0

    return loss + jnp.sum(z * z, axis=1) / 2.0


def make_fused_causal_logp_bnn_hosteps(cfg, g_dims, h_dims, f_dims,
                                       block_rows: int | None = None,
                                       paired: bool = False,
                                       interpret: bool | None = None):
    """Fused flipout-BNN negative log-posterior with host-provided eps.

    Like :func:`make_fused_causal_logp_bnn` but the per-layer perturbation
    matrices ``P = sigma * eps`` arrive as kernel inputs with a leading SET
    axis.  With ``paired=True`` the rows are a block-aligned [proposed;
    current] stack and each pref's index map routes set 0 to the first half's
    blocks and set 1 to the second half's — the two MH states see independent
    weight noise with zero in-kernel cost, exactly as the reference's two
    get_log_posterior calls (base.py:865-866).

    Returns ``fn(z, x, y, v, seed, g_w, h_w, f_w, p_flat) -> (n,)`` where
    ``p_flat`` is :func:`flipout_step_perturbations` output (set axis 1, or
    2 when paired) and ``seed`` feeds the in-kernel sign PRNG.
    """
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = not on_tpu()
    z_dim = sum(cfg.z_dims)
    v_dim = cfg.v_dim
    if block_rows is None:
        block_rows = bnn_block_rows(cfg, g_dims, h_dims, f_dims)
    n_g = len(g_dims) - 1
    n_h = len(h_dims) - 1
    n_f = len(f_dims) - 1
    n_w = 2 + 2 * n_g, 2 + 2 * n_h, 2 + 2 * n_f
    n_sets = 2 if paired else 1

    def kernel(seed_ref, z_ref, x_ref, y_ref, v_ref, *refs):
        out_ref = refs[-1]
        g_w = refs[: n_w[0]]
        h_w = refs[n_w[0] : n_w[0] + n_w[1]]
        f_w = refs[n_w[0] + n_w[1] : sum(n_w)]
        prefs = refs[sum(n_w) : -1]
        g_p = prefs[:n_g]
        h_p = prefs[n_g : n_g + n_h]
        f_p = prefs[n_g + n_h :]

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 1103515245, seed_ref[1])
        neg = _causal_neg_logp_block_hosteps(
            cfg, z_ref[:], x_ref[:], y_ref[:], v_ref[:],
            g_w, g_p, h_w, h_p, f_w, f_p, n_g, n_h, n_f)
        out_ref[:] = neg[:, None]

    def fn(z, x, y, v, seed, g_w, h_w, f_w, p_flat):
        n = z.shape[0]
        n_pad = _round_up(max(n, 8), block_rows)
        if n_pad != n:
            pad = ((0, n_pad - n), (0, 0))
            z, x, y, v = (jnp.pad(a, pad) for a in (z, x, y, v))
        n_blocks = n_pad // block_rows
        # Paired launches are built half-aligned (bnn_block_rows padding in
        # the caller), so the set boundary falls exactly at n_blocks // 2.
        split = n_blocks // 2 if paired else n_blocks
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, z_dim), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, v_dim), lambda i: (i, 0)),
        ]
        flat = [*g_w, *h_w, *f_w]
        for p in flat:
            if p.ndim == 2:
                in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0)))
            else:
                in_specs.append(pl.BlockSpec(p.shape, lambda i: (0,)))
        for p in p_flat:
            in_specs.append(pl.BlockSpec(
                (1,) + p.shape[1:],
                (lambda i: (jnp.where(i < split, 0, 1), 0, 0)) if paired
                else (lambda i: (0, 0, 0))))
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            interpret=interpret,
        )(jnp.asarray(seed, jnp.int32), z, x, y, v, *flat, *p_flat)
        return out[:n, 0]

    return fn


def _flipout_chain_tape_hosteps(h, wrefs, prefs, n_layers):
    """Host-eps flipout forward retaining the backward tape (loc, P, signs,
    pre-activations) — same tape layout _flipout_backprop_input consumes."""
    h = h * wrefs[0][:] + wrefs[1][:]
    max_w = max(max(wrefs[2 + 2 * i].shape) for i in range(n_layers))
    signs = _sign_source(h.shape[0], max_w, 2 * n_layers)
    tape = []
    for i in range(n_layers):
        loc = wrefs[2 + 2 * i][:]
        b = wrefs[2 + 2 * i + 1][:]
        P = prefs[i][0]
        r_in = signs(2 * i, loc.shape[0])
        r_out = signs(2 * i + 1, loc.shape[1])
        pre = (jnp.dot(h, loc, preferred_element_type=jnp.float32) + b
               + jnp.dot(h * r_in, P, preferred_element_type=jnp.float32) * r_out)
        tape.append((loc, P, r_in, r_out, pre))
        h = _leaky(pre) if i < n_layers - 1 else pre
    return h, tape


def make_fused_causal_logp_and_grad_bnn_hosteps(cfg, g_dims, h_dims, f_dims,
                                                block_rows: int | None = None,
                                                interpret: bool | None = None):
    """Host-eps variant of :func:`make_fused_causal_logp_and_grad_bnn`: the
    fused forward+backward differentiates through the SAME host-provided
    perturbation draw (training latent updates, BNN-MALA/HMC — one weight
    draw per call, never paired).

    Returns ``fn(z, x, y, v, seed, g_w, h_w, f_w, p_flat) ->
    (neg_logp (n,), d neg_logp/dz (n, z_dim))``.
    """
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = not on_tpu()
    d0, d1, d2, _ = cfg.z_dims
    z_dim = sum(cfg.z_dims)
    v_dim = cfg.v_dim
    if block_rows is None:
        max_width = max(*g_dims, *h_dims, *f_dims)
        n_deep = max(len(g_dims), len(h_dims), len(f_dims))
        row_bytes = 4 * (z_dim + 2 + 2 * (v_dim + 1) + 3 * max_width * n_deep)
        block_rows = pick_block_rows(row_bytes, budget_bytes=3 * 2**20)
    n_g = len(g_dims) - 1
    n_h = len(h_dims) - 1
    n_f = len(f_dims) - 1
    n_w = 2 + 2 * n_g, 2 + 2 * n_h, 2 + 2 * n_f
    eps_f = 1e-6

    def kernel(seed_ref, z_ref, x_ref, y_ref, v_ref, *refs):
        logp_ref, grad_ref = refs[-2], refs[-1]
        wrefs = refs[:-2]
        g_w = wrefs[: n_w[0]]
        h_w = wrefs[n_w[0] : n_w[0] + n_w[1]]
        f_w = wrefs[n_w[0] + n_w[1] : sum(n_w)]
        prefs = wrefs[sum(n_w) :]
        g_p = prefs[:n_g]
        h_p = prefs[n_g : n_g + n_h]
        f_p = prefs[n_g + n_h :]

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 1103515245, seed_ref[1])

        z = z_ref[:]
        x = x_ref[:]
        y = y_ref[:]
        v = v_ref[:]
        z0 = z[:, :d0]
        z1 = z[:, d0 : d0 + d1]
        z2 = z[:, d0 + d1 : d0 + d1 + d2]
        b = z.shape[0]

        g_out, g_tape = _flipout_chain_tape_hosteps(z, g_w, g_p, n_g)
        mu_v = g_out[:, :v_dim]
        diff_v = v - mu_v
        sq_v = jnp.sum(diff_v**2, axis=1)
        if cfg.sigma_v is not None:
            s_v = jnp.float32(cfg.sigma_v) ** 2
            loss_v = sq_v / (2.0 * s_v) + v_dim * jnp.log(s_v) / 2.0
            cot_g = jnp.concatenate([-diff_v / s_v, jnp.zeros_like(g_out[:, :1])], axis=1)
        else:
            s_raw = g_out[:, v_dim]
            s_v = jax.nn.softplus(s_raw) + eps_f
            loss_v = sq_v / (2.0 * s_v) + v_dim * jnp.log(s_v) / 2.0
            dl_ds = -sq_v / (2.0 * s_v**2) + v_dim / (2.0 * s_v)
            cot_g = jnp.concatenate(
                [-diff_v / s_v[:, None], (dl_ds * jax.nn.sigmoid(s_raw))[:, None]], axis=1)
        dz_g = _flipout_backprop_input(cot_g, g_tape, g_w[0][:])

        h_in = jnp.concatenate([z0, z2], axis=1)
        h_out, h_tape = _flipout_chain_tape_hosteps(h_in, h_w, h_p, n_h)
        mu_x = h_out[:, 0:1]
        if cfg.binary_treatment:
            lx = mu_x[:, 0]
            loss_x = jnp.maximum(lx, 0.0) - lx * x[:, 0] + jnp.log1p(jnp.exp(-jnp.abs(lx)))
            cot_h = jnp.concatenate(
                [(jax.nn.sigmoid(lx) - x[:, 0])[:, None], jnp.zeros_like(h_out[:, :1])], axis=1)
        else:
            diff_x = x - mu_x
            sq_x = jnp.sum(diff_x**2, axis=1)
            if cfg.sigma_x is not None:
                s_x = jnp.float32(cfg.sigma_x) ** 2
                loss_x = sq_x / (2.0 * s_x) + jnp.log(s_x) / 2.0
                cot_h = jnp.concatenate([-diff_x / s_x, jnp.zeros_like(h_out[:, :1])], axis=1)
            else:
                sx_raw = h_out[:, 1]
                s_x = jax.nn.softplus(sx_raw) + eps_f
                loss_x = sq_x / (2.0 * s_x) + jnp.log(s_x) / 2.0
                dl_dsx = -sq_x / (2.0 * s_x**2) + 1.0 / (2.0 * s_x)
                cot_h = jnp.concatenate(
                    [-diff_x / s_x[:, None], (dl_dsx * jax.nn.sigmoid(sx_raw))[:, None]], axis=1)
        din_h = _flipout_backprop_input(cot_h, h_tape, h_w[0][:])

        f_in = jnp.concatenate([z0, z1, x], axis=1)
        f_out, f_tape = _flipout_chain_tape_hosteps(f_in, f_w, f_p, n_f)
        mu_y = f_out[:, 0:1]
        diff_y = y - mu_y
        sq_y = jnp.sum(diff_y**2, axis=1)
        if cfg.sigma_y is not None:
            s_y = jnp.float32(cfg.sigma_y) ** 2
            loss_y = sq_y / (2.0 * s_y) + jnp.log(s_y) / 2.0
            cot_f = jnp.concatenate([-diff_y / s_y, jnp.zeros_like(f_out[:, :1])], axis=1)
        else:
            sy_raw = f_out[:, 1]
            s_y = jax.nn.softplus(sy_raw) + eps_f
            loss_y = sq_y / (2.0 * s_y) + jnp.log(s_y) / 2.0
            dl_dsy = -sq_y / (2.0 * s_y**2) + 1.0 / (2.0 * s_y)
            cot_f = jnp.concatenate(
                [-diff_y / s_y[:, None], (dl_dsy * jax.nn.sigmoid(sy_raw))[:, None]], axis=1)
        din_f = _flipout_backprop_input(cot_f, f_tape, f_w[0][:])

        loss_prior = jnp.sum(z * z, axis=1) / 2.0
        logp_ref[:] = (loss_v + loss_x + loss_y + loss_prior)[:, None]

        pad3 = z_dim - (d0 + d1 + d2)
        dz_h = jnp.concatenate(
            [din_h[:, :d0], jnp.zeros((b, d1), jnp.float32), din_h[:, d0:],
             jnp.zeros((b, pad3), jnp.float32)], axis=1)
        dz_f = jnp.concatenate(
            [din_f[:, : d0 + d1], jnp.zeros((b, d2 + pad3), jnp.float32)], axis=1)
        grad_ref[:] = dz_g + dz_h + dz_f + z

    def fn(z, x, y, v, seed, g_w, h_w, f_w, p_flat):
        n = z.shape[0]
        n_pad = _round_up(max(n, 8), block_rows)
        if n_pad != n:
            pad = ((0, n_pad - n), (0, 0))
            z, x, y, v = (jnp.pad(a, pad) for a in (z, x, y, v))
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, z_dim), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, v_dim), lambda i: (i, 0)),
        ]
        flat = [*g_w, *h_w, *f_w]
        for p in flat:
            if p.ndim == 2:
                in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0)))
            else:
                in_specs.append(pl.BlockSpec(p.shape, lambda i: (0,)))
        for p in p_flat:
            in_specs.append(pl.BlockSpec((1,) + p.shape[1:],
                                          lambda i: (0, 0, 0)))
        neg_logp, grad = pl.pallas_call(
            kernel,
            grid=(n_pad // block_rows,),
            in_specs=in_specs,
            out_specs=(pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
                       pl.BlockSpec((block_rows, z_dim), lambda i: (i, 0))),
            out_shape=(jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                       jax.ShapeDtypeStruct((n_pad, z_dim), jnp.float32)),
            interpret=interpret,
        )(jnp.asarray(seed, jnp.int32), z, x, y, v, *flat, *p_flat)
        return neg_logp[:n, 0], grad[:n]

    return fn
