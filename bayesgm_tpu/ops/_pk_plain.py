"""Fused non-BNN CausalBGM log-posterior kernels (plain MLP chains).

Split out of the former ops/pallas_kernels.py monolith so edits to the BNN
families do not invalidate these kernels' compile-cache entries (and vice
versa).  See ops/pallas_kernels.py for the family overview and
ops/_pk_traced_common.py for the shared traced helpers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bayesgm_tpu.ops.nn import LEAKY_SLOPE
from bayesgm_tpu.ops._pk_traced_common import _leaky
from bayesgm_tpu.ops._pk_util import _round_up, on_tpu, pick_block_rows


def _mlp_chain(h, weight_refs, n_layers):
    for i in range(n_layers):
        w = weight_refs[2 * i][:]
        b = weight_refs[2 * i + 1][:]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i < n_layers - 1:
            h = _leaky(h)
    return h


def make_fused_causal_logp(cfg, g_dims, h_dims, f_dims, block_rows: int | None = None,
                           interpret: bool | None = None):
    """Fully fused CausalBGM negative log-posterior kernel (non-BNN).

    Computes, for each row in a VMEM-resident block:
    -log p(v|z) - log p(x|z0,z2) - log p(y|z0,z1,x) - log p(z)
    with the exact reference conventions (causalbgm/base.py:765-817).

    Returns ``fn(z, x, y, v, g_flat, h_flat, f_flat) -> (n,)`` negative
    log-posterior rows.
    """
    if interpret is None:
        interpret = not on_tpu()
    d0, d1, d2, _ = cfg.z_dims
    z_dim = sum(cfg.z_dims)
    v_dim = cfg.v_dim
    if block_rows is None:
        max_width = max(*g_dims, *h_dims, *f_dims)
        row_bytes = 4 * (z_dim + 2 + 2 * (v_dim + 1) + 2 * max_width)
        block_rows = pick_block_rows(row_bytes)
    n_g = len(g_dims) - 1
    n_h = len(h_dims) - 1
    n_f = len(f_dims) - 1
    eps = 1e-6

    def kernel(z_ref, x_ref, y_ref, v_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        g_refs = wrefs[: 2 * n_g]
        h_refs = wrefs[2 * n_g : 2 * (n_g + n_h)]
        f_refs = wrefs[2 * (n_g + n_h) :]

        z = z_ref[:]
        x = x_ref[:]
        y = y_ref[:]
        v = v_ref[:]
        z0 = z[:, :d0]
        z1 = z[:, d0 : d0 + d1]
        z2 = z[:, d0 + d1 : d0 + d1 + d2]

        g_out = _mlp_chain(z, g_refs, n_g)  # (b, v_dim+1)
        mu_v = g_out[:, :v_dim]
        if cfg.sigma_v is not None:
            s_v = jnp.float32(cfg.sigma_v) ** 2
        else:
            s_v = jax.nn.softplus(g_out[:, v_dim]) + eps
        loss_v = jnp.sum((v - mu_v) ** 2, axis=1) / (2.0 * s_v) + v_dim * jnp.log(s_v) / 2.0

        h_in = jnp.concatenate([z0, z2], axis=1)
        h_out = _mlp_chain(h_in, h_refs, n_h)  # (b, 2)
        mu_x = h_out[:, 0:1]
        if cfg.binary_treatment:
            lx = mu_x[:, 0]
            loss_x = jnp.maximum(lx, 0.0) - lx * x[:, 0] + jnp.log1p(jnp.exp(-jnp.abs(lx)))
        else:
            if cfg.sigma_x is not None:
                s_x = jnp.float32(cfg.sigma_x) ** 2
            else:
                s_x = jax.nn.softplus(h_out[:, 1]) + eps
            loss_x = jnp.sum((x - mu_x) ** 2, axis=1) / (2.0 * s_x) + jnp.log(s_x) / 2.0

        f_in = jnp.concatenate([z0, z1, x], axis=1)
        f_out = _mlp_chain(f_in, f_refs, n_f)
        mu_y = f_out[:, 0:1]
        if cfg.sigma_y is not None:
            s_y = jnp.float32(cfg.sigma_y) ** 2
        else:
            s_y = jax.nn.softplus(f_out[:, 1]) + eps
        loss_y = jnp.sum((y - mu_y) ** 2, axis=1) / (2.0 * s_y) + jnp.log(s_y) / 2.0

        loss_prior = jnp.sum(z * z, axis=1) / 2.0
        out_ref[:] = (loss_v + loss_x + loss_y + loss_prior)[:, None]

    def fn(z, x, y, v, g_flat, h_flat, f_flat):
        n = z.shape[0]
        n_pad = _round_up(max(n, 8), block_rows)
        if n_pad != n:
            pad = ((0, n_pad - n), (0, 0))
            z = jnp.pad(z, pad)
            x = jnp.pad(x, pad)
            y = jnp.pad(y, pad)
            v = jnp.pad(v, pad)
        grid = (n_pad // block_rows,)
        in_specs = [
            pl.BlockSpec((block_rows, z_dim), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, v_dim), lambda i: (i, 0)),
        ]
        flat = [*g_flat, *h_flat, *f_flat]
        for p in flat:
            if p.ndim == 2:
                in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0)))
            else:
                in_specs.append(pl.BlockSpec(p.shape, lambda i: (0,)))
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            interpret=interpret,
        )(z, x, y, v, *flat)
        return out[:n, 0]

    return fn


def _mlp_chain_with_preacts(h, weight_refs, n_layers):
    """Forward keeping pre-activations for the in-kernel backward."""
    preacts = []
    for i in range(n_layers):
        w = weight_refs[2 * i][:]
        b = weight_refs[2 * i + 1][:]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i < n_layers - 1:
            preacts.append(h)
            h = _leaky(h)
    return h, preacts


def _mlp_backprop_input(cot_out, weight_refs, preacts, n_layers):
    """d(loss)/d(input) given d(loss)/d(output); activations stay in VMEM."""
    g = cot_out
    for i in range(n_layers - 1, -1, -1):
        w = weight_refs[2 * i][:]
        g = jnp.dot(g, w.T, preferred_element_type=jnp.float32)
        if i > 0:
            h = preacts[i - 1]
            g = g * jnp.where(h > 0, 1.0, LEAKY_SLOPE)
    return g


def make_fused_causal_logp_and_grad(cfg, g_dims, h_dims, f_dims,
                                    block_rows: int | None = None,
                                    interpret: bool | None = None):
    """Fused CausalBGM negative log-posterior AND its z-gradient in ONE
    pallas_call (non-BNN): forward chains keep their pre-activations in VMEM
    and the hand-written backward runs in the same kernel, so a gradient-based
    sampler step (MALA, HMC leapfrog) needs a single kernel launch with zero
    HBM activation traffic.

    Returns ``fn(z, x, y, v, g_flat, h_flat, f_flat) -> (neg_logp (n,),
    d neg_logp/dz (n, z_dim))``.
    """
    if interpret is None:
        interpret = not on_tpu()
    d0, d1, d2, _ = cfg.z_dims
    z_dim = sum(cfg.z_dims)
    v_dim = cfg.v_dim
    if block_rows is None:
        max_width = max(*g_dims, *h_dims, *f_dims)
        # backward roughly doubles live activations
        row_bytes = 4 * (z_dim + 2 + 2 * (v_dim + 1) + 4 * max_width * max(len(g_dims), 3))
        block_rows = pick_block_rows(row_bytes)
    n_g = len(g_dims) - 1
    n_h = len(h_dims) - 1
    n_f = len(f_dims) - 1
    eps = 1e-6

    def kernel(z_ref, x_ref, y_ref, v_ref, *refs):
        logp_ref, grad_ref = refs[-2], refs[-1]
        wrefs = refs[:-2]
        g_refs = wrefs[: 2 * n_g]
        h_refs = wrefs[2 * n_g : 2 * (n_g + n_h)]
        f_refs = wrefs[2 * (n_g + n_h) :]

        z = z_ref[:]
        x = x_ref[:]
        y = y_ref[:]
        v = v_ref[:]
        z0 = z[:, :d0]
        z1 = z[:, d0 : d0 + d1]
        z2 = z[:, d0 + d1 : d0 + d1 + d2]

        # ----- g branch: z -> (mu_v, s_raw) -----
        g_out, g_pre = _mlp_chain_with_preacts(z, g_refs, n_g)
        mu_v = g_out[:, :v_dim]
        diff_v = v - mu_v
        sq_v = jnp.sum(diff_v**2, axis=1)
        if cfg.sigma_v is not None:
            s_v = jnp.float32(cfg.sigma_v) ** 2
            loss_v = sq_v / (2.0 * s_v) + v_dim * jnp.log(s_v) / 2.0
            cot_g = jnp.concatenate([-diff_v / s_v, jnp.zeros_like(g_out[:, :1])], axis=1)
        else:
            s_raw = g_out[:, v_dim]
            s_v = jax.nn.softplus(s_raw) + eps
            loss_v = sq_v / (2.0 * s_v) + v_dim * jnp.log(s_v) / 2.0
            dl_ds = -sq_v / (2.0 * s_v**2) + v_dim / (2.0 * s_v)
            ds_draw = jax.nn.sigmoid(s_raw)
            cot_g = jnp.concatenate(
                [-diff_v / s_v[:, None], (dl_ds * ds_draw)[:, None]], axis=1)
        dz_g = _mlp_backprop_input(cot_g, g_refs, g_pre, n_g)  # (b, z_dim)

        # ----- h branch: (z0, z2) -> (mu_x, s_raw) -----
        h_in = jnp.concatenate([z0, z2], axis=1)
        h_out, h_pre = _mlp_chain_with_preacts(h_in, h_refs, n_h)
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
                s_x = jax.nn.softplus(sx_raw) + eps
                loss_x = sq_x / (2.0 * s_x) + jnp.log(s_x) / 2.0
                dl_dsx = -sq_x / (2.0 * s_x**2) + 1.0 / (2.0 * s_x)
                cot_h = jnp.concatenate(
                    [-diff_x / s_x[:, None], (dl_dsx * jax.nn.sigmoid(sx_raw))[:, None]], axis=1)
        din_h = _mlp_backprop_input(cot_h, h_refs, h_pre, n_h)  # (b, d0+d2)

        # ----- f branch: (z0, z1, x) -> (mu_y, s_raw) -----
        f_in = jnp.concatenate([z0, z1, x], axis=1)
        f_out, f_pre = _mlp_chain_with_preacts(f_in, f_refs, n_f)
        mu_y = f_out[:, 0:1]
        diff_y = y - mu_y
        sq_y = jnp.sum(diff_y**2, axis=1)
        if cfg.sigma_y is not None:
            s_y = jnp.float32(cfg.sigma_y) ** 2
            loss_y = sq_y / (2.0 * s_y) + jnp.log(s_y) / 2.0
            cot_f = jnp.concatenate([-diff_y / s_y, jnp.zeros_like(f_out[:, :1])], axis=1)
        else:
            sy_raw = f_out[:, 1]
            s_y = jax.nn.softplus(sy_raw) + eps
            loss_y = sq_y / (2.0 * s_y) + jnp.log(s_y) / 2.0
            dl_dsy = -sq_y / (2.0 * s_y**2) + 1.0 / (2.0 * s_y)
            cot_f = jnp.concatenate(
                [-diff_y / s_y[:, None], (dl_dsy * jax.nn.sigmoid(sy_raw))[:, None]], axis=1)
        din_f = _mlp_backprop_input(cot_f, f_refs, f_pre, n_f)  # (b, d0+d1+1)

        # ----- assemble -----
        loss_prior = jnp.sum(z * z, axis=1) / 2.0
        total = loss_v + loss_x + loss_y + loss_prior
        logp_ref[:] = total[:, None]

        b = z.shape[0]
        pad3 = z_dim - (d0 + d1 + d2)
        dz_h = jnp.concatenate(
            [din_h[:, :d0], jnp.zeros((b, d1), jnp.float32), din_h[:, d0:],
             jnp.zeros((b, pad3), jnp.float32)], axis=1)
        dz_f = jnp.concatenate(
            [din_f[:, : d0 + d1], jnp.zeros((b, d2 + pad3), jnp.float32)], axis=1)
        grad_ref[:] = dz_g + dz_h + dz_f + z

    def fn(z, x, y, v, g_flat, h_flat, f_flat):
        n = z.shape[0]
        n_pad = _round_up(max(n, 8), block_rows)
        if n_pad != n:
            pad = ((0, n_pad - n), (0, 0))
            z = jnp.pad(z, pad)
            x = jnp.pad(x, pad)
            y = jnp.pad(y, pad)
            v = jnp.pad(v, pad)
        grid = (n_pad // block_rows,)
        in_specs = [
            pl.BlockSpec((block_rows, z_dim), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, v_dim), lambda i: (i, 0)),
        ]
        flat = [*g_flat, *h_flat, *f_flat]
        for p in flat:
            if p.ndim == 2:
                in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0)))
            else:
                in_specs.append(pl.BlockSpec(p.shape, lambda i: (0,)))
        neg_logp, grad = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
                       pl.BlockSpec((block_rows, z_dim), lambda i: (i, 0))),
            out_shape=(jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                       jax.ShapeDtypeStruct((n_pad, z_dim), jnp.float32)),
            interpret=interpret,
        )(z, x, y, v, *flat)
        return neg_logp[:n, 0], grad[:n]

    return fn
