"""Fused flipout-BNN kernels with ALL noise from the in-kernel TPU PRNG.

Historical default (rounds 1-2); the host-eps family in _pk_bnn_hosteps.py is
the production BNN path since round 3.  Kept as the reference implementation
for per-row-block eps draws and for the opt-in multi-step MH window kernel
(params['mh_window_kernel']).  Split out of the former pallas_kernels.py
monolith to contain compile-cache invalidation to this family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bayesgm_tpu.ops.nn import LEAKY_SLOPE
from bayesgm_tpu.ops._pk_traced_common import (
    _flipout_backprop_input,
    _kernel_normal,
    _kernel_signs,
    _kernel_uniform,
    _leaky,
)
from bayesgm_tpu.ops._pk_util import _round_up, on_tpu, pick_block_rows


def _make_sign_source(rows, refs, n_layers):
    """Shared Rademacher source: ONE random-bits draw per flipout chain.

    A chain of ``n_layers`` needs ``2·n_layers`` sign matrices of width ≤ the
    widest layer.  Every bit of a PRNG word is an iid fair coin, so slicing
    bit ``k`` of a single ``(rows, max_width)`` draw per matrix is
    distributionally identical to ``2·n_layers`` independent full draws while
    issuing ~``2·n_layers``× fewer PRNG words (the sign draws dominated the
    kernel's PRNG volume: rows×(in+out) per layer vs in×out for the weight
    noise).  Falls back to per-matrix draws past 32 matrices."""
    from jax.experimental.pallas import tpu as pltpu

    if 2 * n_layers > 32:
        return lambda k, cols: _kernel_signs((rows, cols))
    max_w = max(max(refs[2 + 3 * i].shape) for i in range(n_layers))
    bits = pltpu.bitcast(pltpu.prng_random_bits((rows, max_w)), jnp.uint32)

    def signs(k, cols):
        sl = bits if cols == max_w else bits[:, :cols]
        word = sl if k == 0 else sl >> jnp.uint32(k)
        low = pltpu.bitcast(word & jnp.uint32(1), jnp.int32)
        return 1.0 - 2.0 * low.astype(jnp.float32)

    return signs


def _flipout_chain(h, refs, n_layers):
    """Flipout MLP forward with in-kernel weight noise.

    Per layer: ``h @ loc + b + ((h * r_in) @ (sigma * eps)) * r_out`` with
    eps ~ N(0,I) shared across the block and per-row Rademacher signs —
    the same estimator family as the XLA path (ops/nn.flipout_dense_apply);
    noise is drawn from the TPU core PRNG instead of threefry, so values
    differ by draw but the distribution (and the KL geometry) is identical.
    refs layout: [gamma_eff, beta, loc0, sig0, b0, loc1, ...].
    """
    h = h * refs[0][:] + refs[1][:]
    signs = _make_sign_source(h.shape[0], refs, n_layers)
    for i in range(n_layers):
        loc = refs[2 + 3 * i][:]
        sig = refs[2 + 3 * i + 1][:]
        b = refs[2 + 3 * i + 2][:]
        eps = _kernel_normal(loc.shape)
        r_in = signs(2 * i, loc.shape[0])
        r_out = signs(2 * i + 1, loc.shape[1])
        pert = jnp.dot(h * r_in, sig * eps, preferred_element_type=jnp.float32) * r_out
        h = jnp.dot(h, loc, preferred_element_type=jnp.float32) + b + pert
        if i < n_layers - 1:
            h = _leaky(h)
    return h


def _causal_neg_logp_block(cfg, z, x, y, v, g_refs, h_refs, f_refs,
                           n_g, n_h, n_f):
    """Negative log-posterior rows for one VMEM-resident block (stochastic
    flipout target, fresh in-kernel weight noise).  Shared by the one-shot
    logp kernel and the multi-step MH kernel."""
    d0, d1, d2, _ = cfg.z_dims
    v_dim = cfg.v_dim
    eps_f = 1e-6
    z0 = z[:, :d0]
    z1 = z[:, d0 : d0 + d1]
    z2 = z[:, d0 + d1 : d0 + d1 + d2]

    g_out = _flipout_chain(z, g_refs, n_g)
    mu_v = g_out[:, :v_dim]
    if cfg.sigma_v is not None:
        s_v = jnp.float32(cfg.sigma_v) ** 2
    else:
        s_v = jax.nn.softplus(g_out[:, v_dim]) + eps_f
    loss_v = jnp.sum((v - mu_v) ** 2, axis=1) / (2.0 * s_v) + v_dim * jnp.log(s_v) / 2.0

    h_out = _flipout_chain(jnp.concatenate([z0, z2], axis=1), h_refs, n_h)
    mu_x = h_out[:, 0:1]
    if cfg.binary_treatment:
        lx = mu_x[:, 0]
        loss_x = jnp.maximum(lx, 0.0) - lx * x[:, 0] + jnp.log1p(jnp.exp(-jnp.abs(lx)))
    else:
        if cfg.sigma_x is not None:
            s_x = jnp.float32(cfg.sigma_x) ** 2
        else:
            s_x = jax.nn.softplus(h_out[:, 1]) + eps_f
        loss_x = jnp.sum((x - mu_x) ** 2, axis=1) / (2.0 * s_x) + jnp.log(s_x) / 2.0

    f_out = _flipout_chain(jnp.concatenate([z0, z1, x], axis=1), f_refs, n_f)
    mu_y = f_out[:, 0:1]
    if cfg.sigma_y is not None:
        s_y = jnp.float32(cfg.sigma_y) ** 2
    else:
        s_y = jax.nn.softplus(f_out[:, 1]) + eps_f
    loss_y = jnp.sum((y - mu_y) ** 2, axis=1) / (2.0 * s_y) + jnp.log(s_y) / 2.0

    loss_prior = jnp.sum(z * z, axis=1) / 2.0
    return loss_v + loss_x + loss_y + loss_prior


def make_fused_causal_logp_bnn(cfg, g_dims, h_dims, f_dims,
                               block_rows: int | None = None,
                               interpret: bool | None = None):
    """Fully fused flipout-BNN CausalBGM negative log-posterior kernel.

    The default configuration's MH target (stochastic: fresh weight noise per
    evaluation, reference base.py:765-817 with DenseFlipout nets) in ONE
    pallas_call: three flipout chains with all Gaussian/Rademacher noise
    generated by the on-core PRNG, NLL reductions, and the N(0,I) prior.

    Returns ``fn(z, x, y, v, seed, g_flat, h_flat, f_flat) -> (n,)`` negative
    log-posterior rows; ``seed`` is an int32[2] array (fold of the step key)
    and the grid index decorrelates blocks.
    """
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = not on_tpu()
    d0, d1, d2, _ = cfg.z_dims
    z_dim = sum(cfg.z_dims)
    v_dim = cfg.v_dim
    if block_rows is None:
        max_width = max(*g_dims, *h_dims, *f_dims)
        # forward activations + two live sign matrices per layer
        row_bytes = 4 * (z_dim + 2 + 2 * (v_dim + 1) + 4 * max_width)
        block_rows = pick_block_rows(row_bytes)
    n_g = len(g_dims) - 1
    n_h = len(h_dims) - 1
    n_f = len(f_dims) - 1
    eps_f = 1e-6

    def kernel(seed_ref, z_ref, x_ref, y_ref, v_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        g_refs = wrefs[: 2 + 3 * n_g]
        h_refs = wrefs[2 + 3 * n_g : 4 + 3 * (n_g + n_h)]
        f_refs = wrefs[4 + 3 * (n_g + n_h) :]

        # Mosaic accepts at most two seed words: mix the grid index into the
        # first so each row block draws an independent stream.
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 1103515245, seed_ref[1])

        neg = _causal_neg_logp_block(
            cfg, z_ref[:], x_ref[:], y_ref[:], v_ref[:],
            g_refs, h_refs, f_refs, n_g, n_h, n_f)
        out_ref[:] = neg[:, None]

    def fn(z, x, y, v, seed, g_flat, h_flat, f_flat):
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
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed int32[2]
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
        )(jnp.asarray(seed, jnp.int32), z, x, y, v, *flat)
        return out[:n, 0]

    return fn


def make_fused_mh_steps_bnn(cfg, g_dims, h_dims, f_dims, n_steps: int,
                            block_rows: int | None = None,
                            interpret: bool | None = None):
    """``n_steps`` consecutive random-walk MH steps on the stochastic
    flipout-BNN CausalBGM posterior in ONE ``pallas_call``.

    Chains are row-independent (one per subject, causalbgm/base.py:820-904),
    so each row block advances its sub-chains ``n_steps`` steps with weights
    and conditioning data resident in VMEM: proposal normals, two fresh-noise
    log-posterior evaluations (proposed + current, matching the reference's
    two ``get_log_posterior`` calls per step), accept uniforms and state
    updates all run on-core.  Per-launch HBM traffic drops from
    ``2 * n_steps`` data reads to one, and ``n_steps`` kernel dispatches to
    one.  The proposal sd is FROZEN for the ``n_steps`` window — use
    ``n_steps = adjustment_interval`` so this exactly matches the reference's
    adaptation cadence (q_sd only ever changes at interval boundaries,
    base.py:880-892).

    Returns ``fn(z, x, y, v, seed, q_sd, g_flat, h_flat, f_flat)
    -> (z_out (n,zd), logp_out (n,), accept_counts (n_steps,))`` where
    ``accept_counts[i]`` is the number of accepted moves (over the real n
    rows) at in-window step i.
    """
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = not on_tpu()
    z_dim = sum(cfg.z_dims)
    v_dim = cfg.v_dim
    if block_rows is None:
        max_width = max(*g_dims, *h_dims, *f_dims)
        row_bytes = 4 * (2 * z_dim + 2 + 2 * (v_dim + 1) + 4 * max_width)
        block_rows = pick_block_rows(row_bytes)
    n_g = len(g_dims) - 1
    n_h = len(h_dims) - 1
    n_f = len(f_dims) - 1

    def kernel(sc_ref, qsd_ref, z_ref, x_ref, y_ref, v_ref, *refs):
        z_out_ref, logp_out_ref, acc_ref = refs[-3], refs[-2], refs[-1]
        wrefs = refs[:-3]
        g_refs = wrefs[: 2 + 3 * n_g]
        h_refs = wrefs[2 + 3 * n_g : 4 + 3 * (n_g + n_h)]
        f_refs = wrefs[4 + 3 * (n_g + n_h) :]

        pltpu.prng_seed(sc_ref[0] + pl.program_id(0) * 1103515245, sc_ref[1])
        n_real = sc_ref[2]
        q_sd = qsd_ref[0]

        x = x_ref[:]
        y = y_ref[:]
        v = v_ref[:]
        B = z_ref.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        valid_f = (rows + pl.program_id(0) * B < n_real).astype(jnp.float32)
        step_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_steps), 1)
        ones_row = jnp.ones((1, B), jnp.float32)

        def neg_logp(zz):
            return _causal_neg_logp_block(cfg, zz, x, y, v, g_refs, h_refs,
                                          f_refs, n_g, n_h, n_f)

        def body(i, carry):
            # Everything stays 2-D (Mosaic's vector layouts dislike 1-D
            # scalar reductions); counting runs as (1,B)@(B,1) matmuls.
            z, logp, acc = carry
            proposed = z + q_sd * _kernel_normal(z.shape)
            logp_prop = -neg_logp(proposed)[:, None]
            # Fresh-noise re-evaluation of the current state, as the
            # reference does per step for stochastic targets.
            logp_cur = -neg_logp(z)[:, None]
            u = jnp.maximum(_kernel_uniform((B, 1)), jnp.float32(1e-30))
            accept = jnp.log(u) < (logp_prop - logp_cur)
            z = jnp.where(accept, proposed, z)
            logp = jnp.where(accept, logp_prop, logp_cur)
            cnt = jnp.dot(ones_row, accept.astype(jnp.float32) * valid_f,
                          preferred_element_type=jnp.float32)  # (1,1)
            onehot = (step_iota == i).astype(jnp.float32)  # (1,n_steps)
            acc = acc + jnp.dot(cnt, onehot, preferred_element_type=jnp.float32)
            return z, logp, acc

        z_fin, logp_fin, acc_fin = jax.lax.fori_loop(
            0, n_steps, body,
            (z_ref[:], jnp.zeros((B, 1), jnp.float32),
             jnp.zeros((1, n_steps), jnp.float32)))
        z_out_ref[:] = z_fin
        logp_out_ref[:] = logp_fin
        acc_ref[:] = acc_fin[None, :, :]

    def fn(z, x, y, v, seed, q_sd, g_flat, h_flat, f_flat):
        n = z.shape[0]
        n_pad = _round_up(max(n, 8), block_rows)
        if n_pad != n:
            pad = ((0, n_pad - n), (0, 0))
            z = jnp.pad(z, pad)
            x = jnp.pad(x, pad)
            y = jnp.pad(y, pad)
            v = jnp.pad(v, pad)
        n_blocks = n_pad // block_rows
        grid = (n_blocks,)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed0, seed1, n_real
            pl.BlockSpec(memory_space=pltpu.SMEM),  # q_sd f32[1]
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
        sc = jnp.concatenate([jnp.asarray(seed, jnp.int32).reshape(2),
                              jnp.asarray([n], jnp.int32)])
        z_out, logp_out, acc = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((block_rows, z_dim), lambda i: (i, 0)),
                pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
                # 3-D: last two block dims equal the array dims (Mosaic's
                # block-shape rule; a (1, n_steps) 2-D block violates it).
                pl.BlockSpec((1, 1, n_steps), lambda i: (i, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, z_dim), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks, 1, n_steps), jnp.float32),
            ),
            interpret=interpret,
        )(sc, jnp.asarray(q_sd, jnp.float32).reshape(1), z, x, y, v, *flat)
        return z_out[:n], logp_out[:n, 0], jnp.sum(acc[:, 0, :], axis=0)

    return fn


def _flipout_chain_with_tape(h, refs, n_layers):
    """Flipout forward retaining everything the in-kernel backward needs:
    per-layer inputs are implicit (recomputable), so we keep the perturbation
    matrices P = sig*eps, the sign pairs, and pre-activations."""
    h = h * refs[0][:] + refs[1][:]
    signs = _make_sign_source(h.shape[0], refs, n_layers)
    tape = []
    for i in range(n_layers):
        loc = refs[2 + 3 * i][:]
        sig = refs[2 + 3 * i + 1][:]
        b = refs[2 + 3 * i + 2][:]
        P = sig * _kernel_normal(loc.shape)
        r_in = signs(2 * i, loc.shape[0])
        r_out = signs(2 * i + 1, loc.shape[1])
        pre = (jnp.dot(h, loc, preferred_element_type=jnp.float32) + b
               + jnp.dot(h * r_in, P, preferred_element_type=jnp.float32) * r_out)
        tape.append((loc, P, r_in, r_out, pre))
        h = _leaky(pre) if i < n_layers - 1 else pre
    return h, tape


def make_fused_causal_logp_and_grad_bnn(cfg, g_dims, h_dims, f_dims,
                                        block_rows: int | None = None,
                                        interpret: bool | None = None):
    """Fused flipout-BNN negative log-posterior AND its z-gradient in ONE
    pallas_call: the three stochastic chains keep their noise (perturbation
    matrices, sign pairs) and pre-activations in VMEM, and the hand-written
    backward differentiates through the SAME weight-noise draw — a training
    latent update or a MALA/HMC step for the DEFAULT configuration is a
    single kernel launch.

    Returns ``fn(z, x, y, v, seed, g_flat, h_flat, f_flat) ->
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
        # tape: 3 block-sized arrays per layer (r_in, r_out, pre)
        row_bytes = 4 * (z_dim + 2 + 2 * (v_dim + 1) + 3 * max_width * n_deep)
        block_rows = pick_block_rows(row_bytes, budget_bytes=3 * 2**20)
    n_g = len(g_dims) - 1
    n_h = len(h_dims) - 1
    n_f = len(f_dims) - 1
    eps_f = 1e-6

    def kernel(seed_ref, z_ref, x_ref, y_ref, v_ref, *refs):
        logp_ref, grad_ref = refs[-2], refs[-1]
        wrefs = refs[:-2]
        g_refs = wrefs[: 2 + 3 * n_g]
        h_refs = wrefs[2 + 3 * n_g : 4 + 3 * (n_g + n_h)]
        f_refs = wrefs[4 + 3 * (n_g + n_h) :]

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 1103515245, seed_ref[1])

        z = z_ref[:]
        x = x_ref[:]
        y = y_ref[:]
        v = v_ref[:]
        z0 = z[:, :d0]
        z1 = z[:, d0 : d0 + d1]
        z2 = z[:, d0 + d1 : d0 + d1 + d2]
        b = z.shape[0]

        # ----- g branch -----
        g_out, g_tape = _flipout_chain_with_tape(z, g_refs, n_g)
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
        dz_g = _flipout_backprop_input(cot_g, g_tape, g_refs[0][:])

        # ----- h branch -----
        h_in = jnp.concatenate([z0, z2], axis=1)
        h_out, h_tape = _flipout_chain_with_tape(h_in, h_refs, n_h)
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
        din_h = _flipout_backprop_input(cot_h, h_tape, h_refs[0][:])

        # ----- f branch -----
        f_in = jnp.concatenate([z0, z1, x], axis=1)
        f_out, f_tape = _flipout_chain_with_tape(f_in, f_refs, n_f)
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
        din_f = _flipout_backprop_input(cot_f, f_tape, f_refs[0][:])

        loss_prior = jnp.sum(z * z, axis=1) / 2.0
        logp_ref[:] = (loss_v + loss_x + loss_y + loss_prior)[:, None]

        pad3 = z_dim - (d0 + d1 + d2)
        dz_h = jnp.concatenate(
            [din_h[:, :d0], jnp.zeros((b, d1), jnp.float32), din_h[:, d0:],
             jnp.zeros((b, pad3), jnp.float32)], axis=1)
        dz_f = jnp.concatenate(
            [din_f[:, : d0 + d1], jnp.zeros((b, d2 + pad3), jnp.float32)], axis=1)
        grad_ref[:] = dz_g + dz_h + dz_f + z

    def fn(z, x, y, v, seed, g_flat, h_flat, f_flat):
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
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
        )(jnp.asarray(seed, jnp.int32), z, x, y, v, *flat)
        return neg_logp[:n, 0], grad[:n]

    return fn
