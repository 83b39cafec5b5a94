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
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bayesgm_tpu.ops.nn import LEAKY_SLOPE


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _leaky(h):
    return jnp.where(h > 0, h, LEAKY_SLOPE * h)


def on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


def _mlp_chain(h, weight_refs, n_layers):
    for i in range(n_layers):
        w = weight_refs[2 * i][:]
        b = weight_refs[2 * i + 1][:]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i < n_layers - 1:
            h = _leaky(h)
    return h


def flatten_mlp_params(net) -> list:
    """[w1, b1, ...] from an ops.nn plain-MLP pytree."""
    out = []
    for layer in net["layers"]:
        out.append(layer["w"])
        out.append(layer["b"])
    return out


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


def mlp_layer_dims(net) -> list:
    """[in, h1, ..., out] from an ops.nn plain-MLP pytree."""
    dims = [net["layers"][0]["w"].shape[0]]
    for layer in net["layers"]:
        dims.append(layer["w"].shape[1])
    return dims


# ---------------------------------------------------------------------------
# Flipout-BNN fused log-posterior (the DEFAULT CausalBGM configuration,
# src/bayesgm/models/causalbgm/base.py:64-84 use_bnn=True)
# ---------------------------------------------------------------------------


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


def _kernel_uniform(shape):
    """(0,1) uniforms from the on-core PRNG (24 mantissa bits).

    Mosaic has no uint32->f32 cast; the high 24 bits fit int32, which does.
    """
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    hi24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return hi24.astype(jnp.float32) * jnp.float32(2.0**-24)


def _kernel_normal(shape):
    """Box-Muller standard normals using BOTH outputs of each pair.

    One (u1, u2) uniform pair yields two independent normals
    ``r·cos(2πu2)`` and ``r·sin(2πu2)`` with ``r = sqrt(-2 log u1)``; drawing
    half-width uniforms and concatenating the cos/sin halves therefore halves
    the PRNG volume AND the log/sqrt transcendental count while remaining
    exactly N(0, 1) iid per element."""
    rows, cols = shape
    ch = (cols + 1) // 2
    u1 = jnp.maximum(_kernel_uniform((rows, ch)), jnp.float32(1e-7))
    u2 = _kernel_uniform((rows, ch))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    th = jnp.float32(2.0 * 3.14159265) * u2
    pair = jnp.concatenate([r * jnp.cos(th), r * jnp.sin(th)], axis=1)
    return pair if 2 * ch == cols else pair[:, :cols]


def _kernel_signs(shape):
    """Rademacher +-1 from the low random bit."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    low = pltpu.bitcast(bits & jnp.uint32(1), jnp.int32)
    return 1.0 - 2.0 * low.astype(jnp.float32)


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


def _flipout_backprop_input(cot, tape, gamma_eff):
    """d(loss)/d(chain input) through the stochastic flipout forward (same
    noise as the tape), including the input affine gamma_eff."""
    for i in range(len(tape) - 1, -1, -1):
        loc, P, r_in, r_out, pre = tape[i]
        g = (jnp.dot(cot, loc.T, preferred_element_type=jnp.float32)
             + jnp.dot(cot * r_out, P.T, preferred_element_type=jnp.float32) * r_in)
        if i > 0:
            prev_pre = tape[i - 1][4]
            g = g * jnp.where(prev_pre > 0, 1.0, LEAKY_SLOPE)
        cot = g
    return cot * gamma_eff


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


def key_to_seed(key):
    """Fold a JAX PRNG key into the int32[2] seed the BNN kernel consumes."""
    data = jax.random.key_data(key) if jnp.issubdtype(
        key.dtype, jax.dtypes.prng_key) else key
    return jax.lax.bitcast_convert_type(data.reshape(-1)[:2], jnp.int32)


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


def bnn_block_rows(cfg, g_dims, h_dims, f_dims) -> int:
    """Row-block size :func:`make_fused_causal_logp_bnn` picks by default.

    Mirrors that kernel's VMEM model (forward activations + two live sign
    matrices per layer — keep in sync with its ``block_rows is None``
    branch).  Exposed so the paired 2n-row MH evaluation can pad each half
    to a block boundary, guaranteeing the proposed and current states never
    share a per-block weight-noise draw.  Defined at the END of this file:
    appending here does not shift the MLIR source locations of the kernels
    above, so the persistent compile cache stays valid.
    """
    max_width = max(*g_dims, *h_dims, *f_dims)
    row_bytes = 4 * (sum(cfg.z_dims) + 2 + 2 * (cfg.v_dim + 1) + 4 * max_width)
    return pick_block_rows(row_bytes)


# ---------------------------------------------------------------------------
# Host-eps flipout kernels (round 3, the DEFAULT BNN hot path).
#
# The weight-noise matrices eps are generated in XLA once per evaluation and
# passed in as P = sigma * eps; only the per-row Rademacher signs stay on the
# in-kernel TPU PRNG.  This matches the reference's noise semantics EXACTLY:
# a tfp DenseFlipout layer samples ONE eps per forward call, shared across
# the whole batch, with per-row sign decorrelation (reference
# causalbgm/base.py:765-817 runs each net once per get_log_posterior call) —
# whereas the in-kernel-eps kernels above draw eps per ROW BLOCK (a finer
# approximation than the reference).  It is also ~1.5x faster: the serial MH
# hot loop was bound by the Box-Muller transcendentals, not by matmuls
# (benchmarks/mxu_probe.py: eps generation 0.22 ms of a 0.62 ms eval; eps
# passed as an input is free).
#
# Everything here is APPENDED so the MLIR source locations of the kernels
# above keep their compile-cache entries.
# ---------------------------------------------------------------------------


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


def _sign_source(rows, max_w, n_mats):
    """Shared bit-sliced Rademacher source (see _make_sign_source): one
    random-bits draw serves up to 32 sign matrices."""
    from jax.experimental.pallas import tpu as pltpu

    if n_mats > 32:
        return lambda k, cols: _kernel_signs((rows, cols))
    bits = pltpu.bitcast(pltpu.prng_random_bits((rows, max_w)), jnp.uint32)

    def signs(k, cols):
        sl = bits if cols == max_w else bits[:, :cols]
        word = sl if k == 0 else sl >> jnp.uint32(k)
        low = pltpu.bitcast(word & jnp.uint32(1), jnp.int32)
        return 1.0 - 2.0 * low.astype(jnp.float32)

    return signs


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
