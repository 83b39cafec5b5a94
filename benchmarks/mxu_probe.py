"""Where does the fused flipout-BNN kernel's time actually go? (round-3)

Round-2 established that the default-BNN MH chain is NOT bound by launch
overhead, sign multiplies, or PRNG word volume (each probe bought <=1.04x).
The remaining untested hypothesis is the matmul structure itself: flipout
issues TWO small (in x out) matmuls per layer (loc + perturbation), and the
layer widths (64, 32, 8...) sit far below the 128x128 MXU tile, so each dot
may be mostly padding.

This probe times VARIANT chains with the production launch/scan structure
at the exact flagship paired-predict shape (2n = 40000 rows, v_dim = 200,
z_dims = [1,1,1,7], g [10,64x5,201], h/f [.,64,32,8,2], block_rows = 512):

  prod      production make_fused_causal_logp_bnn (harness sanity check)
  base      re-built production chain (should match prod)
  nopert    perturbation matmul + all noise DROPPED (1 matmul/layer) —
            upper bound for ANY flipout restructuring
  blockdiag semantically EXACT refactor: one (2in x 2out) block-diagonal
            matmul per layer instead of two (in x out) dots
  noprng    both matmuls kept, compile-time-constant noise — bounds the
            PRNG + Box-Muller share with identical matmul structure
  bf16      production structure, bf16 matmul inputs / f32 accumulation

Timing: each variant's one-shot kernel chained through a dynamic-bound
``fori_loop`` (z depends on the previous logp, so iterations serialize);
the two-length marginal method (250 vs 50 steps) cancels dispatch cost.
One compiled program per variant.  Run on the TPU chip only.

Usage:  python benchmarks/mxu_probe.py [--n 20000] [--out file.jsonl]
"""

import argparse
import json
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np


def _build_nets(key, dims_list):
    """Flipout flat param lists [gamma_eff, beta, (loc, sig, b) x L] with
    realistic magnitudes (sig ~ softplus(-5))."""
    flats = []
    for dims in dims_list:
        ks = jax.random.split(key, len(dims))
        key = ks[0]
        flat = [jnp.ones((dims[0],), jnp.float32),          # gamma_eff
                jnp.zeros((dims[0],), jnp.float32)]          # beta
        for i in range(len(dims) - 1):
            fan_in = dims[i]
            loc = jax.random.normal(ks[i], (dims[i], dims[i + 1])) / np.sqrt(fan_in)
            flat.append(loc.astype(jnp.float32))
            flat.append(jnp.full((dims[i], dims[i + 1]), 0.0067, jnp.float32))
            flat.append(jnp.zeros((dims[i + 1],), jnp.float32))
        flats.append(flat)
    return flats


def make_probe_kernel(variant, cfg, g_dims, h_dims, f_dims, block_rows=512):
    """One-shot negative-log-posterior kernel with a swappable chain body.

    Mirrors ops/pallas_kernels.make_fused_causal_logp_bnn's launch structure
    exactly (grid over row blocks, SMEM seed, whole-weight VMEM blocks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bayesgm_tpu.ops import pallas_kernels as pk

    d0, d1, d2, _ = cfg.z_dims
    z_dim = sum(cfg.z_dims)
    v_dim = cfg.v_dim
    n_g, n_h, n_f = len(g_dims) - 1, len(h_dims) - 1, len(f_dims) - 1
    eps_f = 1e-6

    def chain(h, refs, n_layers):
        from jax.experimental.pallas import tpu as pltpu

        h = h * refs[0][:] + refs[1][:]
        if variant in ("base", "bf16", "noeps", "epsref"):
            signs = pk._make_sign_source(h.shape[0], refs, n_layers)
        if variant == "xorsign":
            # Rademacher application without the int->f32 cast + multiply:
            # flip h's float sign bit with the random low bit directly.
            max_w = max(max(refs[2 + 3 * i].shape) for i in range(n_layers))
            xbits = pltpu.bitcast(
                pltpu.prng_random_bits((h.shape[0], max_w)), jnp.int32)

            def xsign(k, hh):
                w = hh.shape[1]
                sl = xbits if w == max_w else xbits[:, :w]
                bit = ((sl >> k) & jnp.int32(1)) << jnp.int32(31)
                return pltpu.bitcast(pltpu.bitcast(hh, jnp.int32) ^ bit,
                                     jnp.float32)
        for i in range(n_layers):
            loc = refs[2 + 3 * i][:]
            sig = refs[2 + 3 * i + 1][:]
            b = refs[2 + 3 * i + 2][:]
            if variant == "nopert":
                h = jnp.dot(h, loc, preferred_element_type=jnp.float32) + b
            elif variant == "noeps":
                r_in = signs(2 * i, loc.shape[0])
                r_out = signs(2 * i + 1, loc.shape[1])
                pert = jnp.dot(h * r_in, sig * jnp.float32(0.01),
                               preferred_element_type=jnp.float32) * r_out
                h = jnp.dot(h, loc, preferred_element_type=jnp.float32) + b + pert
            elif variant == "epsref":
                # eps supplied as a kernel INPUT (here: loc stands in, same
                # cost structure — one extra VMEM-resident (in,out) read);
                # signs stay in-kernel per-row.
                r_in = signs(2 * i, loc.shape[0])
                r_out = signs(2 * i + 1, loc.shape[1])
                pert = jnp.dot(h * r_in, sig * loc,
                               preferred_element_type=jnp.float32) * r_out
                h = jnp.dot(h, loc, preferred_element_type=jnp.float32) + b + pert
            elif variant == "nosigns":
                eps = pk._kernel_normal(loc.shape)
                pert = jnp.dot(h, sig * eps,
                               preferred_element_type=jnp.float32)
                h = jnp.dot(h, loc, preferred_element_type=jnp.float32) + b + pert
            elif variant == "xorsign":
                eps = pk._kernel_normal(loc.shape)
                pert = xsign(2 * i + 1, jnp.dot(
                    xsign(2 * i, h), sig * eps,
                    preferred_element_type=jnp.float32))
                h = jnp.dot(h, loc, preferred_element_type=jnp.float32) + b + pert
            elif variant == "noprng":
                pert = jnp.dot(h, sig * jnp.float32(0.01),
                               preferred_element_type=jnp.float32)
                h = jnp.dot(h, loc, preferred_element_type=jnp.float32) + b + pert
            elif variant == "blockdiag":
                eps = pk._kernel_normal(loc.shape)
                r_in = pk._kernel_signs((h.shape[0], loc.shape[0]))
                r_out = pk._kernel_signs((h.shape[0], loc.shape[1]))
                se = sig * eps
                zb = jnp.zeros_like(loc)
                w2 = jnp.concatenate(
                    [jnp.concatenate([loc, zb], axis=1),
                     jnp.concatenate([zb, se], axis=1)], axis=0)
                h2 = jnp.concatenate([h, h * r_in], axis=1)
                o2 = jnp.dot(h2, w2, preferred_element_type=jnp.float32)
                out_w = loc.shape[1]
                h = o2[:, :out_w] + b + o2[:, out_w:] * r_out
            elif variant == "bf16":
                eps = pk._kernel_normal(loc.shape)
                r_in = signs(2 * i, loc.shape[0])
                r_out = signs(2 * i + 1, loc.shape[1])
                hb = h.astype(jnp.bfloat16)
                pert = jnp.dot((h * r_in).astype(jnp.bfloat16),
                               (sig * eps).astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32) * r_out
                h = jnp.dot(hb, loc.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) + b + pert
            else:  # base — production structure
                eps = pk._kernel_normal(loc.shape)
                r_in = signs(2 * i, loc.shape[0])
                r_out = signs(2 * i + 1, loc.shape[1])
                pert = jnp.dot(h * r_in, sig * eps,
                               preferred_element_type=jnp.float32) * r_out
                h = jnp.dot(h, loc, preferred_element_type=jnp.float32) + b + pert
            if i < n_layers - 1:
                h = pk._leaky(h)
        return h

    def kernel(seed_ref, z_ref, x_ref, y_ref, v_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        g_refs = wrefs[: 2 + 3 * n_g]
        h_refs = wrefs[2 + 3 * n_g : 4 + 3 * (n_g + n_h)]
        f_refs = wrefs[4 + 3 * (n_g + n_h) :]
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 1103515245, seed_ref[1])

        z = z_ref[:]
        x, y, v = x_ref[:], y_ref[:], v_ref[:]
        z0 = z[:, :d0]
        z1 = z[:, d0 : d0 + d1]
        z2 = z[:, d0 + d1 : d0 + d1 + d2]

        g_out = chain(z, g_refs, n_g)
        mu_v = g_out[:, :v_dim]
        s_v = jax.nn.softplus(g_out[:, v_dim]) + eps_f
        loss = (jnp.sum((v - mu_v) ** 2, axis=1) / (2.0 * s_v)
                + v_dim * jnp.log(s_v) / 2.0)

        h_out = chain(jnp.concatenate([z0, z2], axis=1), h_refs, n_h)
        s_x = jax.nn.softplus(h_out[:, 1]) + eps_f
        loss += (jnp.sum((x - h_out[:, 0:1]) ** 2, axis=1) / (2.0 * s_x)
                 + jnp.log(s_x) / 2.0)

        f_out = chain(jnp.concatenate([z0, z1, x], axis=1), f_refs, n_f)
        s_y = jax.nn.softplus(f_out[:, 1]) + eps_f
        loss += (jnp.sum((y - f_out[:, 0:1]) ** 2, axis=1) / (2.0 * s_y)
                 + jnp.log(s_y) / 2.0)

        loss += jnp.sum(z * z, axis=1) / 2.0
        out_ref[:] = loss[:, None]

    def fn(z, x, y, v, seed, g_flat, h_flat, f_flat):
        n = z.shape[0]
        n_pad = pk._round_up(max(n, 8), block_rows)
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
        flat = [*g_flat, *h_flat, *f_flat]
        for p in flat:
            if p.ndim == 2:
                in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0)))
            else:
                in_specs.append(pl.BlockSpec(p.shape, lambda i: (0,)))
        out = pl.pallas_call(
            kernel,
            grid=(n_pad // block_rows,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        )(jnp.asarray(seed, jnp.int32), z, x, y, v, *flat)
        return out[:n, 0]

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--v_dim", type=int, default=200)
    ap.add_argument("--short", type=int, default=50)
    ap.add_argument("--long", type=int, default=250)
    ap.add_argument("--variants", nargs="+",
                    default=["prod", "base", "nopert", "blockdiag",
                             "noprng", "bf16"])
    ap.add_argument("--out", default="benchmarks/artifacts/mxu_probe_r3.jsonl")
    args = ap.parse_args()

    from bayesgm_tpu.ops import pallas_kernels as pk

    if not pk.on_tpu():
        raise SystemExit("TPU-only probe (in-kernel PRNG has no CPU lowering)")

    cfg = SimpleNamespace(z_dims=[1, 1, 1, 7], v_dim=args.v_dim,
                          sigma_v=None, sigma_x=None, sigma_y=None,
                          binary_treatment=False)
    z_dim, v_dim = sum(cfg.z_dims), args.v_dim
    g_dims = [z_dim, 64, 64, 64, 64, 64, v_dim + 1]
    h_dims = [2, 64, 32, 8, 2]
    f_dims = [3, 64, 32, 8, 2]
    rows = 2 * args.n  # paired predict evaluates proposed+current stacked

    key = jax.random.PRNGKey(0)
    kz, kx, ky, kv, kw = jax.random.split(key, 5)
    z = jax.random.normal(kz, (rows, z_dim), jnp.float32)
    x = jax.random.normal(kx, (rows, 1), jnp.float32)
    y = jax.random.normal(ky, (rows, 1), jnp.float32)
    v = jax.random.normal(kv, (rows, v_dim), jnp.float32)
    g_flat, h_flat, f_flat = _build_nets(kw, [g_dims, h_dims, f_dims])

    results = {}
    for variant in args.variants:
        if variant == "prod":
            fn = pk.make_fused_causal_logp_bnn(cfg, g_dims, h_dims, f_dims,
                                               block_rows=512)
        else:
            fn = make_probe_kernel(variant, cfg, g_dims, h_dims, f_dims)

        @jax.jit
        def run(z0, steps, fn=fn):
            def body(t, zz):
                out = fn(zz, x, y, v,
                         jnp.stack([t, jnp.int32(17)]), g_flat, h_flat, f_flat)
                return zz + jnp.float32(1e-24) * out[:, None]
            return jax.lax.fori_loop(0, steps, body, z0)

        t_compile = time.perf_counter()
        jax.block_until_ready(run(z, 3))
        t_compile = time.perf_counter() - t_compile

        def timed(steps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(z, steps))
            return time.perf_counter() - t0

        timed(args.short)  # warm
        reps = []
        for _ in range(3):
            t_s = timed(args.short)
            t_l = timed(args.long)
            reps.append((t_l - t_s) / (args.long - args.short) * 1e3)
        ms = float(np.median(reps))
        results[variant] = ms
        line = {"variant": variant, "ms_per_eval": round(ms, 4),
                "reps_ms": [round(r, 4) for r in reps],
                "compile_s": round(t_compile, 1),
                "speedup_vs_base": round(results.get("base", ms) / ms, 3)
                if "base" in results else None}
        print(json.dumps(line), flush=True)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
