"""Production old-vs-new BNN eval cost: in-kernel eps vs host-eps kernels.

Times the ACTUAL shipped kernels (not probe re-builds) at the flagship
paired-predict shape (2n rows stacked), including the host-eps variant's
XLA-side eps generation inside the step body — the honest end-to-end cost
of what `_make_chain_fns` now runs per MH step.  Chip throughput varies
~5x across processes, so both variants are measured in ONE process with
the two-length marginal method; only the ratio is meaningful.

Usage:  python benchmarks/hosteps_speed.py [--n 20000]
"""

import argparse
import json
import os
import sys
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mxu_probe import _build_nets  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--v_dim", type=int, default=200)
    ap.add_argument("--short", type=int, default=50)
    ap.add_argument("--long", type=int, default=250)
    ap.add_argument("--out", default="benchmarks/artifacts/hosteps_speed_r3.jsonl")
    args = ap.parse_args()

    from bayesgm_tpu.ops import pallas_kernels as pk

    if not pk.on_tpu():
        raise SystemExit("TPU-only (in-kernel PRNG has no CPU lowering)")

    cfg = SimpleNamespace(z_dims=[1, 1, 1, 7], v_dim=args.v_dim,
                          sigma_v=None, sigma_x=None, sigma_y=None,
                          binary_treatment=False)
    z_dim, v_dim = sum(cfg.z_dims), args.v_dim
    g_dims = [z_dim, 64, 64, 64, 64, 64, v_dim + 1]
    h_dims = [2, 64, 32, 8, 2]
    f_dims = [3, 64, 32, 8, 2]
    # Paired predict evaluates proposed+current stacked, each half padded to
    # a row-block boundary exactly as production make_params does
    # (causalbgm.py `_make_param_log_prob`: n_pad = ceil(n/block)*block), so
    # the timed program is byte-identical to the shipped hot path's layout
    # (split = n_blocks//2 lands on the true half boundary).
    block = 512
    n_pad = -(-args.n // block) * block
    rows = 2 * n_pad

    key = jax.random.PRNGKey(0)
    kz, kx, ky, kv, kw = jax.random.split(key, 5)
    z = jax.random.normal(kz, (rows, z_dim), jnp.float32)
    x = jax.random.normal(kx, (rows, 1), jnp.float32)
    y = jax.random.normal(ky, (rows, 1), jnp.float32)
    v = jax.random.normal(kv, (rows, v_dim), jnp.float32)
    g_flat, h_flat, f_flat = _build_nets(kw, [g_dims, h_dims, f_dims])
    gw, gs = pk.split_flipout_flat(g_flat)
    hw, hs = pk.split_flipout_flat(h_flat)
    fw, fs = pk.split_flipout_flat(f_flat)
    sigs = gs + hs + fs

    old = pk.make_fused_causal_logp_bnn(cfg, g_dims, h_dims, f_dims,
                                        block_rows=512)
    new = pk.make_fused_causal_logp_bnn_hosteps(cfg, g_dims, h_dims, f_dims,
                                                block_rows=512)
    new_paired = pk.make_fused_causal_logp_bnn_hosteps(
        cfg, g_dims, h_dims, f_dims, block_rows=512, paired=True)

    def body_old(t, zz):
        out = old(zz, x, y, v, jnp.stack([t, jnp.int32(17)]),
                  g_flat, h_flat, f_flat)
        return zz + jnp.float32(1e-24) * out[:, None]

    def body_new(t, zz):
        k_eps, k_sig = jax.random.split(jax.random.fold_in(
            jax.random.PRNGKey(5), t))
        ps = pk.flipout_step_perturbations(sigs, k_eps)
        out = new(zz, x, y, v, pk.key_to_seed(k_sig), gw, hw, fw, ps)
        return zz + jnp.float32(1e-24) * out[:, None]

    def body_new_paired(t, zz):
        k_eps, k_sig = jax.random.split(jax.random.fold_in(
            jax.random.PRNGKey(5), t))
        ps2 = pk.flipout_step_perturbations(sigs, k_eps, n_sets=2)
        out = new_paired(zz, x, y, v, pk.key_to_seed(k_sig), gw, hw, fw, ps2)
        return zz + jnp.float32(1e-24) * out[:, None]

    runs = {}
    for name, body in (("old_inkernel_eps", body_old),
                       ("hosteps", body_new),
                       ("hosteps_paired", body_new_paired)):
        run = jax.jit(lambda z0, steps, body=body: jax.lax.fori_loop(
            0, steps, body, z0))
        t0 = time.perf_counter()
        jax.block_until_ready(run(z, 3))
        compile_s = time.perf_counter() - t0

        def timed(steps, run=run):
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
        runs[name] = ms
        line = {"variant": name, "ms_per_eval": round(ms, 4),
                "reps_ms": [round(r, 4) for r in reps],
                "compile_s": round(compile_s, 1), "rows": rows,
                "speedup_vs_old": round(runs["old_inkernel_eps"] / ms, 3)}
        print(json.dumps(line), flush=True)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
