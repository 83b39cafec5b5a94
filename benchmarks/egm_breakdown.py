"""Decompose the EGM warm-start iteration cost on-chip.

fit_breakdown.py showed EGM 30k iters = ~78 s of a ~92 s warm flagship fit
(384 it/s) — the dominant training cost.  Each iteration is g_d_freq=5
WGAN-GP critic steps + 1 joint g/e/f/h generator step at bs=32 (reference
causalbgm/base.py:380-431), run as a jitted lax.scan.  This measures where
those 2.6 ms/iter go, scanning VARIANTS of the iteration body:

- full        the production _egm_iter (5 disc + 1 gen)
- disc_only   5 critic steps, generator skipped
- gen_only    generator step only
- disc_nogp   5 critic steps with the gradient-penalty double-backward
              removed (isolates the grad-of-grad cost)
- full_nobnn  same protocol with use_bnn=False plain nets (isolates the
              flipout eps/sign PRNG + perturbation-matmul cost)

Method: carry-dependent scans, whole-scan wall-clock via block_until_ready,
marginal two-length (base vs base+span) to cancel dispatch overhead
(CLAUDE.md "Timing on the tunneled chip").  Variants compare WITHIN this
process only.

Usage:  python benchmarks/egm_breakdown.py [--span 2000] [--json out.jsonl]
"""

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp


def build_scan(cfg, body):
    """jit a keyed scan of `body(carry, key) -> (carry, losses)`."""

    @partial(jax.jit, static_argnames=("n_iters",))
    def chunk(carry, key, n_iters):
        keys = jax.random.split(key, n_iters)
        return jax.lax.scan(body, carry, keys)

    return chunk


def _fetch(carry):
    """Force completion by VALUE TRANSFER of a final-carry leaf.

    block_until_ready through the tunneled chip has been observed returning
    before the work is done (r5: a 5000-iter scan "completed" in 0.01 s);
    a host fetch of a result leaf cannot."""
    import numpy as np

    return np.asarray(jax.tree_util.tree_leaves(carry)[0])


def time_marginal(chunk, carry, key, base, span):
    """Seconds per iteration over `span` extra iterations, warm programs."""
    # warm both lengths
    _fetch(chunk(carry, key, n_iters=base)[0])
    _fetch(chunk(carry, key, n_iters=base + span)[0])
    t0 = time.perf_counter()
    _fetch(chunk(carry, key, n_iters=base)[0])
    t_base = time.perf_counter() - t0
    t0 = time.perf_counter()
    _fetch(chunk(carry, key, n_iters=base + span)[0])
    t_long = time.perf_counter() - t0
    return (t_long - t_base) / span


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base", type=int, default=500)
    p.add_argument("--span", type=int, default=2000)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--json", default=None)
    args = p.parse_args()

    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models import causalbgm as M
    from bayesgm_tpu.models.causalbgm import CausalBGM

    x, y, v = Sim_Hirano_Imbens_sampler(N=20000, v_dim=200, seed=0).load_all()
    data = tuple(jnp.asarray(d, jnp.float32) for d in (x, y, v))

    def make(use_bnn):
        params = dict(v_dim=200, z_dims=[1, 1, 1, 7], binary_treatment=False,
                      dataset="egm_breakdown", output_dir="/tmp/egm_breakdown",
                      use_bnn=use_bnn, save_res=False, save_model=False)
        return CausalBGM(params, random_seed=args.seed)

    m = make(True)
    cfg = m.cfg
    carry = (m.nets, m._opt_d, m._opt_ge)
    key = m._next_key()

    def full_body(c, k):
        return M._egm_iter(cfg, c, k, data, 32)

    def disc_only_body(c, k):
        nets, opt_d, opt_ge = c
        n = data[0].shape[0]
        z_dim = sum(cfg.z_dims)
        keys = jax.random.split(k, cfg.g_d_freq)
        losses = None
        for i in range(cfg.g_d_freq):
            k_idx, k_z, k_step = jax.random.split(keys[i], 3)
            idx = jax.random.randint(k_idx, (32,), 0, n)
            batch_z = jax.random.normal(k_z, (32, z_dim))
            nets, opt_d, losses = M._egm_disc_step(cfg, nets, opt_d, batch_z,
                                                   data[2][idx], k_step)
        return (nets, opt_d, opt_ge), losses

    def gen_only_body(c, k):
        nets, opt_d, opt_ge = c
        n = data[0].shape[0]
        z_dim = sum(cfg.z_dims)
        k_idx, k_z, k_step = jax.random.split(k, 3)
        idx = jax.random.randint(k_idx, (32,), 0, n)
        batch_z = jax.random.normal(k_z, (32, z_dim))
        nets, opt_ge, g_losses = M._egm_gen_step(cfg, nets, opt_ge, batch_z,
                                                 data[2][idx], data[0][idx],
                                                 data[1][idx], k_step)
        return (nets, opt_d, opt_ge), g_losses

    # critic step with the gradient penalty (double-backward) removed —
    # measurement-only variant, NOT the production update.
    from bayesgm_tpu.ops import nn, optim

    def disc_nogp_step(nets, opt_d, z, vv, k):
        k_eps, k_e, k_d = jax.random.split(k, 3)
        z_fake = M._apply(cfg, nets["e"], vv, k_e)

        def d_loss_fn(dz_net):
            d_fake = nn.critic_apply(dz_net, z_fake)
            d_real = nn.critic_apply(dz_net, z)
            dz_loss = -jnp.mean(d_real) + jnp.mean(d_fake)
            return dz_loss, dz_loss

        (d_loss, dz_loss), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(nets["dz"])
        new_dz, opt_d = optim.adam_update(grads, opt_d, nets["dz"], cfg.lr)
        return {**nets, "dz": new_dz}, opt_d, dict(dz_loss=dz_loss, d_loss=d_loss)

    def disc_nogp_body(c, k):
        nets, opt_d, opt_ge = c
        n = data[0].shape[0]
        z_dim = sum(cfg.z_dims)
        keys = jax.random.split(k, cfg.g_d_freq)
        losses = None
        for i in range(cfg.g_d_freq):
            k_idx, k_z, k_step = jax.random.split(keys[i], 3)
            idx = jax.random.randint(k_idx, (32,), 0, n)
            batch_z = jax.random.normal(k_z, (32, z_dim))
            nets, opt_d, losses = disc_nogp_step(nets, opt_d, batch_z,
                                                 data[2][idx], k_step)
        return (nets, opt_d, opt_ge), losses

    m_plain = make(False)
    cfg_plain = m_plain.cfg
    carry_plain = (m_plain.nets, m_plain._opt_d, m_plain._opt_ge)

    def full_nobnn_body(c, k):
        return M._egm_iter(cfg_plain, c, k, data, 32)

    variants = [
        ("full", full_body, carry),
        ("disc_only", disc_only_body, carry),
        ("gen_only", gen_only_body, carry),
        ("disc_nogp", disc_nogp_body, carry),
        ("full_nobnn", full_nobnn_body, carry_plain),
    ]
    results = {}
    for name, body, c0 in variants:
        chunk = build_scan(cfg, body)
        s_per = time_marginal(chunk, c0, key, args.base, args.span)
        results[name] = round(s_per * 1e3, 4)  # ms per scan iteration
        print(f"{name:12s} {s_per * 1e3:8.4f} ms/iter "
              f"({1.0 / s_per:8.1f} it/s)", flush=True)

    out = {"backend": jax.default_backend(), "base": args.base,
           "span": args.span, "ms_per_iter": results}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
