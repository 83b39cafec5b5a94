"""Parity tests for the Pallas fused kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesgm_tpu.models import causalbgm as cb
from bayesgm_tpu.ops import nn
from bayesgm_tpu.ops import pallas_kernels as pk


def _tiny_cfg(binary, sigma_v=None):
    return cb.CBGMConfig(v_dim=6, z_dims=(1, 1, 1, 2), binary_treatment=binary,
                         use_bnn=False, kl_weight=1e-4, sigma_v=sigma_v, sigma_x=None,
                         sigma_y=None, use_z_rec=1.0, lr=2e-4, lr_theta=1e-4,
                         lr_z=1e-4, g_d_freq=5)


def _nets(cfg):
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    return {
        "g": nn.init_mlp(keys[0], sum(cfg.z_dims), cfg.v_dim + 1, [16, 16]),
        "h": nn.init_mlp(keys[1], cfg.z_dims[0] + cfg.z_dims[2], 2, [8]),
        "f": nn.init_mlp(keys[2], cfg.z_dims[0] + cfg.z_dims[1] + 1, 2, [8]),
    }


def _check(cfg, binary):
    nets = _nets(cfg)
    n = 50
    z = jax.random.normal(jax.random.PRNGKey(3), (n, sum(cfg.z_dims)))
    if binary:
        x = (jax.random.uniform(jax.random.PRNGKey(4), (n, 1)) < 0.5).astype(jnp.float32)
    else:
        x = jax.random.normal(jax.random.PRNGKey(4), (n, 1))
    y = jax.random.normal(jax.random.PRNGKey(5), (n, 1))
    v = jax.random.normal(jax.random.PRNGKey(6), (n, cfg.v_dim))

    fused = pk.make_fused_causal_logp(
        cfg, pk.mlp_layer_dims(nets["g"]), pk.mlp_layer_dims(nets["h"]),
        pk.mlp_layer_dims(nets["f"]), block_rows=16, interpret=True)
    gf, hf, ff = (pk.flatten_mlp_params(nets[k]) for k in "ghf")
    neg_p = np.asarray(fused(z, x, y, v, gf, hf, ff))
    neg_x = np.asarray(cb._neg_log_posterior_rows(cfg, nets, z, x, y, v, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(neg_p, neg_x, rtol=1e-4, atol=1e-4)


def test_fused_causal_logp_continuous():
    _check(_tiny_cfg(binary=False), binary=False)


def test_fused_causal_logp_binary():
    _check(_tiny_cfg(binary=True), binary=True)


def test_fused_causal_logp_fixed_sigma():
    _check(_tiny_cfg(binary=False, sigma_v=0.5), binary=False)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="BNN kernel uses the on-core TPU PRNG (no interpret-mode lowering)")
def test_fused_bnn_logp_matches_xla_in_deterministic_limit():
    """With rho -> -inf the flipout perturbation vanishes and the fused BNN
    kernel must agree with the XLA composite exactly.  (Stochastic-moment
    parity and the 1.38x timing vs XLA are verified on hardware; RESULTS.md.)"""
    cfg = cb.CBGMConfig(v_dim=6, z_dims=(1, 1, 1, 2), binary_treatment=False,
                        use_bnn=True, kl_weight=1e-4, sigma_v=None, sigma_x=None,
                        sigma_y=None, use_z_rec=1.0, lr=2e-4, lr_theta=1e-4,
                        lr_z=1e-4, g_d_freq=5)
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    nets = {
        "g": nn.init_flipout_mlp(keys[0], 5, 7, [16]),
        "h": nn.init_flipout_mlp(keys[1], 2, 2, [8]),
        "f": nn.init_flipout_mlp(keys[2], 3, 2, [8]),
    }
    for name in nets:
        for layer in nets[name]["layers"]:
            layer["rho"] = jnp.full_like(layer["rho"], -20.0)
    n = 40
    z = jax.random.normal(jax.random.PRNGKey(3), (n, 5))
    x = jax.random.normal(jax.random.PRNGKey(4), (n, 1))
    y = jax.random.normal(jax.random.PRNGKey(5), (n, 1))
    v = jax.random.normal(jax.random.PRNGKey(6), (n, 6))
    fused = pk.make_fused_causal_logp_bnn(
        cfg, pk.flipout_mlp_layer_dims(nets["g"]), pk.flipout_mlp_layer_dims(nets["h"]),
        pk.flipout_mlp_layer_dims(nets["f"]))
    gf, hf, ff = (pk.flatten_flipout_params(nets[k]) for k in "ghf")
    neg_p = np.asarray(fused(z, x, y, v, jnp.array([1, 2], jnp.int32), gf, hf, ff))
    neg_x = np.asarray(cb._neg_log_posterior_rows(cfg, nets, z, x, y, v, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(neg_p, neg_x, rtol=1e-3, atol=1e-3)


def test_fused_latent_update_matches_xla_training(tmp_path):
    """fit() with use_pallas_latent=True (interpret mode on CPU) must produce
    the same training trajectory as the XLA latent update — the non-BNN
    posterior is deterministic, so the swap is numerically exact."""
    from bayesgm_tpu.models.causalbgm import CausalBGM

    rng = np.random.RandomState(0)
    n, v_dim = 64, 4
    v = rng.randn(n, v_dim).astype("float32")
    x = rng.rand(n, 1).astype("float32")
    y = (x + v[:, :1]).astype("float32")
    base = dict(v_dim=v_dim, z_dims=[1, 1, 1, 2], binary_treatment=False,
                dataset="fused", output_dir=str(tmp_path), use_bnn=False,
                g_units=[8], e_units=[8], f_units=[8], h_units=[8], dz_units=[8],
                save_res=False, save_model=False)

    def run(flag):
        m = CausalBGM({**base, "use_pallas_latent": flag}, random_seed=9)
        m.fit((x, y, v), epochs=2, epochs_per_eval=2, batch_size=16,
              use_egm_init=False, verbose=0)
        return m

    m_fused, m_xla = run(True), run(False)
    np.testing.assert_allclose(np.asarray(m_fused.data_z), np.asarray(m_xla.data_z),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(m_fused.nets), jax.tree.leaves(m_xla.nets)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_pick_block_rows():
    assert pk.pick_block_rows(4 * 500) == 2048
    assert pk.pick_block_rows(4 * 500, budget_bytes=2**20) == 512
    assert pk.pick_block_rows(10**9) == 256


@pytest.mark.parametrize("binary,sigma_v", [(False, None), (True, None), (False, 0.5)])
def test_fused_logp_and_grad_matches_autodiff(binary, sigma_v):
    cfg = _tiny_cfg(binary=binary, sigma_v=sigma_v)
    nets = _nets(cfg)
    n = 40
    z = jax.random.normal(jax.random.PRNGKey(3), (n, sum(cfg.z_dims)))
    if binary:
        x = (jax.random.uniform(jax.random.PRNGKey(4), (n, 1)) < 0.5).astype(jnp.float32)
    else:
        x = jax.random.normal(jax.random.PRNGKey(4), (n, 1))
    y = jax.random.normal(jax.random.PRNGKey(5), (n, 1))
    v = jax.random.normal(jax.random.PRNGKey(6), (n, cfg.v_dim))

    fused = pk.make_fused_causal_logp_and_grad(
        cfg, pk.mlp_layer_dims(nets["g"]), pk.mlp_layer_dims(nets["h"]),
        pk.mlp_layer_dims(nets["f"]), block_rows=16, interpret=True)
    gf, hf, ff = (pk.flatten_mlp_params(nets[k]) for k in "ghf")
    neg_p, grad_p = fused(z, x, y, v, gf, hf, ff)

    def neg_logp(z_):
        return cb._neg_log_posterior_rows(cfg, nets, z_, x, y, v, jax.random.PRNGKey(0))

    neg_x = np.asarray(neg_logp(z))
    grad_x = np.asarray(jax.grad(lambda z_: jnp.sum(neg_logp(z_)))(z))
    np.testing.assert_allclose(np.asarray(neg_p), neg_x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grad_p), grad_x, rtol=2e-3, atol=2e-4)
