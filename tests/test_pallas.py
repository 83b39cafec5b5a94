"""Parity tests for the Pallas fused kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesgm_tpu.models import causalbgm as cb
from bayesgm_tpu.ops import nn
from bayesgm_tpu.ops import pallas_kernels as pk


def test_fused_mlp_matches_xla():
    net = nn.init_mlp(jax.random.PRNGKey(0), 7, 11, [16, 8])
    x = jax.random.normal(jax.random.PRNGKey(1), (100, 7))
    fused = pk.make_fused_mlp(pk.mlp_layer_dims(net), block_rows=32, interpret=True)
    out_p = fused(x, pk.flatten_mlp_params(net))
    out_x = nn.mlp_apply(net, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-5, atol=1e-5)


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
