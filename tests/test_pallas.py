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


# ---------------------------------------------------------------------------
# CI-visible stochastic-kernel gate (VERDICT r3 item 9).
#
# The fused BNN kernels draw all noise from the on-core TPU PRNG, which has
# no interpret-mode lowering — so until now the stochastic path was only
# validated by on-chip benchmarks (benchmarks/bnn_kernel_parity.py) and a
# kernel math regression would pass the CPU suite.  These tests close that
# hole: the TPU PRNG is replaced by a deterministic counter-based uint32 bit
# stream (reset at prng_seed, so re-traces replay identically), the FULL
# kernels run in interpret mode on CPU, and the result is compared exactly
# against an independent plain-jnp mirror of the documented construction —
# bit-sliced shared Rademacher signs (_make_sign_source), paired Box-Muller
# normals from 24-bit uniforms (_kernel_normal), flipout perturbation,
# likelihood reductions, and the hand-written z-gradient.  Any change to a
# formula OR to the draw order on either side breaks the exact match.
# ---------------------------------------------------------------------------


class _CounterBits:
    """Deterministic stand-in for the on-core PRNG: draw i is a pure function
    of (i, shape) built from iota + an integer avalanche hash (Pallas rejects
    kernels capturing array constants, so the bits must be COMPUTED in-trace,
    not closed over), and the counter resets at prng_seed — identical values
    on every re-trace, replayable by the mirror."""

    def __init__(self):
        self.counter = 0

    @staticmethod
    def bits_for(i, shape):
        rows, cols = shape
        idx = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(cols)
               + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        x = idx + jnp.uint32(0x9E3779B9) * jnp.uint32(i + 1)
        # murmur3 finalizer: full avalanche, good enough for moment checks
        x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x85EBCA6B)
        x = (x ^ (x >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
        return x ^ (x >> jnp.uint32(16))

    def seed(self, *words):
        self.counter = 0

    def random_bits(self, shape):
        bits = self.bits_for(self.counter, tuple(shape))
        self.counter += 1
        return bits


def _bnn_cfg(binary=False):
    return cb.CBGMConfig(v_dim=6, z_dims=(1, 1, 1, 2), binary_treatment=binary,
                         use_bnn=True, kl_weight=1e-4, sigma_v=None, sigma_x=None,
                         sigma_y=None, use_z_rec=1.0, lr=2e-4, lr_theta=1e-4,
                         lr_z=1e-4, g_d_freq=5)


def _bnn_nets(cfg):
    keys = jax.random.split(jax.random.PRNGKey(12), 3)
    return {
        "g": nn.init_flipout_mlp(keys[0], sum(cfg.z_dims), cfg.v_dim + 1, [16, 8]),
        "h": nn.init_flipout_mlp(keys[1], cfg.z_dims[0] + cfg.z_dims[2], 2, [8]),
        "f": nn.init_flipout_mlp(keys[2], cfg.z_dims[0] + cfg.z_dims[1] + 1, 2, [8]),
    }


def _mirror_uniform(bits):
    """(0,1) uniforms from the high 24 bits — mirror of _kernel_uniform."""
    hi24 = jax.lax.bitcast_convert_type(bits >> jnp.uint32(8), jnp.int32)
    return hi24.astype(jnp.float32) * jnp.float32(2.0**-24)


def _mirror_noise_for_chain(flat, n_layers, rows, draw):
    """Replay one flipout chain's draws in kernel order: the ONE shared sign
    bit matrix first, then (u1, u2) Box-Muller pairs per layer.  Returns
    jnp constants (signs per layer, eps per layer) for a fixed-noise mirror."""
    assert 2 * n_layers <= 32  # shared bit-sliced source engaged
    max_w = max(max(flat[2 + 3 * i].shape) for i in range(n_layers))
    shared = draw((rows, max_w))

    def signs(k, cols):
        sl = shared if cols == max_w else shared[:, :cols]
        word = sl if k == 0 else sl >> jnp.uint32(k)
        low = jax.lax.bitcast_convert_type(word & jnp.uint32(1), jnp.int32)
        return 1.0 - 2.0 * low.astype(jnp.float32)

    layers = []
    for i in range(n_layers):
        loc = flat[2 + 3 * i]
        r, c = loc.shape
        ch = (c + 1) // 2
        u1 = jnp.maximum(_mirror_uniform(draw((r, ch))), jnp.float32(1e-7))
        u2 = _mirror_uniform(draw((r, ch)))
        rad = jnp.sqrt(-2.0 * jnp.log(u1))
        th = jnp.float32(2.0 * 3.14159265) * u2
        eps = jnp.concatenate([rad * jnp.cos(th), rad * jnp.sin(th)], axis=1)[:, :c]
        layers.append((signs(2 * i, r), signs(2 * i + 1, c), eps))
    return layers


def _mirror_flipout_apply(h, flat, noise):
    """Flipout forward with FIXED noise: h@loc + b + ((h*r_in)@(sig*eps))*r_out."""
    h = h * flat[0] + flat[1]
    n_layers = len(noise)
    for i, (r_in, r_out, eps) in enumerate(noise):
        loc, sig, b = flat[2 + 3 * i], flat[2 + 3 * i + 1], flat[2 + 3 * i + 2]
        h_new = h @ loc + b + ((h * r_in) @ (sig * eps)) * r_out
        h = jnp.where(h_new > 0, h_new, pk.LEAKY_SLOPE * h_new) \
            if i < n_layers - 1 else h_new
    return h


def _mirror_neg_logp_fn(cfg, flats, noises, x, y, v):
    """Independent jnp implementation of the fused BNN negative log-posterior
    with the replayed noise — differentiable in z, so jax.grad gives the
    reference for the kernel's hand-written backward."""
    d0, d1, d2, _ = cfg.z_dims
    gf, hf, ff = flats
    gn, hn, fn_ = noises
    eps_f = 1e-6

    def neg_logp(z):
        z0, z1, z2 = z[:, :d0], z[:, d0:d0 + d1], z[:, d0 + d1:d0 + d1 + d2]
        g_out = _mirror_flipout_apply(z, gf, gn)
        mu_v = g_out[:, :cfg.v_dim]
        s_v = jax.nn.softplus(g_out[:, cfg.v_dim]) + eps_f
        loss_v = jnp.sum((v - mu_v) ** 2, axis=1) / (2.0 * s_v) \
            + cfg.v_dim * jnp.log(s_v) / 2.0
        h_out = _mirror_flipout_apply(jnp.concatenate([z0, z2], axis=1), hf, hn)
        if cfg.binary_treatment:
            lx = h_out[:, 0]
            loss_x = jnp.maximum(lx, 0.0) - lx * x[:, 0] + jnp.log1p(jnp.exp(-jnp.abs(lx)))
        else:
            s_x = jax.nn.softplus(h_out[:, 1]) + eps_f
            loss_x = jnp.sum((x - h_out[:, 0:1]) ** 2, axis=1) / (2.0 * s_x) \
                + jnp.log(s_x) / 2.0
        f_out = _mirror_flipout_apply(jnp.concatenate([z0, z1, x], axis=1), ff, fn_)
        s_y = jax.nn.softplus(f_out[:, 1]) + eps_f
        loss_y = jnp.sum((y - f_out[:, 0:1]) ** 2, axis=1) / (2.0 * s_y) \
            + jnp.log(s_y) / 2.0
        return loss_v + loss_x + loss_y + jnp.sum(z * z, axis=1) / 2.0

    return neg_logp


def _stub_prng(monkeypatch, stream):
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(pltpu, "prng_seed", lambda *w: stream.seed(*w))
    monkeypatch.setattr(pltpu, "prng_random_bits", lambda shape: stream.random_bits(shape))
    monkeypatch.setattr(pltpu, "bitcast",
                        lambda x, dt: jax.lax.bitcast_convert_type(x, dt))


def _gate_data(cfg, n=16, binary=False):
    z = jax.random.normal(jax.random.PRNGKey(31), (n, sum(cfg.z_dims)))
    if binary:
        x = (jax.random.uniform(jax.random.PRNGKey(32), (n, 1)) < 0.5).astype(jnp.float32)
    else:
        x = jax.random.normal(jax.random.PRNGKey(32), (n, 1))
    y = jax.random.normal(jax.random.PRNGKey(33), (n, 1))
    v = jax.random.normal(jax.random.PRNGKey(34), (n, cfg.v_dim))
    return z, x, y, v


@pytest.mark.parametrize("binary", [False, True])
def test_fused_bnn_logp_matches_mirror_on_cpu(monkeypatch, binary):
    """Stochastic BNN logp kernel == independent jnp mirror, exactly, with
    the PRNG stubbed — runs in every CPU CI pass."""
    cfg = _bnn_cfg(binary)
    nets = _bnn_nets(cfg)
    flats = tuple(pk.flatten_flipout_params(nets[k]) for k in "ghf")
    dims = tuple(pk.flipout_mlp_layer_dims(nets[k]) for k in "ghf")
    z, x, y, v = _gate_data(cfg, n=16, binary=binary)

    stream = _CounterBits()
    _stub_prng(monkeypatch, stream)
    fused = pk.make_fused_causal_logp_bnn(cfg, *dims, block_rows=16, interpret=True)
    neg_kernel = np.asarray(fused(z, x, y, v, jnp.zeros((2,), jnp.int32), *flats))

    # Replay the stream through the mirror (counter-based: same draw order).
    stream.seed()
    draw = stream.random_bits
    noises = tuple(_mirror_noise_for_chain(f, len(d) - 1, 16, draw)
                   for f, d in zip(flats, dims))
    neg_mirror = np.asarray(_mirror_neg_logp_fn(cfg, flats, noises, x, y, v)(z))

    np.testing.assert_allclose(neg_kernel, neg_mirror, rtol=2e-5, atol=2e-5)
    assert np.all(np.isfinite(neg_kernel))


def test_fused_bnn_logp_and_grad_matches_mirror_autodiff_on_cpu(monkeypatch):
    """Forward+backward BNN kernel vs the mirror: the hand-written in-kernel
    z-gradient must equal jax.grad of the mirror under the SAME replayed
    noise — pinning the backward formulas (leaky mask, sign/perturbation
    transposes, prior term) off-chip."""
    cfg = _bnn_cfg(False)
    nets = _bnn_nets(cfg)
    flats = tuple(pk.flatten_flipout_params(nets[k]) for k in "ghf")
    dims = tuple(pk.flipout_mlp_layer_dims(nets[k]) for k in "ghf")
    z, x, y, v = _gate_data(cfg, n=16)

    stream = _CounterBits()
    _stub_prng(monkeypatch, stream)
    fused_vg = pk.make_fused_causal_logp_and_grad_bnn(cfg, *dims, block_rows=16,
                                                      interpret=True)
    neg_k, grad_k = (np.asarray(a) for a in
                     fused_vg(z, x, y, v, jnp.zeros((2,), jnp.int32), *flats))

    stream.seed()
    noises = tuple(_mirror_noise_for_chain(f, len(d) - 1, 16, stream.random_bits)
                   for f, d in zip(flats, dims))
    mirror = _mirror_neg_logp_fn(cfg, flats, noises, x, y, v)
    neg_m = np.asarray(mirror(z))
    grad_m = np.asarray(jax.grad(lambda zz: jnp.sum(mirror(zz)))(z))

    np.testing.assert_allclose(neg_k, neg_m, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(grad_k, grad_m, rtol=5e-4, atol=5e-5)


def test_mirror_noise_constructions_are_distributionally_sound():
    """The mirrored construction itself (the contract both sides pin):
    24-bit uniforms are U(0,1), paired Box-Muller normals are N(0,1), and
    every bit-plane of one shared draw is a fair Rademacher coin."""
    stream = _CounterBits()
    stream.seed()
    bits = stream.random_bits((512, 64))
    u = np.asarray(_mirror_uniform(bits))
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01 and abs(u.var() - 1.0 / 12.0) < 0.005

    flat = [jnp.ones((64,)), jnp.zeros((64,)),
            jnp.zeros((64, 64)), jnp.zeros((64, 64)), jnp.zeros((64,))]
    noise = _mirror_noise_for_chain(flat, 1, 512, stream.random_bits)
    r_in, r_out, eps = noise[0]
    e = np.asarray(eps).ravel()
    assert abs(e.mean()) < 0.02 and abs(e.std() - 1.0) < 0.02
    for s in (np.asarray(r_in), np.asarray(r_out)):
        assert set(np.unique(s)) <= {-1.0, 1.0}
        assert abs(s.mean()) < 0.02


# ---------------------------------------------------------------------------
# Host-eps kernels (round 3, the default BNN hot path: eps from XLA,
# signs in-kernel — pallas_kernels.make_fused_causal_logp_bnn_hosteps)
# ---------------------------------------------------------------------------


def _split_nets(nets):
    ws, sigs, dims = [], [], []
    for k in "ghf":
        w, s = pk.split_flipout_flat(pk.flatten_flipout_params(nets[k]))
        ws.append(w)
        sigs.append(s)
        dims.append(pk.flipout_mlp_layer_dims(nets[k]))
    return ws, sigs, dims


def _mirror_signs_for_chain(wflat, n_layers, rows, draw):
    """Replay the hosteps chain's ONE shared bit-sliced sign draw."""
    max_w = max(max(wflat[2 + 2 * i].shape) for i in range(n_layers))
    shared = draw((rows, max_w))

    def signs(k, cols):
        sl = shared if cols == max_w else shared[:, :cols]
        word = sl if k == 0 else sl >> jnp.uint32(k)
        low = jax.lax.bitcast_convert_type(word & jnp.uint32(1), jnp.int32)
        return 1.0 - 2.0 * low.astype(jnp.float32)

    return [(signs(2 * i, wflat[2 + 2 * i].shape[0]),
             signs(2 * i + 1, wflat[2 + 2 * i].shape[1]))
            for i in range(n_layers)]


def _mirror_hosteps_apply(h, wflat, sign_pairs, ps):
    h = h * wflat[0] + wflat[1]
    L = len(sign_pairs)
    for i, ((r_in, r_out), P) in enumerate(zip(sign_pairs, ps)):
        loc, b = wflat[2 + 2 * i], wflat[2 + 2 * i + 1]
        h_new = h @ loc + b + ((h * r_in) @ P) * r_out
        h = jnp.where(h_new > 0, h_new, pk.LEAKY_SLOPE * h_new) \
            if i < L - 1 else h_new
    return h


def _mirror_hosteps_neg_logp(cfg, ws, signs, ps_by_net, x, y, v):
    d0, d1, d2, _ = cfg.z_dims
    eps_f = 1e-6

    def neg_logp(z):
        z0, z1, z2 = z[:, :d0], z[:, d0:d0 + d1], z[:, d0 + d1:d0 + d1 + d2]
        g_out = _mirror_hosteps_apply(z, ws[0], signs[0], ps_by_net[0])
        s_v = jax.nn.softplus(g_out[:, cfg.v_dim]) + eps_f
        loss = jnp.sum((v - g_out[:, :cfg.v_dim]) ** 2, axis=1) / (2.0 * s_v) \
            + cfg.v_dim * jnp.log(s_v) / 2.0
        h_out = _mirror_hosteps_apply(jnp.concatenate([z0, z2], axis=1),
                                      ws[1], signs[1], ps_by_net[1])
        if cfg.binary_treatment:
            lx = h_out[:, 0]
            loss += jnp.maximum(lx, 0.0) - lx * x[:, 0] \
                + jnp.log1p(jnp.exp(-jnp.abs(lx)))
        else:
            s_x = jax.nn.softplus(h_out[:, 1]) + eps_f
            loss += jnp.sum((x - h_out[:, 0:1]) ** 2, axis=1) / (2.0 * s_x) \
                + jnp.log(s_x) / 2.0
        f_out = _mirror_hosteps_apply(jnp.concatenate([z0, z1, x], axis=1),
                                      ws[2], signs[2], ps_by_net[2])
        s_y = jax.nn.softplus(f_out[:, 1]) + eps_f
        loss += jnp.sum((y - f_out[:, 0:1]) ** 2, axis=1) / (2.0 * s_y) \
            + jnp.log(s_y) / 2.0
        return loss + jnp.sum(z * z, axis=1) / 2.0

    return neg_logp


def test_split_flipout_flat_roundtrip():
    nets = _bnn_nets(_bnn_cfg())
    flat = pk.flatten_flipout_params(nets["g"])
    w, sigs = pk.split_flipout_flat(flat)
    L = (len(flat) - 2) // 3
    assert len(w) == 2 + 2 * L and len(sigs) == L
    for i in range(L):
        np.testing.assert_array_equal(np.asarray(w[2 + 2 * i]),
                                      np.asarray(flat[2 + 3 * i]))
        np.testing.assert_array_equal(np.asarray(sigs[i]),
                                      np.asarray(flat[2 + 3 * i + 1]))
        np.testing.assert_array_equal(np.asarray(w[2 + 2 * i + 1]),
                                      np.asarray(flat[2 + 3 * i + 2]))


def test_flipout_step_perturbations_distribution():
    sigs = [jnp.full((64, 32), 0.5), jnp.full((32, 8), 2.0)]
    ps = pk.flipout_step_perturbations(sigs, jax.random.PRNGKey(0))
    assert [p.shape for p in ps] == [(1, 64, 32), (1, 32, 8)]
    assert abs(float(ps[0].std()) - 0.5) < 0.02
    ps2 = pk.flipout_step_perturbations(sigs, jax.random.PRNGKey(1), n_sets=2)
    assert [p.shape for p in ps2] == [(2, 64, 32), (2, 32, 8)]
    # the two sets are independent draws, not copies
    assert float(jnp.abs(ps2[0][0] - ps2[0][1]).max()) > 0.1

    # antithetic=True: set 1 is exactly the negation of set 0 (each half's
    # marginal eps law unchanged — normals are symmetric), same shapes.
    psa = pk.flipout_step_perturbations(sigs, jax.random.PRNGKey(1), n_sets=2,
                                        antithetic=True)
    assert [p.shape for p in psa] == [(2, 64, 32), (2, 32, 8)]
    for p in psa:
        np.testing.assert_allclose(np.asarray(p[1]), -np.asarray(p[0]),
                                   rtol=1e-6)
    assert float(jnp.abs(psa[0][0]).max()) > 0.0


@pytest.mark.parametrize("binary", [False, True])
def test_hosteps_bnn_logp_matches_mirror_on_cpu(monkeypatch, binary):
    """Host-eps BNN logp kernel == independent jnp mirror with the sign PRNG
    stubbed and eps explicit — the default hot path's formulas, on CPU CI."""
    cfg = _bnn_cfg(binary)
    nets = _bnn_nets(cfg)
    ws, sigs, dims = _split_nets(nets)
    z, x, y, v = _gate_data(cfg, n=16, binary=binary)
    ps = pk.flipout_step_perturbations(sigs[0] + sigs[1] + sigs[2],
                                       jax.random.PRNGKey(7))

    stream = _CounterBits()
    _stub_prng(monkeypatch, stream)
    fused = pk.make_fused_causal_logp_bnn_hosteps(cfg, *dims, block_rows=16,
                                                  interpret=True)
    neg_kernel = np.asarray(fused(z, x, y, v, jnp.zeros((2,), jnp.int32),
                                  ws[0], ws[1], ws[2], ps))

    stream.seed()
    n_layers = [len(d) - 1 for d in dims]
    signs = [_mirror_signs_for_chain(w, L, 16, stream.random_bits)
             for w, L in zip(ws, n_layers)]
    cuts = np.cumsum([0] + n_layers)
    ps_by_net = [[p[0] for p in ps[cuts[i]:cuts[i + 1]]] for i in range(3)]
    neg_mirror = np.asarray(
        _mirror_hosteps_neg_logp(cfg, ws, signs, ps_by_net, x, y, v)(z))

    np.testing.assert_allclose(neg_kernel, neg_mirror, rtol=2e-5, atol=2e-5)
    assert np.all(np.isfinite(neg_kernel))


def test_hosteps_paired_set_routing_on_cpu(monkeypatch):
    """paired=True routes eps set 0 to the proposed half's blocks and set 1
    to the current half's: each half must equal an unpaired call fed that
    set alone (the stubbed sign stream restarts identically per block)."""
    cfg = _bnn_cfg(False)
    nets = _bnn_nets(cfg)
    ws, sigs, dims = _split_nets(nets)
    z, x, y, v = _gate_data(cfg, n=16)
    all_sigs = sigs[0] + sigs[1] + sigs[2]
    ps2 = pk.flipout_step_perturbations(all_sigs, jax.random.PRNGKey(11),
                                        n_sets=2)

    stream = _CounterBits()
    _stub_prng(monkeypatch, stream)
    paired = pk.make_fused_causal_logp_bnn_hosteps(
        cfg, *dims, block_rows=16, paired=True, interpret=True)
    z2 = jnp.concatenate([z, z + 0.1], axis=0)
    d2 = tuple(jnp.concatenate([a, a], axis=0) for a in (x, y, v))
    neg2 = np.asarray(paired(z2, *d2, jnp.zeros((2,), jnp.int32),
                             ws[0], ws[1], ws[2], ps2))

    single = pk.make_fused_causal_logp_bnn_hosteps(cfg, *dims, block_rows=16,
                                                   interpret=True)
    for half, zz, s in ((0, z, 0), (1, z + 0.1, 1)):
        ps1 = [p[s:s + 1] for p in ps2]
        neg1 = np.asarray(single(zz, x, y, v, jnp.zeros((2,), jnp.int32),
                                 ws[0], ws[1], ws[2], ps1))
        np.testing.assert_allclose(neg2[16 * half:16 * (half + 1)], neg1,
                                   rtol=1e-6, atol=1e-6)
    # and the two halves genuinely differ (different eps sets + states)
    assert np.abs(neg2[:16] - neg2[16:]).max() > 1e-3


def test_hosteps_logp_and_grad_matches_mirror_autodiff_on_cpu(monkeypatch):
    """Hand-written backward of the host-eps forward+backward kernel ==
    jax.grad of the mirror under the same signs/eps."""
    cfg = _bnn_cfg(False)
    nets = _bnn_nets(cfg)
    ws, sigs, dims = _split_nets(nets)
    z, x, y, v = _gate_data(cfg, n=16)
    ps = pk.flipout_step_perturbations(sigs[0] + sigs[1] + sigs[2],
                                       jax.random.PRNGKey(23))

    stream = _CounterBits()
    _stub_prng(monkeypatch, stream)
    fused_vg = pk.make_fused_causal_logp_and_grad_bnn_hosteps(
        cfg, *dims, block_rows=16, interpret=True)
    neg_k, grad_k = (np.asarray(a) for a in
                     fused_vg(z, x, y, v, jnp.zeros((2,), jnp.int32),
                              ws[0], ws[1], ws[2], ps))

    stream.seed()
    n_layers = [len(d) - 1 for d in dims]
    signs = [_mirror_signs_for_chain(w, L, 16, stream.random_bits)
             for w, L in zip(ws, n_layers)]
    cuts = np.cumsum([0] + n_layers)
    ps_by_net = [[p[0] for p in ps[cuts[i]:cuts[i + 1]]] for i in range(3)]
    mirror = _mirror_hosteps_neg_logp(cfg, ws, signs, ps_by_net, x, y, v)
    neg_m = np.asarray(mirror(z))
    grad_m = np.asarray(jax.grad(lambda zz: jnp.sum(mirror(zz)))(z))

    np.testing.assert_allclose(neg_k, neg_m, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(grad_k, grad_m, rtol=5e-4, atol=5e-5)
