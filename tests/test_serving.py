"""Serving-path tests: weight save/load roundtrips and metrics logging."""

import json

import numpy as np
import pytest

from bayesgm_tpu.models.bgm import BGM
from bayesgm_tpu.models.causalbgm import CausalBGM


def _causal_params(tmpdir, **kw):
    p = dict(v_dim=4, z_dims=[1, 1, 1, 1], binary_treatment=False, dataset="u",
             output_dir=tmpdir, use_bnn=False, g_units=[4], e_units=[4],
             f_units=[4], h_units=[4], dz_units=[4], save_res=False, save_model=False)
    p.update(kw)
    return p


def test_causalbgm_save_load_roundtrip(tmp_path):
    params = _causal_params(str(tmp_path))
    rng = np.random.RandomState(0)
    data = (rng.rand(40, 1).astype("f4"), rng.randn(40, 1).astype("f4"),
            rng.randn(40, 4).astype("f4"))
    m = CausalBGM(params, random_seed=1)
    m.fit(data, epochs=1, epochs_per_eval=1, batch_size=16, use_egm_init=False, verbose=0)
    path = str(tmp_path / "model.npz")
    m.save_weights(path)

    m2 = CausalBGM(params, random_seed=99)
    m2.load_weights(path)
    z = np.zeros((5, 4), "float32")
    a = np.asarray(m.get_log_posterior(data[0][:5], data[1][:5], data[2][:5], z))
    b = np.asarray(m2.get_log_posterior(data[0][:5], data[1][:5], data[2][:5], z))
    np.testing.assert_allclose(a, b, rtol=1e-5)
    # latent table travels too
    np.testing.assert_allclose(np.asarray(m.data_z), np.asarray(m2.data_z), rtol=1e-6)


def test_bgm_save_load_roundtrip(tmp_path):
    params = dict(x_dim=4, z_dim=2, dataset="u", output_dir=str(tmp_path),
                  use_bnn=False, g_units=[4], e_units=[4], dz_units=[4],
                  dx_units=[4], save_res=False, save_model=False)
    rng = np.random.RandomState(1)
    data = rng.randn(40, 4).astype("f4")
    m = BGM(params, random_seed=2)
    m.fit(data, epochs=1, epochs_per_eval=1, batch_size=16, use_egm_init=False, verbose=0)
    path = str(tmp_path / "bgm.npz")
    m.save_weights(path)

    m2 = BGM(params, random_seed=50)
    m2.load_weights(path)
    z = np.zeros((5, 2), "float32")
    import jax

    a = np.asarray(m.get_log_posterior(z, data[:5], key=jax.random.PRNGKey(0)))
    b = np.asarray(m2.get_log_posterior(z, data[:5], key=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_metrics_logging(tmp_path):
    metrics_path = str(tmp_path / "metrics.jsonl")
    params = _causal_params(str(tmp_path), metrics_path=metrics_path)
    rng = np.random.RandomState(3)
    data = (rng.rand(40, 1).astype("f4"), rng.randn(40, 1).astype("f4"),
            rng.randn(40, 4).astype("f4"))
    m = CausalBGM(params, random_seed=4)
    m.fit(data, epochs=2, epochs_per_eval=1, batch_size=16, use_egm_init=False, verbose=0)
    records = [json.loads(line) for line in open(metrics_path)]
    assert len(records) == 3  # epochs 0, 1, 2
    assert all(r["event"] == "eval" for r in records)
    assert {"epoch", "mse_x", "mse_y", "mse_v", "time"} <= set(records[0])
