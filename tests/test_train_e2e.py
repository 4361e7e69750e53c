"""End-to-end integration: train the smoke config for a few hundred steps on
the fake-device CPU mesh — loss must drop and Recall@10 must beat the
popularity baseline (SURVEY.md §4 Integration tier)."""

import numpy as np
import pytest

from poi_tpu.configs.presets import get_config
from poi_tpu.data.dataset import load_dataset
from poi_tpu.eval.evaluate import evaluate, popularity_baseline
from poi_tpu.train.loop import FaultInjected, Trainer, train
from poi_tpu.models.base import DataDims


@pytest.fixture(scope="module")
def smoke_setup():
    cfg = get_config("smoke").with_overrides({"train.num_steps": "300", "train.log_every": "50"})
    ds = load_dataset(cfg.data)
    return cfg, ds


@pytest.mark.slow
def test_train_loss_decreases_and_beats_popularity(smoke_setup):
    cfg, ds = smoke_setup
    trainer, state, history = train(cfg, ds)
    first, last = history[0]["loss"], history[-1]["loss"]
    assert np.isfinite(last)
    assert last < first * 0.9, f"loss did not decrease: {first} -> {last}"

    m = evaluate(trainer.model, state.params, ds, cfg)
    pop = popularity_baseline(ds, cfg.eval.recall_ks)
    assert m["recall@10"] > 0.0
    assert m["recall@10"] >= pop["recall@10"] * 0.8, f"model {m} vs popularity {pop}"


def test_fault_injection_raises(smoke_setup):
    cfg, ds = smoke_setup
    cfg2 = cfg.with_overrides({"train.fault_inject_step": "3", "train.num_steps": "10"})
    with pytest.raises(FaultInjected):
        train(cfg2, ds)


def test_data_parallel_matches_single_device(smoke_setup):
    """DP over 8 fake devices must reproduce the single-device step
    bit-for-bit-ish (same global batch, same params)."""
    cfg, ds = smoke_setup
    import jax
    from poi_tpu.parallel.mesh import make_mesh
    from poi_tpu.data.pipeline import TrainLoader
    from poi_tpu.parallel.shardings import batch_shardings

    dims = DataDims.from_dataset(ds)
    t_dp = Trainer(cfg, dims, mesh=make_mesh(data=8, model=1))
    t_1d = Trainer(cfg, dims, mesh=make_mesh(data=1, model=1, devices=np.array(jax.devices()[:1])))

    s_dp = t_dp.init_state()
    s_1d = t_1d.init_state()
    # identical init regardless of mesh
    for a, b in zip(jax.tree.leaves(s_dp.params), jax.tree.leaves(s_1d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, rtol=0)

    loader = TrainLoader(ds.train, batch_size=16, seed=0)
    batch = next(loader)
    loader.close()
    s_dp2, m_dp = t_dp.step(s_dp, batch)
    s_1d2, m_1d = t_1d.step(s_1d, batch)
    assert abs(float(m_dp["loss"]) - float(m_1d["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(s_dp2.params), jax.tree.leaves(s_1d2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
