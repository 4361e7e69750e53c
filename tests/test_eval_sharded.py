"""Evaluation with vocab-sharded params: metrics must match the dense path,
and the a2a overflow metric must appear in training metrics."""

import numpy as np
import pytest

from poi_tpu.configs.presets import get_config
from poi_tpu.data.dataset import load_dataset
from poi_tpu.data.pipeline import TrainLoader
from poi_tpu.eval.evaluate import evaluate
from poi_tpu.models.base import DataDims
from poi_tpu.parallel.mesh import make_mesh
from poi_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("smoke")
    ds = load_dataset(cfg.data)
    return cfg, ds


def test_evaluate_with_sharded_params_matches_dense(setup, eight_devices):
    cfg, ds = setup
    dims = DataDims.from_dataset(ds)
    t_tp = Trainer(cfg, dims, mesh=make_mesh(data=4, model=2))
    t_dp = Trainer(cfg, dims.padded_to(2), mesh=make_mesh(data=8, model=1))
    s_tp, s_dp = t_tp.init_state(), t_dp.init_state()

    m_tp = evaluate(t_tp.model, s_tp.params, ds, cfg)
    m_dp = evaluate(t_dp.model, s_dp.params, ds, cfg)
    for k in m_dp:
        assert abs(m_tp[k] - m_dp[k]) < 1e-6, (k, m_tp, m_dp)


def test_a2a_overflow_metric_reported(setup, eight_devices):
    cfg, ds = setup
    cfg = cfg.with_overrides({"mesh.embedding_mode": "a2a", "mesh.a2a_capacity_factor": "8.0"})
    trainer = Trainer(cfg, DataDims.from_dataset(ds), mesh=make_mesh(data=4, model=2))
    state = trainer.init_state()
    loader = TrainLoader(ds.train, batch_size=16, seed=0)
    batch = next(loader)
    loader.close()
    _, metrics = trainer.step(state, batch)
    assert "a2a_overflow" in metrics
    assert float(metrics["a2a_overflow"]) == 0.0  # generous capacity
