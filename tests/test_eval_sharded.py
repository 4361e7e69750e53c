"""Evaluation with vocab-sharded params: metrics must match the dense path,
the compiled sharded eval must never all-gather the catalog, and the a2a
overflow metric must appear in training metrics."""

import re

import jax
import numpy as np
import pytest

from poi_tpu.configs.presets import get_config
from poi_tpu.data.dataset import load_dataset
from poi_tpu.data.pipeline import TrainLoader, eval_batches
from poi_tpu.eval.evaluate import evaluate, make_topk_fn, prepare_catalog
from poi_tpu.models.base import DataDims
from poi_tpu.parallel.mesh import make_mesh
from poi_tpu.parallel.shardings import batch_shardings
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


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_sharded_eval_path_matches_dense(setup, eight_devices, impl):
    """evaluate(mesh=...) routes through make_sharded_topk and matches the
    dense (gathering) path bit-for-bit on metrics."""
    cfg, ds = setup
    cfg = cfg.with_overrides({"eval.topk_impl": impl})
    dims = DataDims.from_dataset(ds)
    mesh = make_mesh(data=4, model=2)
    t_tp = Trainer(cfg, dims, mesh=mesh)
    s_tp = t_tp.init_state()

    m_sharded = evaluate(t_tp.model, s_tp.params, ds, cfg, mesh=mesh)
    m_dense = evaluate(t_tp.model, s_tp.params, ds, cfg)  # old gathering path
    for k in m_dense:
        assert abs(m_sharded[k] - m_dense[k]) < 1e-6, (k, m_sharded, m_dense)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_sharded_eval_never_gathers_catalog(setup, eight_devices, impl):
    """The north-star eval sentence (VERDICT r1 Missing #1): on a
    model-parallel mesh the compiled eval HLO must contain NO all-gather of a
    vocab-sized array — the table stays P('model', None) end-to-end."""
    cfg, ds = setup
    cfg = cfg.with_overrides({"eval.topk_impl": impl})
    dims = DataDims.from_dataset(ds)
    mesh = make_mesh(data=4, model=2)
    trainer = Trainer(cfg, dims, mesh=mesh)
    state = trainer.init_state()

    prep = prepare_catalog(state.params, cfg, ds.poi_counts, mesh)
    vp = trainer.dims.num_pois_padded
    vpad = prep.table.shape[0]  # per-shard tile padding may grow it
    d = prep.table.shape[1]
    # The prepared table itself must be vocab-sharded.
    assert prep.table.sharding.spec[0] == "model", prep.table.sharding

    fn = make_topk_fn(trainer.model, cfg, k=10, mesh=mesh, tile_v=prep.tile_v)
    batch, _, _ = next(eval_batches(ds.test, cfg.eval.batch_size))
    batch = jax.device_put(batch, batch_shardings(batch, mesh))
    hlo = fn.lower(state.params, prep.table, prep.bias, batch).compile().as_text()

    gathers = [ln for ln in hlo.splitlines() if "all-gather" in ln]
    bad = [
        ln
        for ln in gathers
        if re.search(rf"\[(\d+,)?({vp}|{vpad}),{d}\]", ln) or f"[{vp}]" in ln or f"[{vpad}]" in ln
    ]
    assert not bad, "catalog-sized all-gather in sharded eval HLO:\n" + "\n".join(bad)


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
