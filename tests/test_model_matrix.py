"""Every (model kind x loss kind) combination trains end-to-end: finite
decreasing loss on the smoke dataset. Catches wiring regressions the
per-component tests can't (e.g. a loss that silently ignores the tower)."""

import numpy as np
import pytest

from poi_tpu.configs.presets import get_config
from poi_tpu.data.dataset import load_dataset
from poi_tpu.train.loop import train


@pytest.fixture(scope="module")
def ds_and_cfg():
    cfg = get_config("smoke")
    return cfg, load_dataset(cfg.data)


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["gru", "lstm", "strnn", "attention"])
@pytest.mark.parametrize("loss", ["ce", "bpr", "sampled_softmax"])
def test_model_loss_matrix_trains(kind, loss, ds_and_cfg):
    cfg, ds = ds_and_cfg
    cfg = cfg.with_overrides(
        {
            "model.kind": kind,
            "loss.kind": loss,
            "loss.num_sampled": "64",
            "model.use_user_embedding": "true" if kind == "lstm" else "false",
            "train.num_steps": "60",
            "train.log_every": "20",
        }
    )
    _, state, history = train(cfg, ds)
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(l) for l in losses), (kind, loss, losses)
    assert losses[-1] < losses[0], (kind, loss, losses)


@pytest.mark.slow
def test_multihost_1m_config_scaled(eight_devices):
    """The config-#5 path (a2a tables + user embedding + sampled softmax +
    attention tower) end-to-end on a (4, 2) fake mesh, scaled to CPU size."""
    from poi_tpu.models.base import DataDims
    from poi_tpu.parallel.mesh import make_mesh
    from poi_tpu.data.pipeline import TrainLoader
    from poi_tpu.train.loop import Trainer

    cfg = get_config("multihost_1m").with_overrides(
        {
            "data.num_users": "200",
            "data.num_pois": "2000",
            "data.mean_checkins_per_user": "40",
            "data.min_user_checkins": "4",
            "data.min_poi_checkins": "1",
            "data.max_seq_len": "16",
            "model.embed_dim": "32",
            "model.hidden_dim": "32",
            "model.attn_heads": "2",
            "loss.num_sampled": "128",
            "train.batch_size": "16",
            "train.warmup_steps": "0",
        }
    )
    ds = load_dataset(cfg.data)
    trainer = Trainer(cfg, DataDims.from_dataset(ds), mesh=make_mesh(data=4, model=2))
    state = trainer.init_state()
    loader = TrainLoader(ds.train, batch_size=16, seed=0)
    losses = []
    for _ in range(10):
        state, m = trainer.step(state, next(loader))
        losses.append(float(m["loss"]))
    loader.close()
    assert all(np.isfinite(l) for l in losses)
    assert min(losses[5:]) < losses[0]
    assert float(m["a2a_overflow"]) == 0.0
