"""Best-on-validation model selection (train/selection.py)."""

import numpy as np

from poi_tpu.configs.presets import get_config
from poi_tpu.data.dataset import load_dataset
from poi_tpu.eval.evaluate import evaluate
from poi_tpu.models.base import DataDims
from poi_tpu.train.loop import Trainer, train
from poi_tpu.train.selection import BestOnVal


def test_best_on_val_tracks_and_restores():
    cfg = get_config("smoke").with_overrides(
        {
            "data.val_fraction": "0.2",
            "train.num_steps": "60",
            "train.eval_every": "20",
            "train.checkpoint_every": "20",
        }
    )
    ds = load_dataset(cfg.data)
    assert ds.val is not None and len(ds.val) > 0
    trainer = Trainer(cfg, DataDims.from_dataset(ds))
    tracker = BestOnVal(trainer, ds, cfg)
    trainer, state, _ = train(cfg, ds, trainer=trainer, callbacks=[tracker])

    # The tracker evaluated at steps 20/40/60 and picked the max.
    assert [h["step"] for h in tracker.history] == [20, 40, 60]
    scores = [h["recall@10"] for h in tracker.history]
    assert tracker.best_score == max(scores)
    assert tracker.best_step == tracker.history[int(np.argmax(scores))]["step"]

    # best_params restores the exact params of the best step: evaluating them
    # on val reproduces the recorded best score.
    best = tracker.best_params(state.params)
    m = evaluate(trainer.model, best, ds, cfg, mesh=trainer.mesh, split="val")
    assert abs(m["recall@10"] - tracker.best_score) < 1e-9


def test_best_on_val_requires_val_split():
    import pytest

    cfg = get_config("smoke")
    ds = load_dataset(cfg.data)
    trainer = Trainer(cfg, DataDims.from_dataset(ds))
    with pytest.raises(ValueError):
        BestOnVal(trainer, ds, cfg)


def test_evaluate_unknown_split_raises():
    import pytest

    cfg = get_config("smoke")
    ds = load_dataset(cfg.data)
    trainer = Trainer(cfg, DataDims.from_dataset(ds))
    state = trainer.init_state()
    with pytest.raises(ValueError):
        evaluate(trainer.model, state.params, ds, cfg, split="val")
