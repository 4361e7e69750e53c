"""Golden-metric regression (SURVEY.md §4 Integration tier): the smoke config
trained 400 steps with fixed seeds must reproduce the recorded loss and
ranking metrics. Catches silent numerics regressions that shape/equivalence
tests can't (e.g. a wrong-but-finite gate ordering).

Regenerate tests/golden_metrics.json deliberately when making an intentional
numerics change (see the snippet in the git history of this file).
"""

import json
import os

import pytest

from poi_tpu.configs.presets import get_config
from poi_tpu.data.dataset import load_dataset
from poi_tpu.eval.evaluate import evaluate
from poi_tpu.train.loop import train

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_metrics.json")


@pytest.mark.slow
def test_golden_metrics_reproduce():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    cfg = get_config("smoke").with_overrides({"train.num_steps": "400", "train.log_every": "100"})
    ds = load_dataset(cfg.data)
    trainer, state, history = train(cfg, ds)
    m = evaluate(trainer.model, state.params, ds, cfg)

    assert abs(history[-1]["loss"] - golden["final_loss"]) < 0.02 * abs(golden["final_loss"]), (
        history[-1]["loss"], golden)
    assert abs(m["recall@10"] - golden["recall@10"]) < 0.03, (m, golden)
    assert abs(m["ndcg@10"] - golden["ndcg@10"]) < 0.03, (m, golden)
