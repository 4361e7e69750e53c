"""Short-probe tuning sweep for config #3 (ST-RNN) model quality.

Round-4 re-validation (VERDICT r3 Next #1): every pre-267dcee tuning
conclusion was measured through the position-0 eval bug, including the
config-#3 preset's "user embedding decisive / dropout 0.5 holds the curve"
story. This sweep re-tests exactly those knobs under the fixed eval,
scoring the VALIDATION split (data.val_fraction) so knob selection never
touches test; the winner is promoted into configs/presets.py and the full
5k-step test row comes from scripts/quality_runs.py with best-on-val.

    python scripts/tune_strnn.py [steps]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# Preset base = user embedding ON + dropout 0.5 (the pre-fix winners).
PROBES = {
    "base": {},
    "no_user": {"model.use_user_embedding": "false"},
    "no_drop": {"model.dropout": "0.0"},
    "drop03": {"model.dropout": "0.3"},
    "h256": {"model.embed_dim": "256", "model.hidden_dim": "256"},
    "lr3e3": {"train.learning_rate": "0.003"},
}


def main(steps: int = 1500) -> int:
    from poi_tpu.configs.presets import get_config
    from poi_tpu.data.dataset import load_dataset
    from poi_tpu.eval.evaluate import evaluate, popularity_baseline
    from poi_tpu.train.loop import train

    base = get_config("strnn_gowalla").with_overrides({"data.val_fraction": "0.1"})
    ds = load_dataset(base.data)
    pop = None
    for name, over in PROBES.items():
        cfg = base.with_overrides({**over, "train.num_steps": str(steps)})
        t0 = time.time()
        trainer, state, history = train(cfg, ds)
        m = evaluate(trainer.model, state.params, ds, cfg, mesh=trainer.mesh, split="val")
        if pop is None:
            pop = popularity_baseline(ds, cfg.eval.recall_ks, split="val")
        dt = time.time() - t0
        print(
            f"PROBE {name:>12}: loss={history[-1]['loss']:.3f} "
            f"VAL r@1={m['recall@1']:.4f} r@5={m['recall@5']:.4f} r@10={m['recall@10']:.4f} "
            f"ndcg={m['ndcg@10']:.4f} | pop r@10={pop['recall@10']:.4f} "
            f"{'BEATS POP' if m['recall@10'] > pop['recall@10'] else 'below'} ({dt:.0f}s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 1500))
