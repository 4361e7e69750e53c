"""Short-probe tuning sweep for config #4 (attention + sampled softmax).

Round-4 post-eval-fix sweep (VERDICT r3 Next #1): the original probe design
(user embedding × dropout — the knobs the config-#3 sweep proved decisive)
was mooted the same day by the 267dcee eval-mask fix; no post-fix sweep ever
landed. This runs it under the fixed eval, scoring the VALIDATION split
(data.val_fraction) so knob selection never touches test; winners are
promoted into configs/presets.py and the full-budget test row comes from
scripts/quality_runs.py with best-on-val.

    python scripts/tune_attention.py [steps]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

PROBES = {
    "base": {},
    "user": {"model.use_user_embedding": "true"},
    "drop03": {"model.dropout": "0.3"},
    "user_drop03": {"model.use_user_embedding": "true", "model.dropout": "0.3"},
    "user_drop05": {"model.use_user_embedding": "true", "model.dropout": "0.5"},
}


def main(steps: int = 2000) -> int:
    from poi_tpu.configs.presets import get_config
    from poi_tpu.data.dataset import load_dataset
    from poi_tpu.eval.evaluate import evaluate, popularity_baseline
    from poi_tpu.train.loop import train

    base = get_config("attention_gowalla").with_overrides({"data.val_fraction": "0.1"})
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
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000))
