"""Short-probe tuning sweep for config #4 (attention + sampled softmax).

VERDICT r2 Missing #3 / Weak #6: config #4 never got the two knobs the
config-#3 sweep proved decisive on synthetic check-in data — the user
embedding (r@10 0.330 vs 0.157 at 2k steps on #3) and dropout (holds the
curve where undropped runs peak early and decay). Probe both here at the
attention tower's own scale, promote the winner into the preset, then run
the full 5k-step budget (scripts/quality_runs.py).

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

    base = get_config("attention_gowalla")
    ds = load_dataset(base.data)
    pop = None
    for name, over in PROBES.items():
        cfg = base.with_overrides({**over, "train.num_steps": str(steps)})
        t0 = time.time()
        trainer, state, history = train(cfg, ds)
        m = evaluate(trainer.model, state.params, ds, cfg, mesh=trainer.mesh)
        if pop is None:
            pop = popularity_baseline(ds, cfg.eval.recall_ks)
        dt = time.time() - t0
        print(
            f"PROBE {name:>12}: loss={history[-1]['loss']:.3f} "
            f"r@1={m['recall@1']:.4f} r@5={m['recall@5']:.4f} r@10={m['recall@10']:.4f} "
            f"ndcg={m['ndcg@10']:.4f} | pop r@10={pop['recall@10']:.4f} "
            f"{'BEATS POP' if m['recall@10'] > pop['recall@10'] else 'below'} ({dt:.0f}s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000))
