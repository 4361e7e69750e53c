"""Short-probe tuning sweep for config #3 (ST-RNN) model quality.

VERDICT r1 item 3: ST-RNN must beat the popularity floor. Runs N-step probes
over candidate overrides on the real chip and prints recall@10 vs popularity
for each; the winner gets promoted into configs/presets.py.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

PROBES = {
    "base": {},
    "h128": {"model.embed_dim": "128", "model.hidden_dim": "128"},
    "lr3e3": {"train.learning_rate": "0.003"},
    "seq64": {"data.max_seq_len": "64"},
    "untied": {"model.tie_output_embedding": "false"},
    "h128_lr3e3": {
        "model.embed_dim": "128", "model.hidden_dim": "128",
        "train.learning_rate": "0.003",
    },
}


def main(steps: int = 800) -> int:
    from poi_tpu.configs.presets import get_config
    from poi_tpu.data.dataset import load_dataset
    from poi_tpu.eval.evaluate import evaluate, popularity_baseline
    from poi_tpu.train.loop import train

    base = get_config("strnn_gowalla")
    ds_cache: dict[str, object] = {}
    rows = []
    for name, over in PROBES.items():
        cfg = base.with_overrides({**over, "train.num_steps": str(steps)})
        dkey = cfg.data.max_seq_len
        if dkey not in ds_cache:
            ds_cache[dkey] = load_dataset(cfg.data)
        ds = ds_cache[dkey]
        t0 = time.time()
        trainer, state, history = train(cfg, ds)
        m = evaluate(trainer.model, state.params, ds, cfg, mesh=trainer.mesh)
        pop = popularity_baseline(ds, cfg.eval.recall_ks)
        dt = time.time() - t0
        rows.append((name, history[-1]["loss"], m, pop, dt))
        print(
            f"PROBE {name:>12}: loss={history[-1]['loss']:.3f} "
            f"r@1={m['recall@1']:.4f} r@5={m['recall@5']:.4f} r@10={m['recall@10']:.4f} "
            f"ndcg={m['ndcg@10']:.4f} | pop r@10={pop['recall@10']:.4f} "
            f"{'BEATS POP' if m['recall@10'] > pop['recall@10'] else 'below'} ({dt:.0f}s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 800))
