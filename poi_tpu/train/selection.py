"""Best-on-validation model selection.

The check-in corpora behind the named configs are small (10-20k training
windows), so full-budget runs pass their generalization peak mid-run even
with cosine decay + dropout (measured: config #4 peaks ~0.31 r@10 near step
600 and ends ~0.18 at step 5000 under constant LR). The production answer is
standard model selection: hold out a validation split that temporally
precedes the test split (data.val_fraction — Dataset.val), evaluate it every
``eval_every`` steps, and keep the best params. The test split is touched
exactly once, at the end, with the selected params.

Usage::

    tracker = BestOnVal(trainer, ds, cfg)
    trainer_, state, history = train(cfg, ds, callbacks=[tracker])
    best_params = tracker.best_params(state.params)   # device, sharded
    m = evaluate(trainer.model, best_params, ds, cfg, split="test")
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger(__name__)


class BestOnVal:
    """Train-loop callback: track the params with the best validation metric.

    The best params are kept as a host copy (``jax.device_get``) so they
    survive the donated-buffer train step; ``best_params()`` re-shards them
    onto the trainer's mesh layout.
    """

    def __init__(self, trainer, dataset, cfg, metric: str | None = None):
        if dataset.val is None:
            raise ValueError("BestOnVal needs data.val_fraction > 0 (Dataset.val)")
        # Default to the largest configured recall cutoff so the metric is
        # guaranteed present in evaluate()'s output; validate explicit picks
        # up front instead of KeyError-ing deep in the train loop.
        ks = tuple(cfg.eval.recall_ks)
        available = {f"recall@{k}" for k in ks} | {f"ndcg@{max(ks)}"}
        if metric is None:
            metric = f"recall@{max(ks)}"
        elif metric not in available:
            raise ValueError(
                f"BestOnVal metric {metric!r} will not be in evaluate()'s "
                f"output; available with eval.recall_ks={ks}: {sorted(available)}"
            )
        self.trainer = trainer
        self.ds = dataset
        self.cfg = cfg
        self.metric = metric
        self.every = max(1, cfg.train.eval_every)
        self.best_score = float("-inf")
        self.best_step = -1
        self._host_params = None
        self.history: list[dict] = []

    def seed(self, step: int, score: float, host_params) -> None:
        """Adopt a previously-persisted selection as the incumbent best —
        used when resuming a directory whose earlier run already selected
        params, so a worse later-segment peak never overwrites it."""
        self.best_step = step
        self.best_score = score
        self._host_params = host_params

    def __call__(self, step: int, state, metrics) -> None:
        if step % self.every:
            return
        from poi_tpu.eval.evaluate import evaluate

        m = evaluate(
            self.trainer.model, state.params, self.ds, self.cfg,
            mesh=self.trainer.mesh, split="val",
        )
        m["step"] = step
        self.history.append(m)
        score = m[self.metric]
        log.info("val @%d: %s=%.4f (best %.4f @%d)",
                 step, self.metric, score, self.best_score, self.best_step)
        if score > self.best_score:
            self.best_score = score
            self.best_step = step
            self._host_params = jax.device_get(state.params)

    def best_params(self, fallback_params):
        """The selected params, placed with ``fallback_params``' shardings.
        Falls back to the given (final) params when no eval ever ran."""
        if self._host_params is None:
            return fallback_params
        shardings = jax.tree.map(lambda x: x.sharding, fallback_params)
        return jax.device_put(self._host_params, shardings)
