"""Full-catalog evaluation (reference R10 → SURVEY.md §3.2b call stack).

The reference scores every POI per test user in a Python loop and argsorts a
dense [V] vector. Here the whole eval set is batched: one jit'd function maps
a batch of contexts to top-K candidate ids by scoring against the (possibly
vocab-sharded) output table — either with XLA's ``lax.top_k`` (correctness
oracle) or the fused Pallas score+top-k kernel (``ops/topk.py``). Metrics
(Recall@{1,5,10}, NDCG) are then O(N·K) on host.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from poi_tpu.data.dataset import Dataset
from poi_tpu.data.pipeline import eval_batches
from poi_tpu.eval.metrics import ranking_metrics
from poi_tpu.models import base as model_base
from poi_tpu.train.losses import full_logits
from poi_tpu.utils.config import Config

log = logging.getLogger(__name__)


def last_valid_queries(model, params: dict, batch) -> jax.Array:
    """[B, D] query at each sequence's final valid position."""
    q = model.queries(params, batch)  # [B, T, D]
    last = jnp.maximum(jnp.sum(batch.mask.astype(jnp.int32), axis=1) - 1, 0)
    return jnp.take_along_axis(q, last[:, None, None], axis=1)[:, 0]


def make_topk_fn(model, cfg: Config, k: int):
    """jit'd (params, batch) -> [B, k] ranked candidate ids."""
    impl = cfg.eval.topk_impl

    def fn(params, batch):
        ql = last_valid_queries(model, params, batch)
        table, bias = model_base.output_table(params, cfg.model)
        if impl == "pallas":
            from poi_tpu.ops.topk import fused_topk

            return fused_topk(ql, table, bias, k)[1]
        scores = full_logits(ql, table, bias)  # [B, V]
        return jax.lax.top_k(scores, k)[1]

    return jax.jit(fn)


def evaluate(model, params: dict, dataset: Dataset, cfg: Config) -> dict[str, float]:
    ks = cfg.eval.recall_ks
    k = max(ks)
    topk_fn = make_topk_fn(model, cfg, k)

    test = dataset.test
    if cfg.eval.max_eval_users and len(test) > cfg.eval.max_eval_users:
        test = test.take(np.arange(cfg.eval.max_eval_users))

    all_topk, all_tgt = [], []
    for batch, targets, n_valid in eval_batches(test, cfg.eval.batch_size):
        ids = np.asarray(topk_fn(params, batch))
        all_topk.append(ids[:n_valid])
        all_tgt.append(targets[:n_valid])
    topk = np.concatenate(all_topk)
    tgt = np.concatenate(all_tgt)
    metrics = ranking_metrics(topk, tgt, ks)
    metrics["eval_examples"] = float(len(tgt))
    return metrics


def popularity_baseline(dataset: Dataset, ks=(1, 5, 10)) -> dict[str, float]:
    """Recall of always recommending the globally most-popular POIs — the
    sanity floor any trained model must clear (SURVEY.md §4 Integration)."""
    k = max(ks)
    top = np.argsort(dataset.poi_counts)[::-1][:k]
    topk = np.broadcast_to(top, (len(dataset.test), k))
    return ranking_metrics(topk, dataset.test.target, ks)
