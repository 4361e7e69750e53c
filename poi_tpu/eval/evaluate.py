"""Full-catalog evaluation (reference R10 → SURVEY.md §3.2b call stack).

The reference scores every POI per test user in a Python loop and argsorts a
dense [V] vector. Here the whole eval set is batched: one jit'd function maps
a batch of contexts to top-K candidate ids by scoring against the (possibly
vocab-sharded) output table — either with XLA's ``lax.top_k`` (correctness
oracle) or the fused Pallas score+top-k kernel (``ops/topk.py``). Metrics
(Recall@{1,5,10}, NDCG) are then O(N·K) on host.

Eval-time catalog layout: the Pallas kernel's running-top-k merge skips vocab
tiles that cannot beat any row's current k-th best, so laying the table out
in descending train-popularity order (real check-in catalogs are power-law)
concentrates winners in the first tiles and lets the tail stream at pure
matmul speed. ``evaluate`` reorders the table once per sweep and maps the
returned ids back through the permutation.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from poi_tpu.data.dataset import Dataset
from poi_tpu.data.pipeline import eval_batches
from poi_tpu.eval.metrics import ranking_metrics
from poi_tpu.models import base as model_base
from poi_tpu.ops.topk import fused_topk, pad_table_for_topk, xla_topk
from poi_tpu.train.losses import full_logits
from poi_tpu.utils.config import Config

log = logging.getLogger(__name__)


def last_valid_queries(model, params: dict, batch) -> jax.Array:
    """[B, D] query at each sequence's final valid position."""
    q = model.queries(params, batch)  # [B, T, D]
    last = jnp.maximum(jnp.sum(batch.mask.astype(jnp.int32), axis=1) - 1, 0)
    return jnp.take_along_axis(q, last[:, None, None], axis=1)[:, 0]


def prepare_catalog(params: dict, cfg: Config, poi_counts: np.ndarray | None):
    """Once-per-sweep table prep: popularity reorder + tile padding.

    Returns (table, bias, order) where ``order`` maps kernel ids back to
    catalog ids (None if no reorder happened).
    """
    table, bias = model_base.output_table(params, cfg.model)
    order = None
    if cfg.eval.topk_impl == "pallas":
        if poi_counts is not None:
            order_np = np.argsort(-poi_counts).astype(np.int32)
            pad = table.shape[0] - len(order_np)
            if pad > 0:  # padded vocab rows stay at the tail
                order_np = np.concatenate([order_np, np.arange(len(order_np), table.shape[0], dtype=np.int32)])
            order = jnp.asarray(order_np)
            table = jnp.take(table, order, axis=0)
            bias = jnp.take(bias, order, axis=0)
        table, bias = pad_table_for_topk(table, bias)
    return jax.block_until_ready((table, bias)), order


# jit closures cached per (model, impl, k): periodic in-training evals must
# not recompile every sweep.
_TOPK_CACHE: dict = {}


def make_topk_fn(model, cfg: Config, k: int):
    """jit'd (params, table, bias, batch) -> [B, k] candidate ids (in the
    prepared table's id space)."""
    impl = cfg.eval.topk_impl
    key = (id(model), impl, k)
    if key in _TOPK_CACHE:
        return _TOPK_CACHE[key]

    @jax.jit
    def fn(params, table, bias, batch):
        ql = last_valid_queries(model, params, batch)
        if impl == "pallas":
            return fused_topk(ql, table, bias, k)[1]
        scores = full_logits(ql, table, bias)  # [B, V]
        return jax.lax.top_k(scores, k)[1]

    _TOPK_CACHE[key] = fn
    return fn


def evaluate(model, params: dict, dataset: Dataset, cfg: Config) -> dict[str, float]:
    ks = cfg.eval.recall_ks
    k = max(ks)
    (table, bias), order = prepare_catalog(params, cfg, dataset.poi_counts)
    topk_fn = make_topk_fn(model, cfg, k)

    test = dataset.test
    if cfg.eval.max_eval_users and len(test) > cfg.eval.max_eval_users:
        test = test.take(np.arange(cfg.eval.max_eval_users))

    order_np = None if order is None else np.asarray(order)
    all_topk, all_tgt = [], []
    for batch, targets, n_valid in eval_batches(test, cfg.eval.batch_size):
        ids = np.asarray(topk_fn(params, table, bias, batch))
        if order_np is not None:
            ids = order_np[ids]  # back to catalog id space
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
