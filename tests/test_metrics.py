"""Metric tests vs hand-computed rankings (SURVEY.md §4 Unit tier)."""

import numpy as np

from poi_tpu.eval import metrics


def test_recall_hand_computed():
    topk = np.array([[3, 1, 2], [5, 6, 7], [9, 8, 0]])
    tgt = np.array([1, 5, 4])
    assert metrics.recall_at_k(topk, tgt, 1) == 1 / 3  # only row 1 hits at rank 0
    assert metrics.recall_at_k(topk, tgt, 2) == 2 / 3
    assert metrics.recall_at_k(topk, tgt, 3) == 2 / 3


def test_ndcg_hand_computed():
    topk = np.array([[3, 1, 2], [5, 6, 7]])
    tgt = np.array([1, 5])
    # row 0: rank 1 → 1/log2(3); row 1: rank 0 → 1/log2(2) = 1
    want = (1 / np.log2(3) + 1.0) / 2
    assert abs(metrics.ndcg_at_k(topk, tgt, 3) - want) < 1e-9


def test_ndcg_miss_is_zero():
    topk = np.array([[3, 1, 2]])
    tgt = np.array([7])
    assert metrics.ndcg_at_k(topk, tgt, 3) == 0.0


def test_ranking_metrics_bundle():
    topk = np.array([[1, 2, 3, 4, 5, 6, 7, 8, 9, 10]])
    m = metrics.ranking_metrics(topk, np.array([10]), ks=(1, 5, 10))
    assert m["recall@1"] == 0.0 and m["recall@5"] == 0.0 and m["recall@10"] == 1.0
    assert abs(m["ndcg@10"] - 1 / np.log2(11)) < 1e-9
