"""Full-catalog evaluation (reference R10 → SURVEY.md §3.2b call stack).

The reference scores every POI per test user in a Python loop and argsorts a
dense [V] vector. Here the whole eval set is batched: one jit'd function maps
a batch of contexts to top-K candidate ids by scoring against the (possibly
vocab-sharded) output table — either with XLA's ``lax.top_k`` (correctness
oracle) or the fused Pallas score+top-k kernel (``ops/topk.py``). Metrics
(Recall@{1,5,10}, NDCG) are then O(N·K) on host.

Sharded eval (the north star's eval sentence, SURVEY.md §2.2 T9): when a
mesh with ``model > 1`` is passed, the vocab-sharded table NEVER leaves its
``P('model', None)`` layout — catalog prep (popularity reorder + tile
padding) runs per shard inside ``shard_map``, each shard runs the fused
kernel over its own rows, and only the [B, M·k] candidate set is gathered.
A 1M×512 catalog therefore costs V/M·D bytes of HBM per device end-to-end
instead of being all-gathered to every chip per sweep.

Eval-time catalog layout: the Pallas kernel's running-top-k merge skips vocab
tiles that cannot beat any row's current k-th best, so laying the table out
in descending train-popularity order (real check-in catalogs are power-law)
concentrates winners in the first tiles and lets the tail stream at pure
matmul speed. ``evaluate`` reorders the table once per sweep and maps the
returned ids back through the permutation (per-shard local reorder in the
sharded path, so the reorder itself moves no data across chips).

Multi-host: with ``jax.process_count() > 1`` each process feeds only the
global-batch rows its addressable devices own (assembled with
``jax.make_array_from_process_local_data``), computes hit/gain counts on its
local top-k shards, and the final metric sums are reduced across processes —
every test example is counted exactly once (SURVEY.md §2.2 T7, eval side).
"""

from __future__ import annotations

import functools
import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from poi_tpu.data.dataset import Dataset
from poi_tpu.data.pipeline import eval_batches
from poi_tpu.eval.metrics import ranking_metrics
from poi_tpu.models import base as model_base
from poi_tpu.ops.topk import NEG, fused_topk, make_sharded_topk, pad_table_for_topk, xla_topk
from poi_tpu.train.losses import full_logits
from poi_tpu.utils.config import Config

log = logging.getLogger(__name__)


def last_valid_queries(model, params: dict, batch) -> jax.Array:
    """[B, D] query at each sequence's final valid position.

    Routed through ``model.queries_last`` — the tower's recurrence still
    traverses T, but attention/projection/user-add run once per row instead
    of once per position (VERDICT r4 Weak #1; parity with the full-T path is
    tested per model in tests/test_models.py)."""
    return model.queries_last(params, batch)


class PreparedCatalog(NamedTuple):
    """Once-per-sweep table prep result."""

    table: jax.Array  # [V', D] (reordered / tile-padded; sharded if mesh)
    bias: jax.Array  # [V']
    id_map: np.ndarray | None  # kernel id -> catalog id (None = identity)
    tile_v: int  # vocab tile the fused kernel must be built with


def _is_sharded(mesh) -> bool:
    from poi_tpu.parallel.mesh import MODEL_AXIS

    return mesh is not None and mesh.shape[MODEL_AXIS] > 1


def prepare_catalog(
    params: dict, cfg: Config, poi_counts: np.ndarray | None, mesh=None
) -> PreparedCatalog:
    """Popularity reorder + tile padding, once per eval sweep.

    Dense path: global reorder/pad. Sharded path (``mesh.model > 1``): both
    happen per shard inside shard_map, so the table stays P('model', None)
    and no vocab-sized array ever crosses chips.
    """
    if _is_sharded(mesh):
        return _prepare_catalog_sharded(params, cfg, poi_counts, mesh)
    table, bias = model_base.output_table(params, cfg.model)
    order = None
    tile_v = 2048
    if cfg.eval.topk_impl == "pallas":
        if poi_counts is not None:
            order = np.argsort(-poi_counts).astype(np.int32)
            pad = table.shape[0] - len(order)
            if pad > 0:  # padded vocab rows stay at the tail
                order = np.concatenate([order, np.arange(len(order), table.shape[0], dtype=np.int32)])
            table = jnp.take(table, jnp.asarray(order), axis=0)
            bias = jnp.take(bias, jnp.asarray(order), axis=0)
        table, bias = pad_table_for_topk(table, bias, tile_v)
    table, bias = jax.block_until_ready((table, bias))
    return PreparedCatalog(table, bias, order, tile_v)


def _prepare_catalog_sharded(
    params: dict, cfg: Config, poi_counts: np.ndarray | None, mesh
) -> PreparedCatalog:
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from poi_tpu.parallel.mesh import MODEL_AXIS

    table, bias = model_base.output_table(params, cfg.model)
    m = mesh.shape[MODEL_AXIS]
    vp, _ = table.shape
    assert vp % m == 0, f"padded vocab {vp} not divisible by model={m}"
    rows = vp // m
    if cfg.eval.topk_impl != "pallas":
        # Per-shard lax.top_k needs no reorder or tile padding; shard-local
        # ids are offset to global rows inside make_sharded_topk, and global
        # rows of the contiguously-sharded padded table ARE catalog ids.
        return PreparedCatalog(table, bias, None, 2048)

    # Per-shard tile size: the fused kernel needs rows % tile_v == 0.
    tile_v = min(2048, -(-rows // 128) * 128)
    rows_p = -(-rows // tile_v) * tile_v
    # Shard-local popularity order (host-side): a within-shard permutation,
    # so applying it under shard_map is a purely local gather.
    counts = np.full(vp, -1.0)
    if poi_counts is not None:
        n = min(len(poi_counts), vp)
        counts[:n] = poi_counts[:n]
    local_order = np.argsort(-counts.reshape(m, rows), axis=1).astype(np.int32)  # [M, rows]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS), P(MODEL_AXIS, None)),
        out_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS)),
    )
    def _prep(t_blk, b_blk, order_blk):
        o = order_blk[0]
        t2 = jnp.take(t_blk, o, axis=0)
        b2 = jnp.take(b_blk, o, axis=0)
        if rows_p > rows:
            t2 = jnp.pad(t2, ((0, rows_p - rows), (0, 0)))
            b2 = jnp.pad(b2, (0, rows_p - rows), constant_values=NEG)
        return t2, b2

    # make_array_from_callback (not device_put): only addressable shards are
    # materialized, so this works on meshes spanning multiple processes.
    order_dev = jax.make_array_from_callback(
        local_order.shape,
        NamedSharding(mesh, P(MODEL_AXIS, None)),
        lambda idx: local_order[idx],
    )
    table_s, bias_s = jax.jit(_prep)(table, bias, order_dev)
    # Kernel ids live in the per-shard-padded space: shard*rows_p + local row.
    id_map = np.zeros(m * rows_p, np.int32)
    for s in range(m):
        id_map[s * rows_p : s * rows_p + rows] = s * rows + local_order[s]
    table_s, bias_s = jax.block_until_ready((table_s, bias_s))
    return PreparedCatalog(table_s, bias_s, id_map, tile_v)


def make_topk_fn(model, cfg: Config, k: int, mesh=None, tile_v: int = 2048):
    """jit'd (params, table, bias, batch) -> [B, k] candidate ids (in the
    prepared table's id space).

    The jit closures are cached ON the model instance (``model._topk_cache``),
    keyed by (impl, k, mesh, tile_v): periodic in-training evals must not
    recompile every sweep, and the cache's lifetime is exactly the model's —
    no module-global keyed on a reusable ``id()`` that could serve a stale
    closure to a new model, and no unbounded growth in a long-lived serving
    process (VERDICT r2 Weak #2). The model→cache→closure→model cycle is
    ordinary cyclic garbage, collected when the last external reference goes.
    """
    impl = cfg.eval.topk_impl
    sharded = _is_sharded(mesh)
    per_model = model.__dict__.setdefault("_topk_cache", {})
    key = (impl, k, mesh if sharded else None, tile_v if sharded else None)
    if key in per_model:
        return per_model[key]

    if sharded:
        core = make_sharded_topk(mesh, k, impl=impl, tile_v=tile_v)

        @jax.jit
        def fn(params, table, bias, batch):
            ql = last_valid_queries(model, params, batch)
            return core(ql, table, bias)[1]

    else:

        @jax.jit
        def fn(params, table, bias, batch):
            ql = last_valid_queries(model, params, batch)
            if impl == "pallas":
                return fused_topk(ql, table, bias, k)[1]
            scores = full_logits(ql, table, bias)  # [B, V]
            return jax.lax.top_k(scores, k)[1]

    per_model[key] = fn
    return fn


def _local_batch_rows(sharding, batch_size: int) -> np.ndarray:
    """Global-batch row indices owned by this process's addressable devices
    (sorted ascending — the order make_array_from_process_local_data expects
    the local rows concatenated in)."""
    idx_map = sharding.addressable_devices_indices_map((batch_size,))
    rows: set[int] = set()
    for sl in idx_map.values():
        (s,) = sl
        rows.update(range(*s.indices(batch_size)))
    return np.asarray(sorted(rows), dtype=np.int64)


def evaluate(
    model, params: dict, dataset: Dataset, cfg: Config, mesh=None, split: str = "test"
) -> dict[str, float]:
    ks = cfg.eval.recall_ks
    k = max(ks)
    sharded = _is_sharded(mesh)
    multiproc = jax.process_count() > 1
    prep = prepare_catalog(params, cfg, dataset.poi_counts, mesh if sharded else None)
    topk_fn = make_topk_fn(model, cfg, k, mesh=mesh if sharded else None, tile_v=prep.tile_v)

    test = getattr(dataset, split)
    if test is None:
        raise ValueError(
            f"dataset has no {split!r} split (set data.val_fraction > 0 for val)"
        )
    if cfg.eval.max_eval_users and len(test) > cfg.eval.max_eval_users:
        test = test.take(np.arange(cfg.eval.max_eval_users))

    batch_shardings = None
    local_rows = None
    if sharded or multiproc:
        from poi_tpu.parallel.shardings import batch_shardings as make_batch_shardings

        assert mesh is not None, "multi-process evaluate() needs the trainer mesh"
        bsz = cfg.eval.batch_size

    all_topk, all_tgt = [], []
    for batch, targets, n_valid in eval_batches(test, cfg.eval.batch_size):
        if sharded or multiproc:
            if batch_shardings is None:
                batch_shardings = make_batch_shardings(batch, mesh)
            if multiproc:
                if local_rows is None:
                    local_rows = _local_batch_rows(jax.tree.leaves(batch_shardings)[0], bsz)
                local = jax.tree.map(lambda x: np.asarray(x)[local_rows], batch)
                batch = jax.tree.map(
                    lambda x, s: jax.make_array_from_process_local_data(s, x),
                    local,
                    batch_shardings,
                )
            else:
                batch = jax.device_put(batch, batch_shardings)
        ids_dev = topk_fn(params, prep.table, prep.bias, batch)
        if multiproc:
            # Only addressable shards can be read; the [B, k] result is
            # replicated over 'model', so dedupe data blocks by start index.
            blocks = {}
            for s in ids_dev.addressable_shards:
                blocks.setdefault(s.index[0].start or 0, s.data)
            ids = np.concatenate([np.asarray(blocks[b]) for b in sorted(blocks)])
            rows = local_rows
            keep = rows < n_valid
            ids = ids[keep]
            tgt = targets[rows[keep]]
        else:
            ids = np.asarray(ids_dev)[:n_valid]
            tgt = targets[:n_valid]
        if prep.id_map is not None:
            ids = prep.id_map[ids]  # back to catalog id space
        all_topk.append(ids)
        all_tgt.append(tgt)
    topk = np.concatenate(all_topk)
    tgt = np.concatenate(all_tgt)
    if multiproc:
        return _reduce_metrics_across_processes(topk, tgt, ks)
    metrics = ranking_metrics(topk, tgt, ks)
    metrics["eval_examples"] = float(len(tgt))
    return metrics


def _reduce_metrics_across_processes(topk: np.ndarray, tgt: np.ndarray, ks) -> dict[str, float]:
    """Sum per-process hit/gain counts over all processes, then normalize —
    each process only scored the rows its devices own."""
    from jax.experimental import multihost_utils

    kmax = max(ks)
    eq = topk[:, :kmax] == tgt[:, None] if len(tgt) else np.zeros((0, kmax), bool)
    sums = [float(eq[:, :k].any(axis=1).sum()) for k in ks]
    found = eq.any(axis=1)
    ranks = np.where(found, eq.argmax(axis=1), 0)
    sums.append(float(np.where(found, 1.0 / np.log2(ranks + 2.0), 0.0).sum()))
    sums.append(float(len(tgt)))
    total = np.asarray(multihost_utils.process_allgather(np.asarray(sums))).sum(axis=0)
    n = max(float(total[-1]), 1.0)
    out = {f"recall@{k}": float(total[i]) / n for i, k in enumerate(ks)}
    out[f"ndcg@{kmax}"] = float(total[len(ks)]) / n
    out["eval_examples"] = float(total[-1])
    return out


def popularity_baseline(dataset: Dataset, ks=(1, 5, 10), split: str = "test") -> dict[str, float]:
    """Recall of always recommending the globally most-popular POIs — the
    sanity floor any trained model must clear (SURVEY.md §4 Integration)."""
    k = max(ks)
    examples = getattr(dataset, split)
    if examples is None:
        raise ValueError(f"dataset has no {split!r} split")
    top = np.argsort(dataset.poi_counts)[::-1][:k]
    topk = np.broadcast_to(top, (len(examples), k))
    return ranking_metrics(topk, examples.target, ks)
