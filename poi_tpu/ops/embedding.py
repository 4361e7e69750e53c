"""Vocab-sharded embedding lookup (SURVEY.md §2.2 T2/T3; north-star
"row-sharded lookups with all-to-all gather" — BASELINE.json:5).

The [V, D] POI table is row-sharded over the 'model' mesh axis in contiguous
blocks of ``V // M`` rows (V padded up to a multiple of M at init; padded rows
are neutralized by an out-of-band bias, see ``models.base``). Two exchange
strategies, both differentiable end-to-end through JAX's collective transpose
rules, both property-tested against a dense gather:

- ``psum``  (default, exact): every shard gathers the ids it owns (clamped
  gather + ownership mask) and the partial vectors are summed over 'model'.
  Backward = masked scatter-add of the replicated gradient. Simple, robust,
  bandwidth O(N·D) per device — optimal when the consumer needs replicated
  outputs (our DP towers do).

- ``a2a``   (MoE-style routing): ids are split over the 'model' axis
  (each shard processes N/M of them), bucketed by owner shard into
  fixed-capacity buckets, exchanged with ``all_to_all``, gathered locally,
  returned with a second ``all_to_all``, and finally ``all_gather``-ed to
  replicate. Fixed capacity C = ceil(N/(M·M) · factor); bucket overflow
  contributes zero vectors and is surfaced via ``lookup_overflow_fraction``
  — size the factor so overflow never fires in training (capacity metrics
  are the MoE-standard guard; SURVEY.md §7 "ragged all-to-all").
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from poi_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from poi_tpu.parallel import collectives as cc


def pad_vocab(v: int, model_shards: int) -> int:
    """Catalog rows padded up to a multiple of the model axis."""
    return -(-v // model_shards) * model_shards


# --------------------------------------------------------------------------- #
# psum mode
# --------------------------------------------------------------------------- #


def _psum_lookup_local(table_local: jax.Array, ids: jax.Array) -> jax.Array:
    """Runs per-device inside shard_map. table_local: [V/M, D]; ids: [...]."""
    rows = table_local.shape[0]
    shard = cc.axis_index(MODEL_AXIS)
    lo = shard * rows
    local = ids - lo
    in_range = (local >= 0) & (local < rows)
    vecs = jnp.take(table_local, jnp.clip(local, 0, rows - 1), axis=0)
    vecs = jnp.where(in_range[..., None], vecs, 0.0)
    return cc.psum(vecs, MODEL_AXIS)


def make_psum_lookup(mesh: Mesh) -> Callable:
    """lookup(table [V, D] sharded P('model', None), ids [B, T] sharded
    P('data')) -> [B, T, D] sharded P('data'), replicated over 'model'."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None, None),
        check_rep=False,
    )
    def lookup(table, ids):
        return _psum_lookup_local(table, ids)

    return lookup


# --------------------------------------------------------------------------- #
# a2a mode (MoE-style fixed-capacity routing)
# --------------------------------------------------------------------------- #


def _route_by_owner(ids_flat: jax.Array, num_shards: int, rows_per_shard: int, capacity: int):
    """Bucket ids by owning shard with fixed per-destination capacity.

    Returns (send_ids [M, C], slot_of_id (owner [N], rank [N]), overflow [N] bool).
    """
    n = ids_flat.shape[0]
    owner = jnp.clip(ids_flat // rows_per_shard, 0, num_shards - 1)
    order = jnp.argsort(owner)  # stable
    sorted_owner = owner[order]
    counts = jnp.bincount(owner, length=num_shards)
    starts = jnp.cumsum(counts) - counts
    rank_sorted = jnp.arange(n) - starts[sorted_owner]
    # Scatter back to original positions.
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted.astype(jnp.int32))
    overflow = rank >= capacity
    # Out-of-capacity ranks are out-of-bounds writes → dropped by mode="drop".
    send_ids = jnp.zeros((num_shards, capacity), ids_flat.dtype)
    send_ids = send_ids.at[owner, rank].set(ids_flat, mode="drop")
    return send_ids, owner, rank, overflow


def _a2a_lookup_local(table_local: jax.Array, ids: jax.Array, capacity: int):
    """Per-device body. ids: this device's [N_m] slice of the flat id list."""
    m = cc.axis_size(MODEL_AXIS)
    rows = table_local.shape[0]
    send_ids, owner, rank, overflow = _route_by_owner(ids, m, rows, capacity)
    # Exchange requests: row d of send_ids goes to shard d.
    recv_ids = cc.all_to_all(send_ids, MODEL_AXIS, split_axis=0, concat_axis=0)  # [M, C]
    # Serve: gather owned rows.
    local = jnp.clip(recv_ids - cc.axis_index(MODEL_AXIS) * rows, 0, rows - 1)
    served = jnp.take(table_local, local, axis=0)  # [M, C, D]
    # Return vectors to requesters.
    recv_vecs = cc.all_to_all(served, MODEL_AXIS, split_axis=0, concat_axis=0)  # [M, C, D]
    # Un-bucket into original order; overflow slots contribute zeros.
    vecs = recv_vecs[owner, jnp.clip(rank, 0, capacity - 1)]
    return jnp.where(overflow[..., None], 0.0, vecs)


def make_a2a_lookup(mesh: Mesh, capacity_factor: float = 2.0) -> Callable:
    """Routing lookup. The flat id list is split over 'model' for the
    exchange, then results are all-gathered back to replicated."""
    m = mesh.shape[MODEL_AXIS]

    def lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None)),
            out_specs=P(DATA_AXIS, None, None),
            check_rep=False,
        )
        def inner(table_local, ids_blk):
            flat = ids_blk.reshape(-1)
            nloc = flat.shape[0]
            nloc_pad = -(-nloc // m) * m
            flat = jnp.pad(flat, (0, nloc_pad - nloc))
            # Split this device's ids over the model axis: keep our slice.
            my = cc.axis_index(MODEL_AXIS)
            chunk = nloc_pad // m
            cap = max(1, int(-(-chunk // m) * capacity_factor))
            my_ids = jax.lax.dynamic_slice(flat, (my * chunk,), (chunk,))
            my_vecs = _a2a_lookup_local(table_local, my_ids, cap)  # [chunk, D]
            # Replicate over 'model': gather every shard's slice.
            all_vecs = cc.all_gather(my_vecs, MODEL_AXIS, gather_axis=0)  # [nloc_pad, D]
            return all_vecs[:nloc].reshape(*ids_blk.shape, -1)

        return inner(table, ids)

    return lookup


def lookup_overflow_fraction(
    ids: jax.Array,
    num_shards: int,
    rows_per_shard: int,
    capacity_factor: float,
    data_shards: int = 1,
) -> jax.Array:
    """Diagnostic: exact fraction of ids the a2a kernel would drop to bucket
    overflow (capacity metric, logged by obs).

    Computed at the kernel's real granularity (VERDICT r3 Weak #4): the
    global [B, T] id batch is row-sharded over 'data' into ``data_shards``
    slices; each slice flattens, pads to a multiple of M, and splits into M
    contiguous chunks; each chunk is bucketed per owner shard with capacity
    ``ceil(chunk/M · factor)`` (mirrors ``make_a2a_lookup``/``_route_by_owner``).
    An aggregate per-owner count would read 0 under cross-slice skew that
    overflows real buckets — this does not. Pad slots sort after every real
    id within a chunk (stable routing order), so they never displace real
    ids and are excluded here.
    """
    m = num_shards
    flat = ids.reshape(-1)
    n = flat.shape[0]
    d = max(1, int(data_shards))
    nloc = -(-n // d)  # per-data-slice id count (exact: jit enforces divisibility)
    nloc_pad = -(-nloc // m) * m
    chunk = nloc_pad // m
    cap = max(1, int(-(-chunk // m) * capacity_factor))
    # Slice first (contiguous rows of the [B, T] batch), then pad each
    # slice's tail — exactly where the kernel's jnp.pad puts them.
    flat = jnp.concatenate([flat, jnp.full((d * nloc - n,), -1, flat.dtype)])
    x = flat.reshape(d, nloc)
    x = jnp.pad(x, ((0, 0), (0, nloc_pad - nloc)), constant_values=-1)
    x = x.reshape(d, m, chunk)
    owner = jnp.where(x >= 0, jnp.clip(x // rows_per_shard, 0, m - 1), m)
    counts = jnp.sum(jax.nn.one_hot(owner, m, dtype=jnp.int32), axis=2)  # [d, M_src, M_owner]
    over = jnp.maximum(counts - cap, 0)
    return jnp.sum(over) / jnp.maximum(n, 1)


def make_replicated_lookup(mesh: Mesh) -> Callable:
    """Lookup for ids replicated across the mesh (e.g. a shared negative
    pool): psum over 'model', identical on every device."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P()),
        out_specs=P(),
        check_rep=False,
    )
    def lookup(table, ids):
        return _psum_lookup_local(table, ids)

    return lookup


def make_lookup(mesh: Mesh, mode: str, capacity_factor: float = 2.0) -> Callable:
    if mesh.shape[MODEL_AXIS] == 1 or mode == "dense":
        return lambda table, ids: jnp.take(table, ids, axis=0)
    if mode == "psum":
        return make_psum_lookup(mesh)
    if mode == "a2a":
        return make_a2a_lookup(mesh, capacity_factor)
    raise ValueError(f"unknown embedding mode {mode!r}")
