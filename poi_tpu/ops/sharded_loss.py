"""Vocab-sharded training losses (SURVEY.md §2.2 T10).

The dense full-catalog softmax becomes a two-pass sharded log-sum-exp: each
model shard computes logits only against its [V/M, D] rows, the global max
rides ``pmax`` and the partition function rides ``psum`` over 'model'
(numerically stable in fp32 accumulation even for the 1M-POI bf16 config —
SURVEY.md §7 "hard parts"). The target logit is recovered with a masked
local gather + psum. The final scalar is psum-reduced over BOTH mesh axes, so
every device returns the identical global mean loss.

BPR / sampled-softmax don't need catalog-wide matmuls — their negatives go
through the sharded embedding lookup (ops/embedding.py) — so ``ce`` is the
only loss needing its own collective implementation.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from poi_tpu.parallel import collectives as cc
from poi_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

NEG = -1e30


def _sharded_ce_local(
    q: jax.Array,  # [b, t, D] this data-shard's queries (replicated over model)
    table_local: jax.Array,  # [V/M, D]
    bias_local: jax.Array,  # [V/M]
    targets: jax.Array,  # [b, t]
    mask: jax.Array,  # [b, t]
    dtype=jnp.bfloat16,
) -> jax.Array:
    rows = table_local.shape[0]
    shard = cc.axis_index(MODEL_AXIS)
    lo = shard * rows

    # Local logits against owned rows only. Padded catalog rows carry a
    # NEG bias from init, so they vanish from the partition function.
    logits = (
        jnp.dot(q.astype(dtype), table_local.astype(dtype).T, preferred_element_type=jnp.float32)
        + bias_local
    )  # [b, t, V/M]

    # Two-pass stable LSE across shards. The max shift is a constant w.r.t.
    # gradients, so stop_gradient keeps the backward pass clean.
    # stop_gradient BEFORE pmax: the shift is gradient-free mathematically,
    # and pmax has no differentiation rule to trace through.
    local_max = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
    gmax = cc.pmax(local_max, MODEL_AXIS)  # [b, t]
    sumexp = jnp.sum(jnp.exp(logits - gmax[..., None]), axis=-1)
    lse = jnp.log(cc.psum(sumexp, MODEL_AXIS)) + gmax  # [b, t]

    # Target logit: owned on exactly one shard; masked gather + psum.
    local_tgt = targets - lo
    owned = (local_tgt >= 0) & (local_tgt < rows)
    idx = jnp.clip(local_tgt, 0, rows - 1)
    tl = jnp.take_along_axis(logits, idx[..., None], axis=-1)[..., 0]
    tgt_logit = cc.psum(jnp.where(owned, tl, 0.0), MODEL_AXIS)

    nll = lse - tgt_logit
    m = mask.astype(jnp.float32)
    num = cc.psum(jnp.sum(nll * m), DATA_AXIS)
    den = cc.psum(jnp.sum(m), DATA_AXIS)
    return num / jnp.maximum(den, 1.0)


def make_sharded_ce(mesh: Mesh) -> Callable:
    """loss(q, table, bias, targets, mask, rng) — same signature as the dense
    losses in train/losses.py (rng unused), drop-in for the Trainer."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None, None),  # q
            P(MODEL_AXIS, None),  # table
            P(MODEL_AXIS),  # bias
            P(DATA_AXIS, None),  # targets
            P(DATA_AXIS, None),  # mask
        ),
        out_specs=P(),
        check_rep=False,
    )
    def _loss(q, table, bias, targets, mask):
        return _sharded_ce_local(q, table, bias, targets, mask)

    def loss(q, table, bias, targets, mask, rng=None):
        return _loss(q, table, bias, targets, mask)

    return loss
