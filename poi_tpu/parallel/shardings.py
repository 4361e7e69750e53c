"""Sharding rules for state / batch pytrees.

Rule (SURVEY.md §2.2 T2): any array with a catalog-sized leading axis — the
POI table, an untied output table, the output bias, and their optimizer
moments — is row-sharded over the 'model' axis. Everything else (tower
weights, small time/geo/user tables, scalars) is replicated over 'model'.
Batch arrays shard their leading (batch) axis over 'data'.

Matching by leading-dimension == num_pois (rather than by parameter path)
automatically covers optax states, which mirror the param tree structure.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from poi_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def state_shardings(state: Any, mesh: Mesh, num_pois: int) -> Any:
    """NamedSharding pytree for a TrainState (or bare params pytree)."""

    def rule(x):
        if hasattr(x, "shape") and len(x.shape) >= 1 and x.shape[0] == num_pois:
            # Row-sharded vocab table (or its bias / optimizer moments).
            spec = P(MODEL_AXIS, *([None] * (len(x.shape) - 1)))
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, state)


def batch_shardings(batch: Any, mesh: Mesh) -> Any:
    def rule(x):
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (len(x.shape) - 1))))

    return jax.tree.map(rule, batch)


def replicated_shardings(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
