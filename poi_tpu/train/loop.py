"""The pjit'd training loop (reference R9 → SURVEY.md §3.2a call stack).

``Trainer`` owns: model, loss, optimizer, mesh, and the compiled train step.
The step is a single jit-compiled function over the global mesh — batch
sharded on 'data', vocab tables sharded on 'model' — so XLA GSPMD inserts the
gradient psum over 'data' and the table collectives over 'model'
automatically; the explicitly-collective embedding/loss paths (shard_map)
plug in through the model's ``lookup`` and the loss builder.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from poi_tpu.data.dataset import Dataset
from poi_tpu.data.pipeline import Batch, make_train_loader
from poi_tpu.models import base as model_base
from poi_tpu.parallel import mesh as mesh_lib
from poi_tpu.parallel.shardings import batch_shardings, replicated_shardings, state_shardings
from poi_tpu.train.losses import build_loss_fn
from poi_tpu.train.state import TrainState, init_state, make_optimizer
from poi_tpu.utils.config import Config

log = logging.getLogger(__name__)


class FaultInjected(RuntimeError):
    """Raised by --set train.fault_inject_step=N to exercise resume (SURVEY.md §5)."""


@dataclass
class Trainer:
    cfg: Config
    dims: model_base.DataDims
    mesh: Any = None
    lookup: Callable | None = None  # injected sharded lookup (ops/embedding)
    loss_override: Callable | None = None  # injected sharded loss
    _step_fn: Callable = field(init=False, default=None)

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = mesh_lib.make_mesh(self.cfg.mesh.data, self.cfg.mesh.model)
        n_model = self.mesh.shape[mesh_lib.MODEL_AXIS]
        self.dims = self.dims.padded_to(n_model)
        lookup = self.lookup
        if lookup is None:
            if n_model > 1:
                from poi_tpu.ops.embedding import make_lookup

                lookup = make_lookup(
                    self.mesh, self.cfg.mesh.embedding_mode, self.cfg.mesh.a2a_capacity_factor
                )
            else:
                lookup = model_base.dense_lookup
        self.model = model_base.build_model(self.cfg.model, self.dims, lookup)
        if (
            self.cfg.model.kind == "attention"
            and self.cfg.model.attn_impl in ("ring", "ulysses")
            and n_model > 1
        ):
            from poi_tpu.parallel.sp_attention import make_sp_attention

            self.model.sp_mha = make_sp_attention(
                self.mesh,
                self.cfg.model.attn_heads,
                self.cfg.model.attn_window,
                self.cfg.model.attn_impl,
                self.cfg.model.attn_block_size,
            )
        loss_fn = self.loss_override
        if loss_fn is None:
            if n_model > 1:
                from poi_tpu.ops import sharded_loss

                kind = self.cfg.loss.kind
                if kind == "ce":
                    loss_fn = sharded_loss.make_sharded_ce(self.mesh)
                elif kind == "bpr":
                    loss_fn = sharded_loss.make_sharded_bpr(
                        self.mesh, lookup, self.cfg.loss.num_negatives, self.dims.num_pois
                    )
                elif kind == "sampled_softmax":
                    loss_fn = sharded_loss.make_sharded_sampled_softmax(
                        self.mesh, lookup, self.cfg.loss.num_sampled, self.dims.num_pois
                    )
            if loss_fn is None:
                loss_fn = build_loss_fn(self.cfg.loss, self.dims.num_pois)
        self.loss_fn = loss_fn
        self.optimizer = make_optimizer(self.cfg.train)

    # ------------------------------------------------------------------ init
    def init_state(self, seed: int | None = None) -> TrainState:
        """Params are born sharded: init is jit'd with out_shardings so large
        tables never materialize unsharded on one host (SURVEY.md §3.2c)."""
        seed = self.cfg.train.seed if seed is None else seed
        rng = jax.random.key(seed)

        def _init(rng):
            k_param, k_state = jax.random.split(rng)
            params = self.model.init(k_param)
            return init_state(k_state, params, self.optimizer)

        shapes = jax.eval_shape(_init, rng)
        shardings = state_shardings(shapes, self.mesh, self.dims.num_pois_padded)
        return jax.jit(_init, out_shardings=shardings)(rng)

    # ------------------------------------------------------------------ step
    def _build_step(self, example_batch: Batch):
        model, loss_fn, optimizer = self.model, self.loss_fn, self.optimizer
        cfg = self.cfg
        n_model = self.mesh.shape[mesh_lib.MODEL_AXIS]
        a2a_shards = n_model if (cfg.mesh.embedding_mode == "a2a" and n_model > 1) else 1

        def step_fn(state: TrainState, batch: Batch):
            rng = jax.random.fold_in(state.rng, state.step)

            def compute_loss(params):
                q = model.queries(params, batch)
                table, bias = model_base.output_table(params, cfg.model)
                return loss_fn(q, table, bias, batch.poi_tgt, batch.mask, rng)

            loss, grads = jax.value_and_grad(compute_loss)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = {
                "loss": loss,
                "grad_norm": optax.global_norm(grads),
                "param_norm": optax.global_norm(params),
            }
            if a2a_shards > 1:
                # MoE-style capacity guard (SURVEY.md §7 "ragged all-to-all"):
                # fraction of ids that would overflow the fixed a2a buckets.
                from poi_tpu.ops.embedding import lookup_overflow_fraction

                metrics["a2a_overflow"] = lookup_overflow_fraction(
                    batch.poi_in,
                    a2a_shards,
                    self.dims.num_pois_padded // a2a_shards,
                    cfg.mesh.a2a_capacity_factor,
                )
            new_state = TrainState(state.step + 1, params, opt_state, state.rng)
            return new_state, metrics

        # Shardings: derive from an abstract state + the example batch.
        abstract_state = jax.eval_shape(self.init_state)
        st_shard = state_shardings(abstract_state, self.mesh, self.dims.num_pois_padded)
        b_shard = batch_shardings(example_batch, self.mesh)
        metric_keys = {"loss": 0.0, "grad_norm": 0.0, "param_norm": 0.0}
        if a2a_shards > 1:
            metric_keys["a2a_overflow"] = 0.0
        m_shard = replicated_shardings(metric_keys, self.mesh)
        return jax.jit(
            step_fn,
            in_shardings=(st_shard, b_shard),
            out_shardings=(st_shard, m_shard),
            donate_argnums=(0,),
        )

    def _put_batch(self, batch: Batch):
        shardings = batch_shardings(batch, self.mesh)
        if jax.process_count() == 1:
            return jax.device_put(batch, shardings)
        # Multi-host: each process holds a disjoint slice of the global batch
        # (loader host sharding); assemble the global array from local data.
        return jax.tree.map(
            lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
            batch,
            shardings,
        )

    def step(self, state: TrainState, batch: Batch):
        if self._step_fn is None:
            self._step_fn = self._build_step(batch)
        return self._step_fn(state, self._put_batch(batch))


def train(
    cfg: Config,
    dataset: Dataset,
    num_steps: int | None = None,
    state: TrainState | None = None,
    trainer: Trainer | None = None,
    callbacks: list[Callable] | None = None,
) -> tuple[Trainer, TrainState, list[dict]]:
    """Run the training loop; returns (trainer, final state, metric history)."""
    num_steps = num_steps if num_steps is not None else cfg.train.num_steps
    dims = model_base.DataDims.from_dataset(dataset)
    trainer = trainer or Trainer(cfg, dims)
    if state is None:
        state = trainer.init_state()
    start_step = int(state.step)

    loader = make_train_loader(
        dataset.train,
        batch_size=mesh_lib.local_data_batch(cfg.train.batch_size, trainer.mesh),
        seed=cfg.train.seed,
        host_id=jax.process_index(),
        num_hosts=jax.process_count(),
        backend=cfg.data.loader_backend,
    )
    if start_step:
        # Resume: deterministic fast-forward so step N always sees batch N.
        loader.seek(start_step)
    history: list[dict] = []
    t0 = time.perf_counter()
    seqs = 0
    try:
        for i in range(start_step, start_step + num_steps):
            if cfg.train.fault_inject_step == i:
                raise FaultInjected(f"fault injected at step {i}")
            batch = next(loader)
            state, metrics = trainer.step(state, batch)
            seqs += cfg.train.batch_size
            if (i + 1) % cfg.train.log_every == 0 or i + 1 == start_step + num_steps:
                dt = time.perf_counter() - t0
                row = {k: float(v) for k, v in metrics.items()}
                row.update(step=i + 1, seqs_per_sec=seqs / max(dt, 1e-9))
                history.append(row)
                log.info(
                    "step %d loss %.4f grad %.3f %.1f seq/s",
                    row["step"], row["loss"], row["grad_norm"], row["seqs_per_sec"],
                )
                t0, seqs = time.perf_counter(), 0
            for cb in callbacks or []:
                cb(i + 1, state, metrics)
    finally:
        loader.close()
    return trainer, state, history
