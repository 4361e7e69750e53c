"""Dev-only micro-profile: split the bench workload's train-step time into
tower (queries), loss forward, and full fwd+bwd+update, to locate the next
optimization lever. Not part of the driver contract."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    from poi_tpu.configs.presets import get_config
    from poi_tpu.data.dataset import load_dataset
    from poi_tpu.data.pipeline import TrainLoader
    from poi_tpu.models import base as model_base
    from poi_tpu.train.loop import Trainer

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = get_config("smoke").with_overrides(
        {
            "data.num_users": "4000",
            "data.num_pois": "50000",
            "data.mean_checkins_per_user": "60",
            "data.max_seq_len": "64",
            "data.min_user_checkins": "8",
            "model.kind": "gru",
            "model.embed_dim": "128",
            "model.hidden_dim": "128",
            "loss.kind": "ce",
            "train.warmup_steps": "0",
            "train.batch_size": str(batch_size),
            "model.compute_dtype": "bfloat16",
        }
    )
    ds = load_dataset(cfg.data)
    trainer = Trainer(cfg, model_base.DataDims.from_dataset(ds))
    state = trainer.init_state()
    loader = TrainLoader(ds.train, batch_size=cfg.train.batch_size, seed=0)
    batch = next(loader)
    loader.close()
    dbatch = trainer._put_batch(batch)
    model, loss_fn = trainer.model, trainer.loss_fn

    @jax.jit
    def queries_only(params, batch):
        return model.queries(params, batch)

    @jax.jit
    def loss_fwd(params, batch, rng):
        q = model.queries(params, batch)
        table, bias = model_base.output_table(params, cfg.model)
        return loss_fn(q, table, bias, batch.poi_tgt, batch.mask, rng)

    rng = jax.random.key(0)
    t_q = timed(queries_only, state.params, dbatch)
    t_f = timed(loss_fwd, state.params, dbatch, rng)

    def full(state, batch):
        return trainer.step(state, batch)

    # warm
    for _ in range(3):
        state, m = trainer.step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = trainer.step(state, batch)
    jax.block_until_ready(m["loss"])
    t_full = (time.perf_counter() - t0) / 20

    B, T = batch.poi_in.shape
    V, D = trainer.dims.num_pois_padded, cfg.model.embed_dim
    ce_flops = 2 * B * T * D * V  # fwd logits matmul
    print(f"batch={B} T={T} V={V} D={D}")
    print(f"tower(queries) fwd : {t_q*1e3:8.2f} ms")
    print(f"tower+loss fwd     : {t_f*1e3:8.2f} ms  (loss share {100*(t_f-t_q)/t_f:.0f}%)")
    print(f"full step          : {t_full*1e3:8.2f} ms  ({B/t_full:,.0f} seq/s)")
    print(f"CE fwd matmul FLOPs: {ce_flops/1e9:.1f} GF -> fwd-only {ce_flops/t_f/1e12:.1f} TF/s eff")
    print(f"step total ~3x CE  : {3*ce_flops/t_full/1e12:.1f} TF/s eff (v5e bf16 peak ~197)")


if __name__ == "__main__":
    sys.exit(main())
