"""Eval/serving query-path cost: full-T queries+select vs queries_last.

VERDICT r4 Weak #1: the old eval path ran attention + output projection +
user-add for all T positions and kept one. ``queries_last`` computes them at
the final valid position only. This measures both formulations of the
[B, D] last-query computation (chained in-graph + device→host fence,
slope-of-mins style n-differencing) at config-#4 and config-#5 shapes.

    python scripts/bench_eval_path.py
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def bench(cfg_name, overrides, batch_size):
    import dataclasses

    from poi_tpu.configs.presets import get_config
    from poi_tpu.data.dataset import load_dataset
    from poi_tpu.data.pipeline import eval_batches
    from poi_tpu.models import base as model_base

    cfg = get_config(cfg_name).with_overrides(overrides)
    ds = load_dataset(cfg.data)
    dims = model_base.DataDims.from_dataset(ds)
    if cfg_name == "multihost_1m":
        dims = dataclasses.replace(dims, num_pois=1_000_000, num_pois_padded=0)
    model = model_base.build_model(cfg.model, dims)
    params = jax.jit(model.init)(jax.random.key(0))
    batch, _, _ = next(iter(eval_batches(ds.test, batch_size)))
    batch = jax.device_put(batch)

    def old_path(p, b):  # what eval did before r5
        q = model.queries(p, b)
        last = jnp.maximum(jnp.sum(b.mask.astype(jnp.int32), axis=1) - 1, 0)
        return jnp.take_along_axis(q, last[:, None, None], axis=1)[:, 0]

    def new_path(p, b):
        return model.queries_last(p, b)

    def timed(fn, n=40, trials=4):
        @jax.jit
        def rep(p, b):
            def body(i, acc):
                pp = jax.tree.map(lambda x: x + (acc * 1e-30).astype(x.dtype), p)
                return acc + jnp.sum(fn(pp, b).astype(jnp.float32)) * 1e-30

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(rep(params, batch))
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(rep(params, batch))
            best = min(best, (time.perf_counter() - t0) / n)
        return best * 1e3

    t_old, t_new = timed(old_path), timed(new_path)
    B, T = batch.poi_in.shape
    print(
        f"{cfg_name:18s} B={B} T={T} D={cfg.model.embed_dim}: "
        f"full-T path {t_old:7.3f} ms -> last-position {t_new:7.3f} ms "
        f"({t_old / max(t_new, 1e-9):.2f}x)",
        flush=True,
    )


def main() -> int:
    bench("attention_gowalla", {"data.val_fraction": "0", "model.dropout": "0"}, 256)
    bench(
        "multihost_1m",
        {"mesh.model": "1", "mesh.embedding_mode": "psum", "data.num_users": "20000"},
        512,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
