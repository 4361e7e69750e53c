"""Config-#5 scale on ONE chip: 1M-POI catalog, 512-d tables (BASELINE.json:11).

Measures (VERDICT r1 item 4 — the single-chip point of the multi-host config):
  1. sampled-softmax training throughput (seq/s) at V=1M, D=512, B=512,
     attention tower, device-sampled batches, K-step dispatch;
  2. fused top-k QPS over the tile-padded 1M catalog (slope-of-mins timing —
     in-graph chained iterations at two lengths cancel the fixed ~25 ms
     tunnel round-trip, see BASELINE.md timing notes);
  3. HBM high-water mark (device memory_stats when the backend exposes it).

    python scripts/bench_1m.py
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def topk_qps(v=1_000_000, d=512, b=512, k=10, tile_v=2048) -> dict:
    """Fused top-k queries/s at catalog scale, vs the XLA dense+lax.top_k
    oracle on the same operands; returns {fused_qps, fused_ms, oracle_ms}."""
    from poi_tpu.ops.topk import fused_topk, pad_table_for_topk
    from poi_tpu.train.losses import full_logits

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(v, d)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(v,)), jnp.float32)
    table, bias = pad_table_for_topk(table, bias, tile_v)
    q = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)

    def make_chain(impl):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(q, table, bias, n):
            def body(i, acc):
                # acc feeds back into q: data dependence defeats loop hoisting.
                qi = q + (acc * 1e-30).astype(q.dtype)
                if impl == "pallas":
                    vals, _ = fused_topk(qi, table, bias, k, tile_v=tile_v)
                else:
                    vals, _ = jax.lax.top_k(full_logits(qi, table, bias), k)
                return jnp.sum(vals)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return chain

    def per_batch_ms(chain, n_lo=3, n_hi=13, trials=4):
        def timed(n):
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                float(chain(q, table, bias, n))  # device->host fence
                best = min(best, time.perf_counter() - t0)
            return best

        float(chain(q, table, bias, 2))  # compile + warm
        return (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo) * 1e3

    fused_ms = per_batch_ms(make_chain("pallas"))
    oracle_ms = per_batch_ms(make_chain("xla"), n_lo=2, n_hi=6)
    return {
        "fused_qps": b / (fused_ms / 1e3),
        "fused_ms": fused_ms,
        "oracle_ms": oracle_ms,
    }


def train_seqs_per_sec(table_update: str | None = None) -> tuple[float, dict]:
    """Config #5 training on one chip (mesh model=1), device-sampled batches.
    ``table_update`` overrides the preset's optimizer strategy (dense|sparse)
    for A/B measurement; None keeps the preset (sparse since r5)."""
    import bench  # repo-root bench.py: reuse the honest-fence throughput timer
    from poi_tpu.configs.presets import get_config
    from poi_tpu.data.dataset import load_dataset

    import os

    over = {
        "mesh.model": "1",
        "mesh.embedding_mode": "psum",
        "data.num_users": "20000",  # enough active users for realistic ids
        "data.mean_checkins_per_user": "50",
        "train.steps_per_call": "10",
        "data.sampler": "device",
        "train.warmup_steps": "0",
    }
    if table_update is not None:
        over["train.table_update"] = table_update
    if os.environ.get("BENCH_1M_BATCH"):
        over["train.batch_size"] = os.environ["BENCH_1M_BATCH"]
    cfg = get_config("multihost_1m").with_overrides(over)
    print("synthesizing 1M-POI dataset...", file=sys.stderr, flush=True)
    ds = load_dataset(cfg.data)
    print(
        f"dataset: {ds.num_users} users {ds.num_pois} pois {len(ds.train)} train examples",
        file=sys.stderr, flush=True,
    )
    # The iterative sparse-POI filter compacts the visited catalog to its head
    # (~10k of 1M synthetic POIs survive min_poi_checkins at this check-in
    # volume), so ``DataDims.from_dataset`` alone would measure a toy table.
    # Force the parameter-shape catalog to the full 1M rows: every cost that
    # scales with V — the 1M x 512 tables, the sampled-softmax negative space,
    # and the dense-grad optimizer update over all rows — is then measured at
    # contract scale (BASELINE.json:11) while the batch ids stay realistic.
    import dataclasses

    from poi_tpu.models.base import DataDims

    dims = dataclasses.replace(
        DataDims.from_dataset(ds), num_pois=1_000_000, num_pois_padded=0
    )
    print(f"model dims: V={dims.num_pois} D=512", file=sys.stderr, flush=True)
    sps = bench._throughput(cfg, ds, steps=30, warmup=10, repeats=3, dims=dims)
    stats = {}
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        stats = {kk: ms[kk] for kk in ("bytes_in_use", "peak_bytes_in_use") if kk in ms}
    except Exception:
        pass
    return sps, stats


def main() -> int:
    # args: [table_update] — "dense" / "sparse" (default: preset = sparse),
    #       or "both" for the A/B; "--skip-topk" skips the QPS section.
    args = [a for a in sys.argv[1:]]
    if "--skip-topk" not in args:
        r = topk_qps()
        print(
            f"fused top-k @ V=1M D=512 B=512 k=10: {r['fused_qps']:,.0f} qps "
            f"({r['fused_ms']:.2f} ms/batch; XLA dense+top_k oracle {r['oracle_ms']:.2f} ms "
            f"-> {r['oracle_ms'] / r['fused_ms']:.1f}x)"
        )
    modes = [a for a in args if a in ("dense", "sparse", "both")]
    mode = modes[0] if modes else None
    for tu in ("dense", "sparse") if mode == "both" else [mode]:
        sps, stats = train_seqs_per_sec(tu)
        print(f"config#5 1-chip sampled-softmax training ({tu or 'preset'}): {sps:,.1f} seq/s")
    if stats:
        print(f"HBM: {', '.join(f'{k}={v/2**30:.2f} GiB' for k, v in stats.items())}")
    else:
        print("HBM: memory_stats not exposed by this backend")
    return 0


if __name__ == "__main__":
    sys.exit(main())
