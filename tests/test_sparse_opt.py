"""Touched-rows-only lazy Adam for embedding tables (train/sparse_opt.py).

Three properties carry the design (VERDICT r4 Next #1):
1. When every row is touched every step, the sparse update IS dense
   optax.chain(clip_by_global_norm, adam) — exact parity.
2. Rows outside the a-priori touched set (inputs ∪ targets ∪ negatives)
   have exactly zero dense gradient — the set is a sound superset, so the
   lazy update never drops gradient signal.
3. End-to-end training with table_update=sparse learns (loss decreases),
   single-device and on the sharded mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from poi_tpu.configs.presets import get_config
from poi_tpu.data.dataset import load_dataset
from poi_tpu.models.base import DataDims
from poi_tpu.train.loop import Trainer, train
from poi_tpu.train.sparse_opt import (
    SparseTableOptimizer,
    dedup_ids,
    touched_ids,
    validate_config,
)


def _sparse_cfg(**over):
    base = {
        "loss.kind": "sampled_softmax",
        "loss.num_sampled": "64",
        "train.table_update": "sparse",
        "train.num_steps": "60",
        "train.log_every": "10",
        "model.use_user_embedding": "true",
    }
    base.update(over)
    return get_config("smoke").with_overrides(base)


def test_dedup_ids():
    ids = jnp.array([3, 1, 3, 7, 1, 1], jnp.int32)
    u = np.asarray(dedup_ids(ids, 100))
    kept = [x for x in u if x < 100]
    assert kept == [1, 3, 7]  # compacted, ascending
    assert (u >= 100).sum() == 3 and len(set(u.tolist())) == len(u)  # distinct OOB tail
    assert (np.diff(u) > 0).all()  # strictly sorted throughout


@pytest.mark.parametrize("threshold", [None, 0])
def test_all_rows_touched_matches_dense_adam(threshold, monkeypatch):
    """With ids covering every row, lazy == optax.chain(clip, adam) exactly —
    on BOTH table paths: masked-dense (default at this size) and
    gather/scatter (forced via threshold 0)."""
    from poi_tpu.train import sparse_opt as so

    if threshold is not None:
        monkeypatch.setattr(so, "DENSE_LAZY_MAX_BYTES", threshold)
    cfg = _sparse_cfg()
    V, D = 12, 4
    rng = np.random.default_rng(0)

    def mk():
        return {
            "embed": {
                "poi": jnp.asarray(rng.normal(size=(V, D)), jnp.float32),
                "out_bias": jnp.asarray(rng.normal(size=(V,)), jnp.float32),
                "user": jnp.asarray(rng.normal(size=(5, D)), jnp.float32),
            },
            "tower": {"w": jnp.asarray(rng.normal(size=(D, D)), jnp.float32)},
        }

    params = mk()
    sparse = SparseTableOptimizer(cfg)
    st_s = sparse.init(params)
    dense = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip_norm),
        optax.adam(
            __import__("poi_tpu.train.state", fromlist=["lr_schedule"]).lr_schedule(cfg.train)
        ),
    )
    st_d = dense.init(params)
    p_s, p_d = params, params
    # Every row touched, with duplicates, unsorted.
    ids = {
        "poi": jnp.asarray(np.concatenate([np.arange(V), rng.integers(0, V, 7)]), jnp.int32),
        "user": jnp.asarray(np.concatenate([np.arange(5), [2, 2]]), jnp.int32),
    }
    for step in range(4):
        grads = jax.tree.map(lambda x: jnp.asarray(rng.normal(size=x.shape), x.dtype), params)
        p_s, st_s, gnorm = jax.jit(sparse.update_apply)(grads, st_s, p_s, ids)
        upd, st_d = dense.update(grads, st_d, p_d)
        p_d = optax.apply_updates(p_d, upd)
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-7)


@pytest.mark.parametrize("loss_kind", ["sampled_softmax", "bpr"])
def test_untouched_rows_have_zero_grad(loss_kind):
    """The a-priori touched set is a superset of the rows with gradient."""
    from poi_tpu.data.pipeline import TrainLoader
    from poi_tpu.models import base as model_base

    cfg = _sparse_cfg(**{"loss.kind": loss_kind, "loss.num_negatives": "4"})
    ds = load_dataset(cfg.data)
    trainer = Trainer(cfg, DataDims.from_dataset(ds))
    state = trainer.init_state()
    loader = TrainLoader(ds.train, batch_size=cfg.train.batch_size, seed=0)
    batch = trainer._put_batch(next(loader))
    loader.close()
    rng = jax.random.fold_in(state.rng, state.step)

    def compute_loss(params):
        q = trainer.model.queries(params, batch, rng=None)
        table, bias = model_base.output_table(params, cfg.model)
        return trainer.loss_fn(q, table, bias, batch.poi_tgt, batch.mask, rng)

    grads = jax.grad(compute_loss)(state.params)
    ids = touched_ids(cfg, batch, rng, trainer.dims.num_pois)
    for key, id_key in (("poi", "poi"), ("out_bias", "poi"), ("user", "user")):
        g = np.asarray(grads["embed"][key])
        touched = np.zeros(g.shape[0], bool)
        touched[np.asarray(ids[id_key])] = True
        untouched_norm = np.abs(g[~touched]).max() if (~touched).any() else 0.0
        assert untouched_norm == 0.0, f"{key}: grad leaked outside touched rows"
        # ...and the touched set is not trivially everything.
        assert (~touched).any(), f"{key}: test vacuous, all rows touched"


@pytest.mark.slow
def test_rows_mode_matches_dense_grad_path(monkeypatch):
    """Stage B (rows gradients — the dense [V, D] cotangent never exists)
    must produce the same update as the dense-grad sparse path: same touched
    set, same per-unique-row summed gradients, same lazy Adam. Forces rows
    mode at smoke scale by zeroing the masked-dense threshold."""
    from poi_tpu.data.pipeline import TrainLoader
    from poi_tpu.models import base as model_base
    from poi_tpu.train import sparse_opt as so

    monkeypatch.setattr(so, "DENSE_LAZY_MAX_BYTES", 0)
    cfg = _sparse_cfg()  # sampled_softmax + tied table + model axis 1 → rows mode
    ds = load_dataset(cfg.data)
    trainer = Trainer(cfg, DataDims.from_dataset(ds))
    state = trainer.init_state()
    loader = TrainLoader(ds.train, batch_size=cfg.train.batch_size, seed=0)
    batch = trainer._put_batch(next(loader))
    loader.close()

    step_fn, _ = trainer._step_core()
    new_state, metrics = jax.jit(step_fn)(state, batch)  # rows-mode step

    # Reference: dense autodiff grads + the dense-gather sparse update.
    rng = jax.random.fold_in(state.rng, state.step)

    def compute_loss(params):
        q = trainer.model.queries(params, batch, rng=None)
        table, bias = model_base.output_table(params, cfg.model)
        return trainer.loss_fn(q, table, bias, batch.poi_tgt, batch.mask, rng)

    loss_ref, grads = jax.value_and_grad(compute_loss)(state.params)
    ids = touched_ids(cfg, batch, rng, trainer.dims.num_pois)
    p_ref, _, gn_ref = trainer.optimizer.update_apply(
        grads, state.opt_state, state.params, ids
    )
    assert abs(float(metrics["loss"]) - float(loss_ref)) < 1e-5
    assert abs(float(metrics["grad_norm"]) - float(gn_ref)) < 1e-4 * max(1.0, float(gn_ref))
    for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=2e-5)


def test_sparse_training_learns():
    cfg = _sparse_cfg()
    ds = load_dataset(cfg.data)
    _, state, hist = train(cfg, ds)
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert np.isfinite(hist[-1]["loss"])
    assert int(state.opt_state.count) == cfg.train.num_steps


@pytest.mark.parametrize("threshold", [None, 0])
def test_sparse_training_sharded_mesh(threshold, monkeypatch):
    """Sparse update over a (data=4, model=2) mesh: runs, learns, moments
    shard like their tables — on BOTH the masked-dense path (default at
    smoke size) and the gather/scatter path (threshold forced to 0, the
    shape class config #5 ships with: scatters into model-sharded tables
    under GSPMD)."""
    if threshold is not None:
        from poi_tpu.train import sparse_opt as so

        monkeypatch.setattr(so, "DENSE_LAZY_MAX_BYTES", threshold)
    cfg = _sparse_cfg(**{"mesh.data": "4", "mesh.model": "2", "train.num_steps": "30"})
    ds = load_dataset(cfg.data)
    trainer, state, hist = train(cfg, ds)
    assert hist[-1]["loss"] < hist[0]["loss"]
    m_poi = state.opt_state.m["embed"]["poi"]
    assert m_poi.shape == state.params["embed"]["poi"].shape


def test_masked_and_scatter_paths_agree(monkeypatch):
    """Partially-touched tables: the masked-dense and gather/scatter lazy-Adam
    paths must produce identical params/moments."""
    from poi_tpu.train import sparse_opt as so

    cfg = _sparse_cfg()
    V, D = 64, 8
    rng = np.random.default_rng(3)
    params = {
        "embed": {
            "poi": jnp.asarray(rng.normal(size=(V, D)), jnp.float32),
            "out_bias": jnp.asarray(rng.normal(size=(V,)), jnp.float32),
        },
        "tower": {"w": jnp.asarray(rng.normal(size=(D, D)), jnp.float32)},
    }
    grads = jax.tree.map(lambda x: jnp.asarray(rng.normal(size=x.shape), x.dtype), params)
    touched = np.sort(rng.choice(V, 17, replace=False))
    g_poi = np.array(grads["embed"]["poi"]); g_b = np.array(grads["embed"]["out_bias"])
    keep = np.zeros(V, bool); keep[touched] = True
    g_poi[~keep] = 0.0; g_b[~keep] = 0.0  # honest lazy setting: untouched rows have zero grad
    grads["embed"]["poi"] = jnp.asarray(g_poi)
    grads["embed"]["out_bias"] = jnp.asarray(g_b)
    ids = {"poi": jnp.asarray(np.concatenate([touched, touched[:5]]), jnp.int32)}

    opt = SparseTableOptimizer(cfg)
    outs = []
    for th in (10**9, 0):
        monkeypatch.setattr(so, "DENSE_LAZY_MAX_BYTES", th)
        st = opt.init(params)
        p1, st1, gn = opt.update_apply(grads, st, params, ids)
        p1, st1, _ = opt.update_apply(grads, st1, p1, ids)  # two steps (moment state)
        outs.append((p1, st1.m, st1.v, gn))
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_sparse_validate_config():
    with pytest.raises(ValueError, match="sampled objective"):
        validate_config(_sparse_cfg(**{"loss.kind": "ce"}))
    with pytest.raises(ValueError, match="adam"):
        validate_config(_sparse_cfg(**{"train.optimizer": "sgd"}))
