"""Fused top-k kernel tests: interpret-mode Pallas vs the XLA oracle vs
NumPy, plus the vocab-sharded merge path (SURVEY.md §2.2 T9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poi_tpu.ops.topk import fused_topk, make_sharded_topk, pad_table_for_topk, xla_topk
from poi_tpu.parallel.mesh import make_mesh


def _case(B, D, V, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(V,)), jnp.float32)
    return q, table, bias


def test_xla_topk_matches_numpy():
    q, table, bias = _case(4, 16, 100)
    vals, ids = xla_topk(q, table, bias, 5)
    scores = (np.asarray(q).astype(np.float32) @ np.asarray(table).astype(np.float32).T) + np.asarray(bias)
    want = np.argsort(-scores, axis=1)[:, :5]
    # bf16 matmul can flip near-ties; compare score values instead of ids
    got_scores = np.take_along_axis(scores, np.asarray(ids), axis=1)
    want_scores = np.take_along_axis(scores, want, axis=1)
    np.testing.assert_allclose(got_scores, want_scores, rtol=2e-2)


@pytest.mark.parametrize("shape", [(8, 16, 512, 5), (16, 32, 1024, 10), (8, 16, 1536, 16)])
def test_fused_topk_matches_oracle_interpret(shape):
    B, D, V, k = shape
    q, table, bias = _case(B, D, V, seed=B)
    vals_p, ids_p = fused_topk(q, table, bias, k, tile_v=512, interpret=True)
    vals_x, ids_x = xla_topk(q, table, bias, k)
    assert np.array_equal(np.asarray(ids_p), np.asarray(ids_x))
    np.testing.assert_allclose(np.asarray(vals_p), np.asarray(vals_x), atol=1e-3, rtol=1e-3)


def test_fused_topk_with_duplicate_scores_interpret():
    """Ties must resolve first-occurrence, matching lax.top_k."""
    B, D, V, k = 4, 8, 512, 6
    q = jnp.ones((B, D), jnp.float32)
    table = jnp.zeros((V, D), jnp.float32)  # all scores identical
    bias = jnp.zeros((V,), jnp.float32)
    _, ids = fused_topk(q, table, bias, k, tile_v=512, interpret=True)
    assert np.array_equal(np.asarray(ids), np.tile(np.arange(k), (B, 1)))


def test_fused_topk_rejects_ragged_vocab():
    q, table, bias = _case(4, 16, 1000)
    with pytest.raises(ValueError, match="multiple of tile_v"):
        fused_topk(q, table, bias, 5, tile_v=512, interpret=True)


def test_pad_table_for_topk():
    q, table, bias = _case(4, 16, 1000)
    tp, bp = pad_table_for_topk(table, bias, 512)
    assert tp.shape[0] == 1024 and bp.shape[0] == 1024
    assert float(bp[1000]) < -1e29
    # padded result equals unpadded oracle
    vals_p, ids_p = fused_topk(q, tp, bp, 5, tile_v=512, interpret=True)
    vals_x, ids_x = xla_topk(q, table, bias, 5)
    assert np.array_equal(np.asarray(ids_p), np.asarray(ids_x))


def test_sharded_topk_matches_dense(eight_devices):
    mesh = make_mesh(data=4, model=2)
    q, table, bias = _case(8, 16, 256, seed=3)
    vals_s, ids_s = make_sharded_topk(mesh, k=10)(q, table, bias)
    vals_x, ids_x = xla_topk(q, table, bias, 10)
    assert np.array_equal(np.asarray(ids_s), np.asarray(ids_x))
    np.testing.assert_allclose(np.asarray(vals_s), np.asarray(vals_x), atol=1e-4)


def test_evaluate_pallas_impl_matches_xla(eight_devices):
    """End-to-end evaluate() with the (interpret-mode) kernel path vs oracle."""
    from poi_tpu.configs.presets import get_config
    from poi_tpu.data.dataset import load_dataset
    from poi_tpu.eval.evaluate import evaluate
    from poi_tpu.models.base import DataDims, build_model

    cfg = get_config("smoke")
    ds = load_dataset(cfg.data)
    model = build_model(cfg.model, DataDims.from_dataset(ds))
    params = model.init(jax.random.key(0))

    m_xla = evaluate(model, params, ds, cfg.with_overrides({"eval.topk_impl": "xla"}))
    import poi_tpu.eval.evaluate as eval_mod
    import functools

    orig = eval_mod.fused_topk
    eval_mod.fused_topk = functools.partial(orig, interpret=True)
    try:
        m_pal = evaluate(model, params, ds, cfg.with_overrides({"eval.topk_impl": "pallas"}))
    finally:
        eval_mod.fused_topk = orig
    for key in m_xla:
        assert abs(m_xla[key] - m_pal[key]) < 1e-6, (key, m_xla, m_pal)
