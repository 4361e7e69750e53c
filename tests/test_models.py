"""Model-layer unit tests: each cell vs a NumPy oracle stepped in Python
(SURVEY.md §4 Unit tier — the reference has no tests to port, so parity is
defined against closed-form oracle implementations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poi_tpu.data.pipeline import Batch
from poi_tpu.models import base as mb
from poi_tpu.models.gru import gru_layer, init_gru_layer
from poi_tpu.models.lstm import init_lstm_layer, lstm_layer
from poi_tpu.models.strnn import apply_interpolated, init_strnn_layer
from poi_tpu.utils.config import ModelConfig

DIMS = mb.DataDims(
    num_users=7, num_pois=50, num_time_buckets=12, num_geo_buckets=16,
    num_tgap_buckets=4, num_dist_buckets=4,
)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def rand_batch(rng, B, T, dims=DIMS):
    return Batch(
        user=rng.integers(0, dims.num_users, B).astype(np.int32),
        poi_in=rng.integers(0, dims.num_pois, (B, T)).astype(np.int32),
        poi_tgt=rng.integers(0, dims.num_pois, (B, T)).astype(np.int32),
        mask=np.ones((B, T), np.float32),
        time_bucket=rng.integers(0, dims.num_time_buckets, (B, T)).astype(np.int32),
        geo_bucket=rng.integers(0, dims.num_geo_buckets, (B, T)).astype(np.int32),
        tgap_idx=rng.integers(0, dims.num_tgap_buckets - 1, (B, T)).astype(np.int32),
        tgap_frac=rng.random((B, T)).astype(np.float32),
        dist_idx=rng.integers(0, dims.num_dist_buckets - 1, (B, T)).astype(np.int32),
        dist_frac=rng.random((B, T)).astype(np.float32),
    )


def test_gru_matches_numpy_oracle():
    B, T, D, H = 3, 5, 8, 8
    p = init_gru_layer(jax.random.key(0), D, H)
    x = np.random.default_rng(0).normal(size=(B, T, D)).astype(np.float32)
    out = np.asarray(gru_layer(p, jnp.asarray(x), None, jnp.float32))

    wx, wh, b = np.asarray(p["wx"]), np.asarray(p["wh"]), np.asarray(p["b"])
    h = np.zeros((B, H), np.float32)
    for t in range(T):
        xw = x[:, t] @ wx + b
        hw = h @ wh
        xz, xr, xn = np.split(xw, 3, -1)
        hz, hr, hn = np.split(hw, 3, -1)
        z, r = sigmoid(xz + hz), sigmoid(xr + hr)
        n = np.tanh(xn + r * hn)
        h = (1 - z) * h + z * n
        np.testing.assert_allclose(out[:, t], h, atol=2e-5, rtol=2e-5)


def test_lstm_matches_numpy_oracle():
    B, T, D, H = 2, 4, 6, 6
    p = init_lstm_layer(jax.random.key(1), D, H)
    x = np.random.default_rng(1).normal(size=(B, T, D)).astype(np.float32)
    out = np.asarray(lstm_layer(p, jnp.asarray(x), None, jnp.float32))

    wx, wh, b = np.asarray(p["wx"]), np.asarray(p["wh"]), np.asarray(p["b"])
    h = np.zeros((B, H), np.float32)
    c = np.zeros((B, H), np.float32)
    for t in range(T):
        xw = x[:, t] @ wx + b
        hw = h @ wh
        xi, xf, xg, xo = np.split(xw, 4, -1)
        hi, hf, hg, ho = np.split(hw, 4, -1)
        i, f = sigmoid(xi + hi), sigmoid(xf + hf)
        g, o = np.tanh(xg + hg), sigmoid(xo + ho)
        c = f * c + i * g
        h = o * np.tanh(c)
        np.testing.assert_allclose(out[:, t], h, atol=2e-5, rtol=2e-5)


def test_interpolated_transition_matches_oracle():
    B, T, D, K = 2, 3, 4, 5
    rng = np.random.default_rng(3)
    tables = rng.normal(size=(K + 1, D, D)).astype(np.float32)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    idx = rng.integers(0, K, (B, T)).astype(np.int32)
    frac = rng.random((B, T)).astype(np.float32)
    out = np.asarray(
        apply_interpolated(jnp.asarray(tables), jnp.asarray(x), jnp.asarray(idx), jnp.asarray(frac), jnp.float32)
    )
    for b in range(B):
        for t in range(T):
            m = (1 - frac[b, t]) * tables[idx[b, t]] + frac[b, t] * tables[idx[b, t] + 1]
            np.testing.assert_allclose(out[b, t], x[b, t] @ m.T, atol=1e-4, rtol=1e-4)


def test_masked_scan_freezes_state():
    """Padded steps must carry the hidden state through unchanged."""
    B, T, D, H = 2, 6, 4, 4
    p = init_gru_layer(jax.random.key(2), D, H)
    x = np.random.default_rng(2).normal(size=(B, T, D)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mask[:, 4:] = 0.0
    out_full = np.asarray(gru_layer(p, jnp.asarray(x), jnp.asarray(mask), jnp.float32))
    # State after the mask boundary should equal state at the boundary...
    # outputs at masked steps are don't-care, but the carry must not change:
    # feed garbage in the masked tail and check outputs before the boundary.
    x2 = x.copy()
    x2[:, 4:] = 99.0
    out_garbage = np.asarray(gru_layer(p, jnp.asarray(x2), jnp.asarray(mask), jnp.float32))
    np.testing.assert_allclose(out_full[:, :4], out_garbage[:, :4], atol=1e-6)


@pytest.mark.parametrize("kind", ["gru", "lstm", "strnn", "attention"])
def test_model_queries_shape_and_grad(kind):
    cfg = ModelConfig(
        kind=kind, embed_dim=16, hidden_dim=16, use_user_embedding=(kind == "lstm"),
        attn_window=4, attn_heads=2, compute_dtype="float32",
    )
    model = mb.build_model(cfg, DIMS)
    params = model.init(jax.random.key(0))
    batch = rand_batch(np.random.default_rng(4), B=3, T=6)
    q = model.queries(params, batch)
    assert q.shape == (3, 6, 16)
    assert q.dtype == jnp.float32
    assert np.isfinite(np.asarray(q)).all()

    # Gradients flow to every parameter.
    def loss(p):
        return jnp.sum(model.queries(p, batch) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # POI embedding table must receive gradient.
    g_poi = np.asarray(grads["embed"]["poi"])
    assert np.abs(g_poi).sum() > 0


@pytest.mark.parametrize("kind", ["gru", "lstm", "strnn", "attention"])
def test_queries_last_matches_full_path(kind):
    """The eval/serving fast path (queries_last — attention/projection only
    at the final valid position) must equal the full-T path gathered there,
    including ragged validity-prefix masks (VERDICT r4 Weak #1)."""
    cfg = ModelConfig(
        kind=kind, embed_dim=16, hidden_dim=16, use_user_embedding=True,
        attn_window=4, attn_heads=2, compute_dtype="float32",
    )
    model = mb.build_model(cfg, DIMS)
    params = model.init(jax.random.key(1))
    rng = np.random.default_rng(7)
    batch = rand_batch(rng, B=5, T=9)
    # Ragged prefixes, incl. one full row and one single-checkin row.
    lens = np.array([9, 1, 4, 7, 3])
    mask = (np.arange(9)[None, :] < lens[:, None]).astype(np.float32)
    batch = batch._replace(mask=mask)

    q_full = np.asarray(model.queries(params, batch))  # [B, T, D]
    want = q_full[np.arange(5), lens - 1]
    got = np.asarray(model.queries_last(params, batch))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_queries_last_attention_window_longer_than_prefix():
    """Window reaching before position 0 (short prefixes) must mask, not wrap."""
    cfg = ModelConfig(
        kind="attention", embed_dim=16, hidden_dim=16,
        attn_window=6, attn_heads=2, compute_dtype="float32",
    )
    model = mb.build_model(cfg, DIMS)
    params = model.init(jax.random.key(2))
    batch = rand_batch(np.random.default_rng(8), B=3, T=4)
    lens = np.array([2, 4, 1])
    batch = batch._replace(mask=(np.arange(4)[None, :] < lens[:, None]).astype(np.float32))
    q_full = np.asarray(model.queries(params, batch))
    want = q_full[np.arange(3), lens - 1]
    got = np.asarray(model.queries_last(params, batch))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_attention_model_vanilla_equals_blockwise():
    rng = np.random.default_rng(5)
    batch = rand_batch(rng, B=2, T=12)
    qs = {}
    for impl in ("vanilla", "blockwise"):
        cfg = ModelConfig(
            kind="attention", embed_dim=16, hidden_dim=16, attn_window=5,
            attn_heads=2, attn_impl=impl, attn_block_size=4, compute_dtype="float32",
        )
        model = mb.build_model(cfg, DIMS)
        params = model.init(jax.random.key(3))
        qs[impl] = np.asarray(model.queries(params, batch))
    np.testing.assert_allclose(qs["vanilla"], qs["blockwise"], atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("kind", ["gru", "lstm", "strnn"])
def test_remat_cell_gradients_match(kind):
    """jax.checkpoint on the scan cell must not change values or gradients."""
    import chex

    from poi_tpu.train.losses import build_loss_fn
    from poi_tpu.utils.config import LossConfig

    batch = rand_batch(np.random.default_rng(0), B=4, T=6)
    loss_fn = build_loss_fn(LossConfig(kind="ce"), DIMS.num_pois)
    results = {}
    for remat in (False, True):
        cfg = ModelConfig(kind=kind, embed_dim=8, hidden_dim=8,
                          compute_dtype="float32", remat_cell=remat)
        model = mb.build_model(cfg, DIMS)
        params = model.init(jax.random.key(0))

        def loss(p):
            q = model.queries(p, batch)
            table, bias = mb.output_table(p, cfg)
            return loss_fn(q, table, bias, batch.poi_tgt, batch.mask, jax.random.key(1))

        results[remat] = (loss(params), jax.grad(loss)(params))
    chex.assert_trees_all_close(results[False], results[True], rtol=2e-5, atol=2e-6)
