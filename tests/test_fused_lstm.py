"""Pallas fused LSTM recurrence vs the lax.scan oracle (interpreter mode on
CPU — covers the TPU kernel code path, including the mask-select contract)."""

import jax
import jax.numpy as jnp
import numpy as np

from poi_tpu.models.lstm import init_lstm_layer, lstm_layer
from poi_tpu.ops.fused_lstm import fused_lstm_scan


def _setup(B=8, T=12, D=16, H=16, seed=0):
    p = init_lstm_layer(jax.random.key(seed), D, H)
    x = jax.random.normal(jax.random.key(seed + 1), (B, T, D), jnp.float32) * 0.5
    lengths = jax.random.randint(jax.random.key(seed + 2), (B, 1), 3, T + 1)
    mask = jnp.cumsum(jnp.ones((B, T)), axis=1) <= lengths
    return p, x, mask


def _inputs(p, x, mask, H):
    xw = jnp.dot(x, p["wx"], preferred_element_type=jnp.float32) + p["b"]
    B, T = x.shape[:2]
    m_bh = jnp.broadcast_to(mask[:, :, None].astype(jnp.float32), (B, T, H))
    return xw, m_bh


def test_fused_lstm_forward_matches_scan():
    p, x, mask = _setup()
    H = p["wh"].shape[0]
    hs_scan = lstm_layer(p, x, mask, jnp.float32, cell_impl="scan")
    xw, m_bh = _inputs(p, x, mask, H)
    hs_pal = fused_lstm_scan(xw, m_bh, p["wh"], True)
    # Compare at valid positions (masked positions emit the carry, the scan
    # path emits the unmasked step output — both are ignored downstream).
    m = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(hs_scan) * m, np.asarray(hs_pal) * m, atol=2e-2, rtol=2e-2
    )


def test_fused_lstm_grads_match_scan():
    p, x, mask = _setup(seed=7)
    H = p["wh"].shape[0]

    def loss_scan(p, x):
        hs = lstm_layer(p, x, mask, jnp.float32, cell_impl="scan")
        return jnp.sum(hs * mask[:, :, None] * 0.1)

    def loss_pal(p, x):
        xw, m_bh = _inputs(p, x, mask, H)
        hs = fused_lstm_scan(xw, m_bh, p["wh"], True)
        return jnp.sum(hs * mask[:, :, None] * 0.1)

    gs = jax.grad(loss_scan, argnums=(0, 1))(p, x)
    gp = jax.grad(loss_pal, argnums=(0, 1))(p, x)
    for a, b, name in (
        (gs[0]["wx"], gp[0]["wx"], "dwx"),
        (gs[0]["wh"], gp[0]["wh"], "dwh"),
        (gs[0]["b"], gp[0]["b"], "db"),
        (gs[1], gp[1], "dx"),
    ):
        scale = np.abs(np.asarray(a)).max() + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-2, err_msg=name
        )


def test_fused_lstm_padded_steps_carry_through():
    """A fully-masked tail must leave h unchanged (carry pass-through)."""
    p, x, _ = _setup(seed=3)
    H = p["wh"].shape[0]
    B, T = x.shape[:2]
    mask = jnp.concatenate(
        [jnp.ones((B, T // 2), bool), jnp.zeros((B, T - T // 2), bool)], axis=1
    )
    xw, m_bh = _inputs(p, x, mask, H)
    hs = fused_lstm_scan(xw, m_bh, p["wh"], True)
    tail = np.asarray(hs)[:, T // 2:]
    np.testing.assert_array_equal(tail, np.broadcast_to(tail[:, :1], tail.shape))


def test_fused_lstm_unrolled_path_matches():
    """T % _UNROLL == 0 exercises the unrolled grid path; compare vs T=12
    (u=1 fallback) semantics by running both against the scan oracle."""
    p, x, mask = _setup(T=16, seed=5)
    H = p["wh"].shape[0]
    hs_scan = lstm_layer(p, x, mask, jnp.float32, cell_impl="scan")
    xw, m_bh = _inputs(p, x, mask, H)
    hs_pal = fused_lstm_scan(xw, m_bh, p["wh"], True)
    m = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(hs_scan) * m, np.asarray(hs_pal) * m, atol=2e-2, rtol=2e-2
    )
