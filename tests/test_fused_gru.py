"""Pallas fused GRU recurrence vs the lax.scan oracle (interpreter mode on
CPU — covers the TPU kernel code path, including the mask-folding contract)."""

import jax
import jax.numpy as jnp
import numpy as np

from poi_tpu.models.gru import gru_layer, init_gru_layer
from poi_tpu.ops.fused_gru import MASK_NEG, fused_gru_scan


def _setup(B=8, T=12, D=16, H=16, seed=0):
    p = init_gru_layer(jax.random.key(seed), D, H)
    x = jax.random.normal(jax.random.key(seed + 1), (B, T, D), jnp.float32) * 0.5
    lengths = jax.random.randint(jax.random.key(seed + 2), (B, 1), 3, T + 1)
    mask = jnp.cumsum(jnp.ones((B, T)), axis=1) <= lengths
    return p, x, mask


def _xw(p, x, mask, H):
    xw = jnp.dot(x, p["wx"], preferred_element_type=jnp.float32) + p["b"]
    return xw.at[:, :, :H].set(jnp.where(mask[:, :, None], xw[:, :, :H], MASK_NEG))


def test_fused_gru_forward_matches_scan():
    p, x, mask = _setup()
    H = p["wh"].shape[0]
    hs_scan = gru_layer(p, x, mask, jnp.float32, cell_impl="scan")
    hs_pal = fused_gru_scan(_xw(p, x, mask, H), p["wh"], True)
    # Compare at valid positions (masked positions emit the carry, the scan
    # path emits the unmasked step output — both are ignored downstream).
    m = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(hs_scan) * m, np.asarray(hs_pal) * m, atol=2e-2, rtol=2e-2
    )


def test_fused_gru_grads_match_scan():
    p, x, mask = _setup(seed=7)
    H = p["wh"].shape[0]

    def loss_scan(p, x):
        hs = gru_layer(p, x, mask, jnp.float32, cell_impl="scan")
        return jnp.sum(hs * mask[:, :, None] * 0.1)

    def loss_pal(p, x):
        hs = fused_gru_scan(_xw(p, x, mask, H), p["wh"], True)
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


def test_fused_gru_padded_steps_carry_through():
    """With the mask folded in, a fully-masked tail must leave h unchanged."""
    p, x, _ = _setup(seed=3)
    H = p["wh"].shape[0]
    T = x.shape[1]
    mask = jnp.concatenate(
        [jnp.ones((x.shape[0], T // 2), bool), jnp.zeros((x.shape[0], T - T // 2), bool)],
        axis=1,
    )
    hs = fused_gru_scan(_xw(p, x, mask, H), p["wh"], True)
    tail = np.asarray(hs)[:, T // 2:]
    np.testing.assert_array_equal(tail, np.broadcast_to(tail[:, :1], tail.shape))
