"""Pallas fused vanilla-RNN recurrence (ST-RNN serial chain) vs the lax.scan
oracle (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from poi_tpu.models import base
from poi_tpu.ops.fused_rnn import fused_rnn_scan


def _setup(B=8, T=12, H=16, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    c = (1.0 / H) ** 0.5 * jax.random.normal(ks[0], (H, H), jnp.float32)
    xin = jax.random.normal(ks[1], (B, T, H), jnp.float32) * 0.5
    lengths = jax.random.randint(ks[2], (B, 1), 3, T + 1)
    mask = jnp.cumsum(jnp.ones((B, T)), axis=1) <= lengths
    m_bh = jnp.broadcast_to(mask[:, :, None].astype(jnp.float32), (B, T, H))
    return c, xin, mask, m_bh


def _scan_oracle(c, xin, mask):
    B, _, H = xin.shape

    def step(h, xin_t):
        return (lambda h_new: (h_new, h_new))(jnp.tanh(xin_t + h @ c))

    return base.scan_time_major(step, jnp.zeros((B, H), jnp.float32), xin, mask)


def test_fused_rnn_forward_matches_scan():
    c, xin, mask, m_bh = _setup()
    hs_scan = _scan_oracle(c, xin, mask)
    hs_pal = fused_rnn_scan(xin, m_bh, c, True)
    m = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(hs_scan) * m, np.asarray(hs_pal) * m, atol=2e-2, rtol=2e-2
    )


def test_fused_rnn_grads_match_scan():
    c, xin, mask, m_bh = _setup(seed=7)
    w = mask[:, :, None] * 0.1

    def loss_scan(c, xin):
        return jnp.sum(_scan_oracle(c, xin, mask) * w)

    def loss_pal(c, xin):
        return jnp.sum(fused_rnn_scan(xin, m_bh, c, True) * w)

    gs = jax.grad(loss_scan, argnums=(0, 1))(c, xin)
    gp = jax.grad(loss_pal, argnums=(0, 1))(c, xin)
    for a, b, name in ((gs[0], gp[0], "dc"), (gs[1], gp[1], "dxin")):
        scale = np.abs(np.asarray(a)).max() + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-2, err_msg=name
        )


def test_fused_rnn_padded_steps_carry_through():
    c, xin, _, _ = _setup(seed=3)
    B, T, H = xin.shape
    mask = jnp.concatenate(
        [jnp.ones((B, T // 2), bool), jnp.zeros((B, T - T // 2), bool)], axis=1
    )
    m_bh = jnp.broadcast_to(mask[:, :, None].astype(jnp.float32), (B, T, H))
    hs = fused_rnn_scan(xin, m_bh, c, True)
    tail = np.asarray(hs)[:, T // 2:]
    np.testing.assert_array_equal(tail, np.broadcast_to(tail[:, :1], tail.shape))


def test_fused_rnn_unrolled_path_matches():
    c, xin, mask, m_bh = _setup(T=16, seed=5)
    hs_scan = _scan_oracle(c, xin, mask)
    hs_pal = fused_rnn_scan(xin, m_bh, c, True)
    m = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(hs_scan) * m, np.asarray(hs_pal) * m, atol=2e-2, rtol=2e-2
    )
