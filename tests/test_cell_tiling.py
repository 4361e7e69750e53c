"""Batch-tiled fused-recurrence grids vs the untiled path (interpreter mode).

Config #4/#5 shapes (B=512, H=512) overflow Mosaic's scoped VMEM when the
whole batch is one block, so the fused cells split the grid into
(B/bt, T/u) tiles picked by ``ops/cell_pad.pick_cell_tiles``. These tests
force multi-tile grids via the ``tiles`` hook and assert value + gradient
equality with the single-tile path — in particular the weight-gradient
accumulator, which must survive across batch tiles (reset only at the first
grid step, emitted only at the last).
"""

import jax
import jax.numpy as jnp
import numpy as np

from poi_tpu.ops.cell_pad import CELL_VMEM_BUDGET, pick_cell_tiles
from poi_tpu.ops.fused_gru import MASK_NEG, fused_gru_scan
from poi_tpu.ops.fused_lstm import fused_lstm_scan
from poi_tpu.ops.fused_rnn import fused_rnn_scan

B, T, H = 16, 8, 16
TILED = (4, 2, 4, 2)       # bt=4 (4 batch tiles), u=2 (4 time blocks)
UNTILED = (B, T, B, T)     # one grid step


def _mask(seed):
    lengths = jax.random.randint(jax.random.key(seed), (B, 1), 3, T + 1)
    return (jnp.cumsum(jnp.ones((B, T)), axis=1) <= lengths).astype(jnp.float32)


def _compare(loss_tiled, loss_untiled, args):
    v_t, g_t = jax.value_and_grad(loss_tiled, argnums=tuple(range(len(args))))(*args)
    v_u, g_u = jax.value_and_grad(loss_untiled, argnums=tuple(range(len(args))))(*args)
    np.testing.assert_allclose(float(v_t), float(v_u), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_t), jax.tree.leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_gru_batch_tiled_matches_untiled():
    k = jax.random.key(0)
    xw = jax.random.normal(k, (B, T, 3 * H), jnp.float32) * 0.5
    m = _mask(1)
    xw = xw.at[:, :, :H].set(jnp.where(m[:, :, None] > 0, xw[:, :, :H], MASK_NEG))
    wh = jax.random.normal(jax.random.key(2), (H, 3 * H), jnp.float32) * 0.3
    w = jax.random.normal(jax.random.key(3), (B, T, H), jnp.float32)
    _compare(
        lambda xw, wh: jnp.sum(fused_gru_scan(xw, wh, True, TILED) * w),
        lambda xw, wh: jnp.sum(fused_gru_scan(xw, wh, True, UNTILED) * w),
        (xw, wh),
    )


def test_lstm_batch_tiled_matches_untiled():
    xw = jax.random.normal(jax.random.key(10), (B, T, 4 * H), jnp.float32) * 0.5
    m_bh = jnp.broadcast_to(_mask(11)[:, :, None], (B, T, H))
    wh = jax.random.normal(jax.random.key(12), (H, 4 * H), jnp.float32) * 0.3
    w = jax.random.normal(jax.random.key(13), (B, T, H), jnp.float32)
    _compare(
        lambda xw, wh: jnp.sum(fused_lstm_scan(xw, m_bh, wh, True, TILED) * w),
        lambda xw, wh: jnp.sum(fused_lstm_scan(xw, m_bh, wh, True, UNTILED) * w),
        (xw, wh),
    )


def test_rnn_batch_tiled_matches_untiled():
    xin = jax.random.normal(jax.random.key(20), (B, T, H), jnp.float32) * 0.5
    m_bh = jnp.broadcast_to(_mask(21)[:, :, None], (B, T, H))
    c = jax.random.normal(jax.random.key(22), (H, H), jnp.float32) * 0.3
    w = jax.random.normal(jax.random.key(23), (B, T, H), jnp.float32)
    _compare(
        lambda xin, c: jnp.sum(fused_rnn_scan(xin, m_bh, c, True, TILED) * w),
        lambda xin, c: jnp.sum(fused_rnn_scan(xin, m_bh, c, True, UNTILED) * w),
        (xin, c),
    )


def test_pick_cell_tiles_bench_shape_untouched():
    """The measured-fastest bench tiling (full batch, unroll 8) must survive."""
    bt, u = pick_cell_tiles(256, 64, 128, 4, 1, 128 * 384 * 2)
    assert (bt, u) == (256, 8)


def test_pick_cell_tiles_big_shapes_fit_budget():
    """Config #4/#5 shapes must produce tiles within the estimate budget."""
    for B_, H_, streams, carries, resident in [
        (512, 512, 4, 1, 512 * 1536 * 2),    # GRU fwd @ config 5
        (512, 512, 8, 1, 512 * 1536 * 10),   # GRU bwd @ config 5
        (512, 512, 12, 2, 512 * 2048 * 10),  # LSTM bwd @ config 5
        (512, 256, 7, 2, 256 * 1024 * 2),    # LSTM fwd @ config 4
    ]:
        bt, u = pick_cell_tiles(B_, 64, H_, streams, carries, resident)
        assert B_ % bt == 0 and 64 % u == 0
        total = u * bt * H_ * 4 * streams + bt * H_ * 4 * carries + resident
        assert total <= CELL_VMEM_BUDGET, (B_, H_, bt, u, total)
