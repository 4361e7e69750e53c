"""Pallas fused vanilla-RNN recurrence for the ST-RNN tower (reference R6,
config #3 — BASELINE.json:9).

The ST-RNN's spatial-temporal transition work is fully hoisted out of the
recurrence (models/strnn.py), leaving the serial chain

    h_t = tanh( xin_t + C @ h_{t-1} )

— exactly the shape the fused GRU/LSTM kernels accelerate. Same design:
forward and BPTT backward each run the whole T loop as ONE kernel over a
(B/bt, T/u) grid, carry in VMEM scratch per batch tile, the tanh
pre-activation recomputed flash-style in backward from the stashed
hidden-state stream, tile sizes from ``ops/cell_pad.pick_cell_tiles``.
Masking follows ``ops/fused_lstm.py``: an explicit [B, T, H] float mask
operand (lane-aligned blocks) selects

    h_t = m·tanh(...) + (1-m)·h_{t-1}

matching the masked ``lax.scan`` carry bit-exactly; padded-step gradients are
exactly zero because the pre-activation cotangent is scaled by m.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poi_tpu.ops.cell_pad import CELL_VMEM_LIMIT, pick_cell_tiles

# Forward: batch tiles are independent (the hidden-state scratch resets at
# t == 0 of every batch tile), so the batch grid dim is 'parallel' — Mosaic
# may pipeline/reorder batch tiles. Backward keeps ('arbitrary', 'arbitrary'):
# the dwh accumulator is carried across batch tiles too.
_FWD_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"),
    vmem_limit_bytes=CELL_VMEM_LIMIT,
)
_BWD_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary", "arbitrary"),
    vmem_limit_bytes=CELL_VMEM_LIMIT,
)


def _fwd_kernel(xin_ref, m_ref, c_ref, hs_out, h_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h = h_scr[:]
    for u in range(xin_ref.shape[0]):
        hw = jnp.dot(h.astype(jnp.bfloat16), c_ref[:], preferred_element_type=jnp.float32)
        h_raw = jnp.tanh(xin_ref[u] + hw)
        m = m_ref[u]
        h = m * h_raw + (1.0 - m) * h
        hs_out[u] = h
    h_scr[:] = h


def _bwd_kernel(xin_ref, m_ref, c_ref, hprev_ref, dhs_ref, dxin_out, dc_out, dh_scr, dc_scr):
    b = pl.program_id(0)
    t = pl.program_id(1)  # walks T-1 .. 0 via reversed index maps

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    @pl.when((t == 0) & (b == 0))
    def _():
        dc_scr[:] = jnp.zeros_like(dc_scr)

    dh = dh_scr[:]
    dc_acc = dc_scr[:]
    for u in reversed(range(xin_ref.shape[0])):
        h_prev, m = hprev_ref[u], m_ref[u]
        hw = jnp.dot(h_prev.astype(jnp.bfloat16), c_ref[:], preferred_element_type=jnp.float32)
        h_raw = jnp.tanh(xin_ref[u] + hw)
        dh = dh + dhs_ref[u]
        dpre = dh * m * (1.0 - h_raw * h_raw)
        dxin_out[u] = dpre
        # Cotangent matmuls in f32 (C upcast from bf16 — exactly
        # representable): bf16-rounding the cotangent each backward step
        # compounds through the chain into the embedding grads and measurably
        # destroys ranking quality (see ops/fused_gru.py).
        c_f32 = c_ref[:].astype(jnp.float32)
        dh = dh * (1.0 - m) + jax.lax.dot_general(
            dpre, c_f32,
            dimension_numbers=(((1,), (1,)), ((), ())),  # dpre @ C^T -> [bt, H]
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dc_acc = dc_acc + jax.lax.dot_general(
            h_prev, dpre,
            dimension_numbers=(((0,), (0,)), ((), ())),  # h_prev^T @ dpre -> [H, H]
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    dh_scr[:] = dh
    dc_scr[:] = dc_acc

    @pl.when((t == pl.num_programs(1) - 1) & (b == pl.num_programs(0) - 1))
    def _():
        dc_out[:] = dc_scr[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_rnn_scan(xin, mask_bh, c, interpret: bool = False, tiles: tuple | None = None):
    """[B, T, H] pre-projected inputs (already include the bias), [B, T, H]
    float padding mask (1 = valid), [H, H] recurrent weights → [B, T, H]
    hidden states. h0 = zeros. Padded steps emit the carried h. ``tiles``
    overrides the auto-picked (bt_fwd, u_fwd, bt_bwd, u_bwd) — test hook."""
    hs, _ = _fwd(xin, mask_bh, c, interpret, tiles)
    return hs


def _fwd(xin, mask_bh, c, interpret, tiles):
    B, T, H = xin.shape
    # Streams: xin (1) + mask (1) + hs out (1); carries: h; resident: C (bf16).
    bt, u = tiles[:2] if tiles else pick_cell_tiles(B, T, H, 3, 1, H * H * 2)
    xin_tm = jnp.swapaxes(xin.astype(jnp.float32), 0, 1)
    m_tm = jnp.swapaxes(mask_bh.astype(jnp.float32), 0, 1)
    hs_tm = pl.pallas_call(
        _fwd_kernel,
        grid=(B // bt, T // u),
        in_specs=[
            pl.BlockSpec((u, bt, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, bt, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((u, bt, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, H), jnp.float32)],
        compiler_params=None if interpret else _FWD_COMPILER_PARAMS,
        interpret=interpret,
    )(xin_tm, m_tm, c.astype(jnp.bfloat16))
    return jnp.swapaxes(hs_tm, 0, 1), (xin_tm, m_tm, c, hs_tm)


def _fwd_vjp(xin, mask_bh, c, interpret, tiles):
    return _fwd(xin, mask_bh, c, interpret, tiles)


def _bwd_vjp(interpret, tiles, res, dhs):
    xin_tm, m_tm, c, hs_tm = res
    T, B, H = xin_tm.shape
    # Streams: xin (1) + mask (1) + hprev (1) + dhs (1) + dxin out (1);
    # carries: dh; resident: C (bf16) + dC out (f32) + dC scratch (f32).
    bt, u = tiles[2:] if tiles else pick_cell_tiles(B, T, H, 5, 1, H * H * 10)
    hprev_tm = jnp.concatenate([jnp.zeros((1, B, H), jnp.float32), hs_tm[:-1]], axis=0)
    dhs_tm = jnp.swapaxes(dhs.astype(jnp.float32), 0, 1)
    nblk = T // u
    rev = lambda b, t: (nblk - 1 - t, b, 0)  # noqa: E731 — reverse-time index map
    dxin_tm, dc = pl.pallas_call(
        _bwd_kernel,
        grid=(B // bt, nblk),
        in_specs=[
            pl.BlockSpec((u, bt, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, bt, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, bt, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, bt, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((u, bt, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, H), jnp.float32),
            pltpu.VMEM((H, H), jnp.float32),
        ],
        compiler_params=None if interpret else _BWD_COMPILER_PARAMS,
        interpret=interpret,
    )(xin_tm, m_tm, c.astype(jnp.bfloat16), hprev_tm, dhs_tm)
    # Mask is 0/1 data from the batch, never a differentiable parameter.
    return jnp.swapaxes(dxin_tm, 0, 1), jnp.zeros_like(m_tm).swapaxes(0, 1), dc.astype(c.dtype)


fused_rnn_scan.defvjp(_fwd_vjp, _bwd_vjp)


def rnn_dims_supported(B: int, H: int) -> bool:
    """Sublane alignment needed by the kernels (f32 tiles are (8, 128)); the
    lane dim is handled by ops/cell_pad.py gate-block padding."""
    return B % 8 == 0
