"""Pallas fused LSTM recurrence (reference R5's ``theano.scan`` hot loop,
config #2 — BASELINE.json:8). Same design as ``ops/fused_gru.py``: the whole
T-step recurrence runs as ONE kernel forward and ONE kernel backward over a
(B/bt, T/u) grid, carries in VMEM scratch per batch tile, gates recomputed
flash-style in backward from the stashed (h, c) streams, and tile sizes from
``ops/cell_pad.pick_cell_tiles`` so config #4/#5 shapes fit scoped VMEM.

Masking contract differs from the GRU. The GRU folds the padding mask into
the update-gate input (z == 0 ⇒ carry passes through). An LSTM has no single
gate that freezes BOTH carries: i = 0 / f = 1 preserves c but h_new would
still be rewritten as o·tanh(c) ≠ h_prev. So these kernels take an explicit
mask operand, pre-broadcast to [B, T, H] float so every block is lane-aligned
(the (B, 1) column shape Mosaic dislikes never appears), and select

    c_t = m·c_raw + (1-m)·c_{t-1},   h_t = m·h_raw + (1-m)·h_{t-1}

which is bit-exactly the masked ``lax.scan`` carry behaviour; gate gradients
at padded steps are exactly zero because every raw-path cotangent is scaled
by m.
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


def _gates(h_prev, xw_t, wh_ref):
    """Shared fwd gate math. h_prev [bt, H] f32, xw_t [bt, 4H] f32."""
    H = h_prev.shape[1]
    hw = jnp.dot(h_prev.astype(jnp.bfloat16), wh_ref[:], preferred_element_type=jnp.float32)
    pre = xw_t + hw
    i = jax.nn.sigmoid(pre[:, :H])
    f = jax.nn.sigmoid(pre[:, H : 2 * H])
    g = jnp.tanh(pre[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(pre[:, 3 * H :])
    return i, f, g, o


def _fwd_kernel(xw_ref, m_ref, wh_ref, hs_out, cs_out, h_scr, c_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h, c = h_scr[:], c_scr[:]
    for u in range(xw_ref.shape[0]):
        i, f, g, o = _gates(h, xw_ref[u], wh_ref)
        c_raw = f * c + i * g
        h_raw = o * jnp.tanh(c_raw)
        m = m_ref[u]
        c = m * c_raw + (1.0 - m) * c
        h = m * h_raw + (1.0 - m) * h
        hs_out[u] = h
        cs_out[u] = c
    h_scr[:] = h
    c_scr[:] = c


def _bwd_kernel(
    xw_ref, m_ref, wh_ref, hprev_ref, cprev_ref, dhs_ref,
    dxw_out, dwh_out, dh_scr, dc_scr, dwh_scr,
):
    b = pl.program_id(0)
    t = pl.program_id(1)  # walks T-1 .. 0 via reversed index maps

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    @pl.when((t == 0) & (b == 0))
    def _():
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    dh, dc = dh_scr[:], dc_scr[:]
    dwh_acc = dwh_scr[:]
    for u in reversed(range(xw_ref.shape[0])):
        h_prev, c_prev, m = hprev_ref[u], cprev_ref[u], m_ref[u]
        i, f, g, o = _gates(h_prev, xw_ref[u], wh_ref)
        c_raw = f * c_prev + i * g
        tc = jnp.tanh(c_raw)
        dh = dh + dhs_ref[u]
        dh_raw = dh * m                       # h_t = m·h_raw + (1-m)·h_prev
        dc_raw = dc * m + dh_raw * o * (1.0 - tc * tc)
        do_pre = dh_raw * tc * o * (1.0 - o)
        di_pre = dc_raw * g * i * (1.0 - i)
        df_pre = dc_raw * c_prev * f * (1.0 - f)
        dg_pre = dc_raw * i * (1.0 - g * g)
        dxw = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=1)  # [bt, 4H]
        dxw_out[u] = dxw
        # LSTM gate pre-activations see xw + h_prev·wh symmetrically, so the
        # h-side cotangent equals dxw (unlike the GRU, where the n-gate's
        # h path is scaled by r).
        # Cotangent matmuls in f32 (wh upcast from bf16 — exactly
        # representable): bf16-rounding the cotangent each of T backward
        # steps compounds into the embedding grads and measurably destroys
        # ranking quality (see ops/fused_gru.py for the measured numbers).
        wh_f32 = wh_ref[:].astype(jnp.float32)
        dh = dh * (1.0 - m) + jax.lax.dot_general(
            dxw, wh_f32,
            dimension_numbers=(((1,), (1,)), ((), ())),  # dxw @ wh^T -> [bt, H]
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dc = dc * (1.0 - m) + dc_raw * f
        dwh_acc = dwh_acc + jax.lax.dot_general(
            h_prev, dxw,
            dimension_numbers=(((0,), (0,)), ((), ())),  # h_prev^T @ dxw -> [H, 4H]
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    dh_scr[:] = dh
    dc_scr[:] = dc
    dwh_scr[:] = dwh_acc

    @pl.when((t == pl.num_programs(1) - 1) & (b == pl.num_programs(0) - 1))
    def _():
        dwh_out[:] = dwh_scr[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_lstm_scan(xw, mask_bh, wh, interpret: bool = False, tiles: tuple | None = None):
    """[B, T, 4H] pre-projected gate inputs (i|f|g|o column order), [B, T, H]
    float padding mask (1 = valid), [H, 4H] recurrent weights → [B, T, H]
    hidden states. h0 = c0 = zeros. Padded steps emit the carried h (the
    masked-scan oracle emits the raw step output there; both are ignored
    downstream — see tests/test_fused_lstm.py). ``tiles`` overrides the
    auto-picked (bt_fwd, u_fwd, bt_bwd, u_bwd) — test hook."""
    hs, _ = _fwd(xw, mask_bh, wh, interpret, tiles)
    return hs


def _fwd(xw, mask_bh, wh, interpret, tiles):
    B, T, H4 = xw.shape
    H = H4 // 4
    # Streams: xw (4 gate blocks) + mask (1) + hs out (1) + cs out (1);
    # carries: h, c; resident: wh (bf16).
    bt, u = tiles[:2] if tiles else pick_cell_tiles(B, T, H, 7, 2, H * H4 * 2)
    # Time-major [T, B, .] so each grid step's block is a well-tiled (bt, .).
    xw_tm = jnp.swapaxes(xw.astype(jnp.float32), 0, 1)
    m_tm = jnp.swapaxes(mask_bh.astype(jnp.float32), 0, 1)
    hs_tm, cs_tm = pl.pallas_call(
        _fwd_kernel,
        grid=(B // bt, T // u),
        in_specs=[
            pl.BlockSpec((u, bt, H4), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, bt, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((u, bt, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, bt, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bt, H), jnp.float32), pltpu.VMEM((bt, H), jnp.float32)],
        compiler_params=None if interpret else _FWD_COMPILER_PARAMS,
        interpret=interpret,
    )(xw_tm, m_tm, wh.astype(jnp.bfloat16))
    return jnp.swapaxes(hs_tm, 0, 1), (xw_tm, m_tm, wh, hs_tm, cs_tm)


def _fwd_vjp(xw, mask_bh, wh, interpret, tiles):
    return _fwd(xw, mask_bh, wh, interpret, tiles)


def _bwd_vjp(interpret, tiles, res, dhs):
    xw_tm, m_tm, wh, hs_tm, cs_tm = res
    T, B, H4 = xw_tm.shape
    H = H4 // 4
    # Streams: xw (4) + mask (1) + hprev (1) + cprev (1) + dhs (1) + dxw out
    # (4); carries: dh, dc; resident: wh (bf16) + dwh out (f32) + dwh scratch
    # (f32).
    bt, u = tiles[2:] if tiles else pick_cell_tiles(B, T, H, 12, 2, H * H4 * 10)
    zrow = jnp.zeros((1, B, H), jnp.float32)
    hprev_tm = jnp.concatenate([zrow, hs_tm[:-1]], axis=0)
    cprev_tm = jnp.concatenate([zrow, cs_tm[:-1]], axis=0)
    dhs_tm = jnp.swapaxes(dhs.astype(jnp.float32), 0, 1)
    nblk = T // u
    rev = lambda b, t: (nblk - 1 - t, b, 0)  # noqa: E731 — reverse-time index map
    dxw_tm, dwh = pl.pallas_call(
        _bwd_kernel,
        grid=(B // bt, nblk),
        in_specs=[
            pl.BlockSpec((u, bt, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, bt, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, bt, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, bt, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, bt, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((u, bt, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, H), jnp.float32),
            pltpu.VMEM((bt, H), jnp.float32),
            pltpu.VMEM((H, H4), jnp.float32),
        ],
        compiler_params=None if interpret else _BWD_COMPILER_PARAMS,
        interpret=interpret,
    )(xw_tm, m_tm, wh.astype(jnp.bfloat16), hprev_tm, cprev_tm, dhs_tm)
    # Mask is 0/1 data from the batch, never a differentiable parameter.
    return jnp.swapaxes(dxw_tm, 0, 1), jnp.zeros_like(m_tm).swapaxes(0, 1), dwh.astype(wh.dtype)


fused_lstm_scan.defvjp(_fwd_vjp, _bwd_vjp)


def lstm_dims_supported(B: int, H: int) -> bool:
    """Sublane alignment needed by the kernels (f32 tiles are (8, 128)); the
    lane dim is handled by ops/cell_pad.py gate-block padding."""
    return B % 8 == 0
