"""Pallas fused vanilla-RNN recurrence for the ST-RNN tower (reference R6,
config #3 — BASELINE.json:9).

The ST-RNN's spatial-temporal transition work is fully hoisted out of the
recurrence (models/strnn.py), leaving the serial chain

    h_t = tanh( xin_t + C @ h_{t-1} )

— exactly the shape the fused GRU/LSTM kernels accelerate. Same design:
forward and BPTT backward each run the whole T loop as ONE kernel, carry in
VMEM scratch, the tanh pre-activation recomputed flash-style in backward from
the stashed hidden-state stream. Masking follows ``ops/fused_lstm.py``: an
explicit [B, T, H] float mask operand (lane-aligned blocks) selects

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

# Timesteps unrolled inside each grid step (see ops/fused_gru.py).
_UNROLL = 8


def _fwd_kernel(xin_ref, m_ref, c_ref, hs_out, h_scr):
    t = pl.program_id(0)

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
    t = pl.program_id(0)  # walks T-1 .. 0 via reversed index maps

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
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
        dh = dh * (1.0 - m) + jax.lax.dot_general(
            dpre.astype(jnp.bfloat16), c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),  # dpre @ C^T -> [B, H]
            preferred_element_type=jnp.float32,
        )
        dc_acc = dc_acc + jax.lax.dot_general(
            h_prev.astype(jnp.bfloat16), dpre.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),  # h_prev^T @ dpre -> [H, H]
            preferred_element_type=jnp.float32,
        )
    dh_scr[:] = dh
    dc_scr[:] = dc_acc

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        dc_out[:] = dc_scr[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_rnn_scan(xin, mask_bh, c, interpret: bool = False):
    """[B, T, H] pre-projected inputs (already include the bias), [B, T, H]
    float padding mask (1 = valid), [H, H] recurrent weights → [B, T, H]
    hidden states. h0 = zeros. Padded steps emit the carried h."""
    hs, _ = _fwd(xin, mask_bh, c, interpret)
    return hs


def _fwd(xin, mask_bh, c, interpret):
    B, T, H = xin.shape
    u = _UNROLL if T % _UNROLL == 0 else 1
    xin_tm = jnp.swapaxes(xin.astype(jnp.float32), 0, 1)
    m_tm = jnp.swapaxes(mask_bh.astype(jnp.float32), 0, 1)
    hs_tm = pl.pallas_call(
        _fwd_kernel,
        grid=(T // u,),
        in_specs=[
            pl.BlockSpec((u, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((u, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(xin_tm, m_tm, c.astype(jnp.bfloat16))
    return jnp.swapaxes(hs_tm, 0, 1), (xin_tm, m_tm, c, hs_tm)


def _fwd_vjp(xin, mask_bh, c, interpret):
    return _fwd(xin, mask_bh, c, interpret)


def _bwd_vjp(interpret, res, dhs):
    xin_tm, m_tm, c, hs_tm = res
    T, B, H = xin_tm.shape
    hprev_tm = jnp.concatenate([jnp.zeros((1, B, H), jnp.float32), hs_tm[:-1]], axis=0)
    dhs_tm = jnp.swapaxes(dhs.astype(jnp.float32), 0, 1)
    u = _UNROLL if T % _UNROLL == 0 else 1
    nblk = T // u
    rev = lambda t: (nblk - 1 - t, 0, 0)  # noqa: E731 — reverse-time index map
    dxin_tm, dc = pl.pallas_call(
        _bwd_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((u, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, B, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((u, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((H, H), jnp.float32),
        ],
        interpret=interpret,
    )(xin_tm, m_tm, c.astype(jnp.bfloat16), hprev_tm, dhs_tm)
    # Mask is 0/1 data from the batch, never a differentiable parameter.
    return jnp.swapaxes(dxin_tm, 0, 1), jnp.zeros_like(m_tm).swapaxes(0, 1), dc.astype(c.dtype)


fused_rnn_scan.defvjp(_fwd_vjp, _bwd_vjp)


def rnn_dims_supported(B: int, H: int) -> bool:
    """Sublane alignment needed by the kernels (f32 tiles are (8, 128)); the
    lane dim is handled by ops/cell_pad.py gate-block padding."""
    return B % 8 == 0
