"""Pallas fused GRU recurrence (reference R4's ``theano.scan`` hot loop).

``lax.scan`` dispatches T tiny recurrent matmuls through the full XLA loop
machinery; at bench scale (B=256, T=64, H=128) the scan's fwd+bwd costs more
than the arithmetic by an order of magnitude. These two kernels run the whole
recurrence as ONE Pallas call each:

- forward: grid (T/U,) with the hidden state carried in VMEM scratch across
  grid steps and U timesteps unrolled inside each step (amortizes the
  per-grid-step pipeline overhead, which dominates at these tiny matmul
  sizes); per timestep one [B, H] x [H, 3H] MXU matmul + VPU gates. The
  hoisted input projection xw stays outside (it is one big MXU matmul).
- backward: grid (T/U,) in reverse (index maps flip t, inner unroll walks
  backwards), carrying dh in scratch and accumulating dwh in scratch;
  recomputes the gates from the stashed hidden states (flash-style) instead
  of storing per-step gate tensors.

Masking contract: the caller folds the padding mask into the update-gate
input column (xw_z = -1e9 on padded steps), so sigmoid(z) == 0 exactly and
h_new == h_prev — the carry passes through padded steps bit-exactly like the
masked ``lax.scan`` path, and every gate gradient at a padded step is exactly
zero. No separate mask operand, no lane-misaligned [B, 1] blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_NEG = -1e9

# Timesteps unrolled inside each grid step. 64 % _UNROLL must be 0 for the
# bench shapes; callers pad T to a multiple (scan fallback covers the rest).
_UNROLL = 8


def _gates(h_prev, xw_t, wh_ref):
    """Shared fwd gate math. h_prev [B, H] f32, xw_t [B, 3H] f32."""
    H = h_prev.shape[1]
    hw = jnp.dot(h_prev.astype(jnp.bfloat16), wh_ref[:], preferred_element_type=jnp.float32)
    z = jax.nn.sigmoid(xw_t[:, :H] + hw[:, :H])
    r = jax.nn.sigmoid(xw_t[:, H:2 * H] + hw[:, H:2 * H])
    hn = hw[:, 2 * H:]
    n = jnp.tanh(xw_t[:, 2 * H:] + r * hn)
    return z, r, n, hn


def _fwd_kernel(xw_ref, wh_ref, hs_out, h_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h = h_scr[:]
    for u in range(xw_ref.shape[0]):
        z, r, n, _ = _gates(h, xw_ref[u], wh_ref)
        h = (1.0 - z) * h + z * n
        hs_out[u] = h
    h_scr[:] = h


def _bwd_kernel(xw_ref, wh_ref, hprev_ref, dhs_ref, dxw_out, dwh_out, dh_scr, dwh_scr):
    t = pl.program_id(0)  # walks T-1 .. 0 via reversed index maps
    H = dh_scr.shape[1]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    dh = dh_scr[:]
    dwh_acc = dwh_scr[:]
    # Inner unroll walks time BACKWARDS within the (already reversed) block.
    for u in reversed(range(xw_ref.shape[0])):
        h_prev = hprev_ref[u]
        z, r, n, hn = _gates(h_prev, xw_ref[u], wh_ref)
        dh = dh + dhs_ref[u]
        dn = dh * z * (1.0 - n * n)
        da = dh * (n - h_prev) * z * (1.0 - z)          # d pre-sigmoid of z
        dr_pre = dn * hn * r * (1.0 - r)                # d pre-sigmoid of r
        dhn = dn * r                                    # d of the h-side n input
        dxw = jnp.concatenate([da, dr_pre, dn], axis=1)     # [B, 3H]
        dhw = jnp.concatenate([da, dr_pre, dhn], axis=1)    # [B, 3H]
        dxw_out[u] = dxw
        # dh_prev = passthrough + via recurrent projection
        dh = dh * (1.0 - z) + jax.lax.dot_general(
            dhw.astype(jnp.bfloat16), wh_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),  # dhw @ wh^T -> [B, H]
            preferred_element_type=jnp.float32,
        )
        dwh_acc = dwh_acc + jax.lax.dot_general(
            h_prev.astype(jnp.bfloat16), dhw.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),  # h_prev^T @ dhw -> [H, 3H]
            preferred_element_type=jnp.float32,
        )
    dh_scr[:] = dh
    dwh_scr[:] = dwh_acc

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        dwh_out[:] = dwh_scr[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_gru_scan(xw, wh, interpret: bool = False):
    """[B, T, 3H] pre-projected gate inputs + [H, 3H] recurrent weights →
    [B, T, H] hidden states. h0 = zeros. Mask must be pre-folded into the
    z column of ``xw`` (see module docstring)."""
    hs, _ = _fwd(xw, wh, interpret)
    return hs


def _fwd(xw, wh, interpret):
    B, T, H3 = xw.shape
    H = H3 // 3
    # Time-major [T, B, .] so each grid step's block is a well-tiled (B, .).
    u = _UNROLL if T % _UNROLL == 0 else 1
    xw_tm = jnp.swapaxes(xw.astype(jnp.float32), 0, 1)
    hs_tm = pl.pallas_call(
        _fwd_kernel,
        grid=(T // u,),
        in_specs=[
            pl.BlockSpec((u, B, H3), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((u, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(xw_tm, wh.astype(jnp.bfloat16))
    return jnp.swapaxes(hs_tm, 0, 1), (xw_tm, wh, hs_tm)


def _fwd_vjp(xw, wh, interpret):
    return _fwd(xw, wh, interpret)


def _bwd_vjp(interpret, res, dhs):
    xw_tm, wh, hs_tm = res
    T, B, H3 = xw_tm.shape
    H = H3 // 3
    # h_{t-1} stream: zeros at t=0, else the stashed h.
    hprev_tm = jnp.concatenate([jnp.zeros((1, B, H), jnp.float32), hs_tm[:-1]], axis=0)
    dhs_tm = jnp.swapaxes(dhs.astype(jnp.float32), 0, 1)
    u = _UNROLL if T % _UNROLL == 0 else 1
    nblk = T // u
    rev = lambda t: (nblk - 1 - t, 0, 0)  # noqa: E731 — reverse-time index map
    dxw_tm, dwh = pl.pallas_call(
        _bwd_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((u, B, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, B, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((u, B, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H3), jnp.float32),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((H, H3), jnp.float32),
        ],
        interpret=interpret,
    )(xw_tm, wh.astype(jnp.bfloat16), hprev_tm, dhs_tm)
    return jnp.swapaxes(dxw_tm, 0, 1), dwh.astype(wh.dtype)


fused_gru_scan.defvjp(_fwd_vjp, _bwd_vjp)


def gru_dims_supported(B: int, H: int) -> bool:
    """Sublane alignment needed by the kernels (f32 tiles are (8, 128)); the
    lane dim is handled by ops/cell_pad.py gate-block padding."""
    return B % 8 == 0
