"""Pallas fused GRU recurrence (reference R4's ``theano.scan`` hot loop).

``lax.scan`` dispatches T tiny recurrent matmuls through the full XLA loop
machinery; at bench scale (B=256, T=64, H=128) the scan's fwd+bwd costs more
than the arithmetic by an order of magnitude. These two kernels run the whole
recurrence as ONE Pallas call each over a (B/bt, T/u) grid:

- forward: the hidden state is carried in VMEM scratch across the serial time
  dimension (reset at t == 0 of each batch tile) with u timesteps unrolled
  inside each grid step (amortizes the per-grid-step pipeline overhead, which
  dominates at tiny matmul sizes); per timestep one [bt, H] x [H, 3H] MXU
  matmul + VPU gates. The hoisted input projection xw stays outside (it is
  one big MXU matmul).
- backward: time reversed via flipped index maps (inner unroll walks
  backwards), dh carried in scratch per batch tile and dwh accumulated in
  scratch across the WHOLE grid (batch tiles included); recomputes the gates
  from the stashed hidden states (flash-style) instead of storing per-step
  gate tensors.

Tile sizes come from ``ops/cell_pad.pick_cell_tiles``: at bench shapes the
whole batch is one tile (bt = B, u = 8, the measured-fastest config), while at
config #4/#5 shapes (B = 512, H = 512) untiled blocks overflow the Mosaic
scoped-VMEM stack (measured 49 MB vs the 16 MB default), so the batch splits
into tiles that fit.

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

from poi_tpu.ops.cell_pad import CELL_VMEM_LIMIT, pick_cell_tiles

MASK_NEG = -1e9

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
    """Shared fwd gate math. h_prev [bt, H] f32, xw_t [bt, 3H] f32."""
    H = h_prev.shape[1]
    hw = jnp.dot(h_prev.astype(jnp.bfloat16), wh_ref[:], preferred_element_type=jnp.float32)
    z = jax.nn.sigmoid(xw_t[:, :H] + hw[:, :H])
    r = jax.nn.sigmoid(xw_t[:, H:2 * H] + hw[:, H:2 * H])
    hn = hw[:, 2 * H:]
    n = jnp.tanh(xw_t[:, 2 * H:] + r * hn)
    return z, r, n, hn


def _fwd_kernel(xw_ref, wh_ref, hs_out, h_scr):
    t = pl.program_id(1)

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
    b = pl.program_id(0)
    t = pl.program_id(1)  # walks T-1 .. 0 via reversed index maps
    H = dh_scr.shape[1]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    @pl.when((t == 0) & (b == 0))
    def _():
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
        dxw = jnp.concatenate([da, dr_pre, dn], axis=1)     # [bt, 3H]
        dhw = jnp.concatenate([da, dr_pre, dhn], axis=1)    # [bt, 3H]
        dxw_out[u] = dxw
        # Cotangent matmuls run in f32 (wh upcast from its bf16 block — the
        # values are exactly representable). Casting the f32 cotangent down
        # to bf16 here is what XLA's scan autodiff does NOT do, and the
        # ~0.4%/step rounding compounds through the T-step backward chain
        # into the embedding gradients: measured on config #2 (2k steps,
        # 2 seeds), the bf16-cotangent kernel trains to r@10 0.10-0.13 where
        # the scan cell reaches 0.22 — loss converges identically, ranking
        # signal drowns. f32 cotangents restore scan-equivalent precision.
        wh_f32 = wh_ref[:].astype(jnp.float32)
        # dh_prev = passthrough + via recurrent projection
        dh = dh * (1.0 - z) + jax.lax.dot_general(
            dhw, wh_f32,
            dimension_numbers=(((1,), (1,)), ((), ())),  # dhw @ wh^T -> [bt, H]
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dwh_acc = dwh_acc + jax.lax.dot_general(
            h_prev, dhw,
            dimension_numbers=(((0,), (0,)), ((), ())),  # h_prev^T @ dhw -> [H, 3H]
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    dh_scr[:] = dh
    dwh_scr[:] = dwh_acc

    @pl.when((t == pl.num_programs(1) - 1) & (b == pl.num_programs(0) - 1))
    def _():
        dwh_out[:] = dwh_scr[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_gru_scan(xw, wh, interpret: bool = False, tiles: tuple | None = None):
    """[B, T, 3H] pre-projected gate inputs + [H, 3H] recurrent weights →
    [B, T, H] hidden states. h0 = zeros. Mask must be pre-folded into the
    z column of ``xw`` (see module docstring). ``tiles`` overrides the
    auto-picked (bt_fwd, u_fwd, bt_bwd, u_bwd) — test hook."""
    hs, _ = _fwd(xw, wh, interpret, tiles)
    return hs


def _fwd(xw, wh, interpret, tiles):
    B, T, H3 = xw.shape
    H = H3 // 3
    # Streams: xw (3 gate blocks) + hs out (1); resident: wh.
    bt, u = tiles[:2] if tiles else pick_cell_tiles(B, T, H, 4, 1, H * H3 * 2)
    # Time-major [T, B, .] so each grid step's block is a well-tiled (bt, .).
    xw_tm = jnp.swapaxes(xw.astype(jnp.float32), 0, 1)
    hs_tm = pl.pallas_call(
        _fwd_kernel,
        grid=(B // bt, T // u),
        in_specs=[
            pl.BlockSpec((u, bt, H3), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((u, bt, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, H), jnp.float32)],
        compiler_params=None if interpret else _FWD_COMPILER_PARAMS,
        interpret=interpret,
    )(xw_tm, wh.astype(jnp.bfloat16))
    return jnp.swapaxes(hs_tm, 0, 1), (xw_tm, wh, hs_tm)


def _fwd_vjp(xw, wh, interpret, tiles):
    return _fwd(xw, wh, interpret, tiles)


def _bwd_vjp(interpret, tiles, res, dhs):
    xw_tm, wh, hs_tm = res
    T, B, H3 = xw_tm.shape
    H = H3 // 3
    # Streams: xw (3) + hprev (1) + dhs (1) + dxw out (3); resident: wh (bf16)
    # + dwh out (f32) + dwh scratch (f32).
    bt, u = tiles[2:] if tiles else pick_cell_tiles(B, T, H, 8, 1, H * H3 * 10)
    # h_{t-1} stream: zeros at t=0, else the stashed h.
    hprev_tm = jnp.concatenate([jnp.zeros((1, B, H), jnp.float32), hs_tm[:-1]], axis=0)
    dhs_tm = jnp.swapaxes(dhs.astype(jnp.float32), 0, 1)
    nblk = T // u
    rev = lambda b, t: (nblk - 1 - t, b, 0)  # noqa: E731 — reverse-time index map
    dxw_tm, dwh = pl.pallas_call(
        _bwd_kernel,
        grid=(B // bt, nblk),
        in_specs=[
            pl.BlockSpec((u, bt, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, bt, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, bt, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((u, bt, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H3), jnp.float32),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, H), jnp.float32),
            pltpu.VMEM((H, H3), jnp.float32),
        ],
        compiler_params=None if interpret else _BWD_COMPILER_PARAMS,
        interpret=interpret,
    )(xw_tm, wh.astype(jnp.bfloat16), hprev_tm, dhs_tm)
    return jnp.swapaxes(dxw_tm, 0, 1), dwh.astype(wh.dtype)


fused_gru_scan.defvjp(_fwd_vjp, _bwd_vjp)


def gru_dims_supported(B: int, H: int) -> bool:
    """Sublane alignment needed by the kernels (f32 tiles are (8, 128)); the
    lane dim is handled by ops/cell_pad.py gate-block padding."""
    return B % 8 == 0
