"""Lane-padding for the fused recurrence kernels (ops/fused_{gru,lstm,rnn}).

Mosaic tiles f32 as (8, 128), so the kernels require H % 128 == 0 — but
configs #1/#3 run 64-d towers (BASELINE.json:7,9). Padding each *gate block*
of the pre-projected inputs and each [H, H] block of the recurrent weights to
the next lane multiple keeps the kernels' math exact on the real lanes:

- padded input columns are zero and padded ``wh`` rows/columns are zero, so
  real-lane gate pre-activations are unchanged;
- padded hidden lanes start at h0 = 0 and stay exactly 0: every recurrence
  here maps (x_pad = 0, h_pad = 0) → h_pad' = 0 (GRU: n = tanh(0 + r·0) = 0
  so h' = (1-z)·0 + z·0; LSTM: g = 0 so c' = f·0 + i·0, h' = o·tanh(0);
  tanh-RNN: tanh(0 + 0) = 0), and zero ``wh`` columns mean padded lanes never
  feed real ones;
- gradients flow through jnp.pad/slice (plain scatter/gather), so the
  custom-VJP kernels never see the raggedness.

The cost is (Hp/H)² on the recurrent matmul — at H=64→128 that is 4x the
FLOPs, but the fused kernel is still ~2x faster than the H=64 ``lax.scan``
path because the serial chain is dispatch-bound, not FLOP-bound, at these
sizes (measured in BASELINE.md).
"""

from __future__ import annotations

import jax.numpy as jnp

LANES = 128

# Per-kernel VMEM estimate budget for the fused recurrence kernels. 14 MB
# (1x-counted streamed blocks + resident weights/accumulators) keeps every
# measured bench config (B=256, H=128) on its proven full-batch/unroll-8
# tiling while forcing batch tiles at config #4/#5 shapes (B=512, H=512),
# where the untiled blocks blow the Mosaic scoped-VMEM stack (measured:
# 49 MB vs the 16 MB default limit). The pallas_calls raise their own
# vmem_limit_bytes to CELL_VMEM_LIMIT for headroom over this estimate
# (double-buffering of streamed blocks is not counted here).
CELL_VMEM_BUDGET = 14 * 2**20
CELL_VMEM_LIMIT = 64 * 2**20


def pick_cell_tiles(
    B: int,
    T: int,
    H: int,
    stream_blocks: int,
    carries: int,
    resident_bytes: int,
    budget: int = CELL_VMEM_BUDGET,
    max_unroll: int = 8,
) -> tuple[int, int]:
    """(bt, u) for a fused-recurrence grid (B/bt, T/u) that fits scoped VMEM.

    ``stream_blocks``: number of H-lane-wide f32 [u, bt, H] blocks streamed per
    grid step (an [u, bt, n_gates*H] block counts n_gates). ``carries``: number
    of [bt, H] f32 scratch carries. ``resident_bytes``: weight / accumulator
    blocks live for the whole grid. Maximizes work per grid step (u*bt),
    tie-breaking toward larger batch tiles — within a grid step the u
    timesteps are serial while the bt rows are parallel MXU work, so at equal
    u*bt the bigger matmul hides the recurrence latency better.
    """
    bts = sorted((b for b in range(8, B + 1, 8) if B % b == 0), reverse=True)
    if not bts:
        raise ValueError(
            f"fused cell kernels require a batch size with a multiple-of-8 "
            f"divisor (Mosaic f32 sublanes), got B={B}; use cell_impl='scan' "
            f"or a batch size divisible by 8"
        )
    best: tuple[int, int, int] | None = None
    for u in (8, 4, 2, 1):
        if u > max_unroll or T % u:
            continue
        for bt in bts:
            total = u * bt * H * 4 * stream_blocks + bt * H * 4 * carries + resident_bytes
            if total <= budget:
                cand = (u * bt, bt, u)
                if best is None or cand > best:
                    best = cand
                break  # smaller bt at this u can't beat this u*bt
    if best is None:
        # Even the smallest tile overflows the estimate budget; rely on the
        # raised vmem_limit_bytes headroom rather than emit an invalid grid.
        return bts[-1], 1
    return best[1], best[2]


def padded_hidden(H: int) -> int:
    return -(-H // LANES) * LANES


def pad_gate_blocks(xw: jnp.ndarray, wh: jnp.ndarray, n_gates: int):
    """Pad [B, T, n_gates*H] gate-blocked inputs and [H, n_gates*H] recurrent
    weights to the lane-aligned hidden size. Returns (xw_p, wh_p, H)."""
    H = wh.shape[0]
    Hp = padded_hidden(H)
    if Hp == H:
        return xw, wh, H
    pad = Hp - H
    x_blocks = jnp.split(xw, n_gates, axis=-1)
    xw_p = jnp.concatenate(
        [jnp.pad(b, ((0, 0), (0, 0), (0, pad))) for b in x_blocks], axis=-1
    )
    w_blocks = jnp.split(wh, n_gates, axis=-1)
    wh_p = jnp.concatenate(
        [jnp.pad(w, ((0, pad), (0, pad))) for w in w_blocks], axis=-1
    )
    return xw_p, wh_p, H
